package graft

import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStreams
import graft.catalog.Tables

/** Streaming semantics checked against their batch twins on sf0.001. */
class StreamingSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("streaming hourly window == batch q19 aggregation") {
    val stream = EventStreams.readStream(spark, sf)
    val got = EventStreams.runToMemory(spark,
      EventStreams.hourlyWindow(stream), "hourly", OutputMode.Complete)
      .collect().map(r => (r.getAs[java.sql.Timestamp]("ws"),
        r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))).toSet
    val batch = SparkEntry.queries("q19_time_window")(spark, sf)
      .collect().map(r => (r.getAs[java.sql.Timestamp]("ws"),
        r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))).toSet
    assert(got == batch)
  }

  test("streaming hopping window == batch ev_hopping aggregation") {
    val stream = EventStreams.readStream(spark, sf)
    val got = EventStreams.runToMemory(spark,
      EventStreams.hoppingWindow(stream), "hopping", OutputMode.Complete)
      .collect().map(r => (r.getAs[java.sql.Timestamp]("ws"),
        r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))).toSet
    val batch = SparkEntry.queries("ev_hopping")(spark, sf)
      .collect().map(r => (r.getAs[java.sql.Timestamp]("ws"),
        r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))).toSet
    assert(got == batch)
    // every window overlaps its neighbors: total window-event memberships
    // must be exactly 2x the event count
    val n = Tables.events(spark, sf).count()
    assert(got.toSeq.map(_._2).sum == 2 * n)
  }

  test("streaming trending counts + batch TopKPerKey post-pass == the " +
      "batch ev_trending rows") {
    val stream = EventStreams.readStream(spark, sf)
    val counts = EventStreams.runToMemory(spark,
      EventStreams.trendingCounts(stream), "trending", OutputMode.Complete)
    val got = graft.plans.TopKPerKey.of(counts, Seq("ws"),
      Seq("cnt" -> false, "k" -> true), 3)
      .collect().map(r => (r.getAs[java.sql.Timestamp]("ws"),
        r.getAs[Long]("k"), r.getAs[Long]("cnt"))).toSet
    val batch = SparkEntry.queries("ev_trending")(spark, sf)
      .collect().map(r => (r.getAs[java.sql.Timestamp]("ws"),
        r.getAs[Long]("k"), r.getAs[Long]("cnt"))).toSet
    assert(got == batch,
      "the finalized streaming counts must select the identical top-3")
  }

  test("streaming session windows match batch islands session count") {
    val stream = EventStreams.readStream(spark, sf)
    val sessions = EventStreams.runToMemory(spark,
      EventStreams.sessionWindows(stream), "sessions", OutputMode.Complete)
    val batchSessions = SparkEntry.queries("ev_session")(spark, sf)
    assert(sessions.count() == batchSessions.count())
  }

  test("dropDuplicatesWithinWatermark dedups event_id") {
    val stream = EventStreams.readStream(spark, sf)
    val deduped = EventStreams.runToMemory(spark,
      EventStreams.dedupe(stream), "dedup")
    val n = Tables.events(spark, sf).select("event_id").distinct().count()
    assert(deduped.count() == n)
  }

  test("stream-stream attribution join emits exactly the batch twin's pairs") {
    val stream = EventStreams.readStream(spark, sf)
    val got = EventStreams.runToMemory(spark,
      EventStreams.attributionJoin(stream), "attrib")
      .collect()
      .map(r => (r.getAs[Long]("p_id"), r.getAs[Long]("c_id"))).toSet
    val batch = SparkEntry.queries("ev_stream_join")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("p_id"), r.getAs[Long]("c_id"))).toSet
    assert(batch.nonEmpty, "fixture must produce attribution pairs")
    assert(got == batch)
  }

  test("stream-stream LEFT-OUTER join: matched pairs equal the batch " +
      "twin; null-padded rows are exactly the expired unmatched " +
      "purchases (modulo the watermark boundary)") {
    import org.apache.spark.sql.functions._
    val stream = EventStreams.readStream(spark, sf)
    val got = EventStreams.runToMemory(spark,
      EventStreams.attributionLeftOuter(stream), "attrib_lo")
      .collect()
    val gotMatched = got.filter(!_.isNullAt(3))
      .map(r => (r.getAs[Long]("p_id"), r.getAs[Long]("c_id"))).toSet
    val gotNulls = got.filter(_.isNullAt(3))
      .map(_.getAs[Long]("p_id")).toSet
    val batch = SparkEntry.queries("ev_left_join")(spark, sf).collect()
    val batchMatched = batch.filter(!_.isNullAt(3))
      .map(r => (r.getAs[Long]("p_id"), r.getAs[Long]("c_id"))).toSet
    val batchNulls = batch.filter(_.isNullAt(3))
      .map(_.getAs[Long]("p_id")).toSet
    assert(batchMatched.nonEmpty && batchNulls.nonEmpty,
      "fixture must exercise both the matched and the null-padded path")
    assert(gotMatched == batchMatched,
      "matched pairs must be identical in both modes")
    // Null-padded rows: a subset of the batch unmatched set (a null row
    // for a matchable purchase would be WRONG output, not lateness)...
    assert(gotNulls.subsetOf(batchNulls),
      s"streaming null-padded ${gotNulls -- batchNulls} have batch matches")
    // ...and every unmatched purchase that PROVABLY expired (its latest
    // possible click time is a full watermark-delay + slack behind the
    // final watermark) must have emitted.
    val ev = Tables.events(spark, sf)
    val wmMs = ev.agg(max(unix_micros(col("ts")))).head.getLong(0) / 1000 -
      3600000L // final watermark: max ts - 1h delay
    val pTs = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), unix_micros(col("ts")).as("us")).collect()
      .map(r => r.getLong(0) -> r.getLong(1) / 1000).toMap
    val provablyExpired = batchNulls.filter(p => pTs(p) + 3600000L < wmMs)
    assert(provablyExpired.subsetOf(gotNulls),
      s"expired unmatched purchases ${provablyExpired -- gotNulls} " +
        "never emitted their null row")
  }

  test("flatMapGroupsWithState + EventTimeTimeout: the emitted set equals " +
      "exactly the batch islands whose gap-end the watermark has passed") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val GapUs = 1800000000L
    // batch truth with session END (ev_session's islands + max ts)
    val ev = Tables.events(spark, sf)
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sessions = ev
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev", lag(col("us"), 1).over(wOrd))
      .withColumn("new_sess", when(col("prev").isNull
        || col("us") - col("prev") >= GapUs, 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(wRun))
      .groupBy("user_id", "sess_id")
      .agg(min(col("us")).as("start_us"), max(col("us")).as("last_us"),
        count(lit(1)).as("n_events"))
      .collect()
    // Spark tracks event time in MILLISECONDS (micros are floored), so
    // the closure criterion must be evaluated in ms like the operator's
    val maxUs = ev.agg(max(unix_micros(col("ts")))).head.getLong(0)
    val wmMs = maxUs / 1000 - 600000L
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("user_id"), r.getAs[Long]("start_us"), r.getAs[Long]("n_events"))
    val expected = sessions.filter(r =>
      (r.getAs[Long]("last_us") + GapUs) / 1000 < wmMs)
      .map(key).toSet
    val stream = EventStreams.readStream(spark, sf)
    val got = EventStreams.runToMemory(spark,
      EventStreams.timeoutSessions(spark, stream).toDF, "tsess")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_us"),
        r.getAs[Long]("n_events"))).toSet
    assert(expected.nonEmpty && got == expected,
      s"expected ${expected.size} closed sessions, got ${got.size}")
  }

  test("RocksDB state store: the watermarked aggregation produces the " +
      "identical result under the disk-backed provider") {
    // the default HDFSBackedStateStore keeps ALL streaming state in
    // executor heap — the thing that does not survive 100 TB-scale key
    // cardinalities. RocksDB spills state to local disk; this pins that
    // the engine's streaming ops are provider-agnostic (same results),
    // so flipping the one conf is the whole migration.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = EventStreams.readStream(spark, sf)
      val got = EventStreams.runToMemory(spark,
        EventStreams.hourlyWindow(stream), "hourly_rocks", OutputMode.Complete)
        .collect().map(r => (r.getAs[java.sql.Timestamp]("ws"),
          r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))).toSet
      val batch = SparkEntry.queries("q19_time_window")(spark, sf)
        .collect().map(r => (r.getAs[java.sql.Timestamp]("ws"),
          r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))).toSet
      assert(got == batch)
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("checkpoint recovery: stop the stateful sessionizer mid-stream, " +
      "restart from the checkpoint, and the final output equals the " +
      "uninterrupted run (file source + RocksDB store + file sink)") {
    // THE fault-tolerance property a long-running 100 TB ingest rests on:
    // open-session state and source offsets both live in the checkpoint,
    // so a crash between micro-batches loses nothing and duplicates
    // nothing (the parquet sink's _spark_metadata commits exactly-once).
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.functions._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = java.nio.file.Files.createTempDirectory("graft_ckpt")
      val ev = Tables.events(spark, sf)
      val n = ev.count().toInt
      // ts-ordered halves: phase 1 ends with genuinely OPEN sessions in
      // state — exactly what the restart must recover to emit correctly
      val first = ev.orderBy("ts", "event_id").limit(n / 2)
      val second = ev.join(first.select("event_id"), Seq("event_id"), "left_anti")
      def stage(df: org.apache.spark.sql.DataFrame,
          dir: java.nio.file.Path, name: String): Unit = {
        val tmp = java.nio.file.Files.createTempDirectory("graft_half")
        df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val partStream = java.nio.file.Files.list(tmp)
        val part =
          try partStream.iterator().asScala
            .find(_.getFileName.toString.endsWith(".parquet")).get
          finally partStream.close()
        java.nio.file.Files.createDirectories(dir)
        java.nio.file.Files.move(part, dir.resolve(name))
      }
      def run(input: String, cp: String, out: String): Unit = {
        // the plan is REBUILT from scratch each call — only the
        // checkpoint carries offsets, watermark, and state across runs
        val q = EventStreams.timeoutSessions(spark,
            EventStreams.readStream(spark, input)).toDF
          .writeStream.outputMode(OutputMode.Append)
          .format("parquet")
          .option("checkpointLocation", cp).option("path", out)
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      def result(out: String) = spark.read.parquet(out)
        .collect().map(r => (r.getAs[Long]("user_id"),
          r.getAs[Long]("start_us"), r.getAs[Long]("n_events"))).toSeq
      // interrupted: half, stop, add the rest, restart from checkpoint
      val inA = base.resolve("in_a"); val cpA = s"$base/cp_a"; val outA = s"$base/out_a"
      stage(first, inA, "events_1.parquet")
      run(inA.toString, cpA, outA)
      val midCount = result(outA).size
      stage(second, inA, "events_2.parquet")
      run(inA.toString, cpA, outA)
      // uninterrupted twin: both halves visible from the start
      val inB = base.resolve("in_b"); val cpB = s"$base/cp_b"; val outB = s"$base/out_b"
      stage(first, inB, "events_1.parquet")
      stage(second, inB, "events_2.parquet")
      run(inB.toString, cpB, outB)
      val a = result(outA); val b = result(outB)
      assert(b.nonEmpty, "fixture must close sessions")
      assert(midCount < b.size,
        "phase 1 must stop mid-stream (some sessions still open)")
      assert(a.size == a.toSet.size, "restart must not duplicate emissions")
      assert(a.toSet == b.toSet,
        s"recovered run diverged: ${a.size} vs ${b.size} sessions")
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("checkpoint recovery: the stream-stream join's buffered state " +
      "survives a restart — interrupted run equals uninterrupted " +
      "(file source + RocksDB store + exactly-once file sink)") {
    // the OTHER state store a long ingest rests on: the interval join
    // buffers each side until the watermark proves no partner can
    // arrive; a crash mid-stream must neither drop a pending click nor
    // re-emit a joined pair. Split point = ts order, so phase 1 ends
    // with clicks whose purchases arrive only after the restart.
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.functions._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ev = Tables.events(spark, sf)
      val n = ev.count().toInt
      val first = ev.orderBy("ts", "event_id").limit(n / 2)
      val second = ev.join(first.select("event_id"), Seq("event_id"), "left_anti")
      def stage(df: org.apache.spark.sql.DataFrame,
          dir: java.nio.file.Path, name: String): Unit = {
        val tmp = java.nio.file.Files.createTempDirectory("graft_jhalf")
        df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val ps = java.nio.file.Files.list(tmp)
        val part =
          try ps.iterator().asScala
            .find(_.getFileName.toString.endsWith(".parquet")).get
          finally ps.close()
        java.nio.file.Files.createDirectories(dir)
        java.nio.file.Files.move(part, dir.resolve(name))
      }
      def run(input: String, cp: String, out: String): Unit = {
        val q = EventStreams.attributionJoin(
            EventStreams.readStream(spark, input))
          .writeStream.outputMode(OutputMode.Append)
          .format("parquet")
          .option("checkpointLocation", cp).option("path", out)
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      // explicit schema: a sink dir whose first phase emitted nothing
      // has no data file to infer from
      val joinSchema = EventStreams.attributionJoin(ev).schema
      def result(out: String): Seq[String] =
        spark.read.schema(joinSchema).parquet(out)
          .collect().map(_.toString).toSeq
      val base = java.nio.file.Files.createTempDirectory("graft_jckpt")
      // uninterrupted control
      val inA = base.resolve("inA"); stage(ev, inA, "events_all.parquet")
      run(inA.toString, s"$base/cpA", s"$base/outA")
      // interrupted: half, stop, add the rest, restart from checkpoint
      val inB = base.resolve("inB"); stage(first, inB, "events_1.parquet")
      run(inB.toString, s"$base/cpB", s"$base/outB")
      val partial = result(s"$base/outB")
      stage(second, inB, "events_2.parquet")
      run(inB.toString, s"$base/cpB", s"$base/outB")
      val a = result(s"$base/outB")
      val b = result(s"$base/outA")
      assert(partial.size < b.size,
        "phase 1 must stop with joined pairs still pending")
      assert(a.size == a.toSet.size, "restart must not duplicate pairs")
      assert(a.toSet == b.toSet,
        s"recovered join diverged: ${a.size} vs ${b.size} pairs")
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("streaming EWMA == batch q90 bit-for-bit: batch-mode execution, " +
      "and a TWO-batch stream whose state must carry the last-8 window " +
      "across the batch boundary") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf)
    val batch = SparkEntry.queries("q90_ewma")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // 1) same code, batch mode (one group call, empty state)
    val asBatch = EventStreams.ewmaStream(spark, ev)
      .collect().map(o => (o.user_id, o.event_id, o.ewma)).toSet
    assert(asBatch == batch, "batch-mode flatMapGroupsWithState diverged")
    // 2) incremental: split STRICTLY by a ts cut (no cross-boundary ties)
    // so event-time order holds across batches; state must resume each
    // user's last-8 history, not restart it
    val cut = ev.orderBy("ts", "event_id")
      .limit(ev.count().toInt / 2).agg(max("ts")).collect().head.getTimestamp(0)
    val first = ev.filter(col("ts") <= lit(cut))
    val second = ev.filter(col("ts") > lit(cut))
    assert(first.count() > 0 && second.count() > 0)
    def stage(df: org.apache.spark.sql.DataFrame,
        dir: java.nio.file.Path, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_ewma_h")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val ps = java.nio.file.Files.list(tmp)
      val part =
        try ps.iterator().asScala
          .find(_.getFileName.toString.endsWith(".parquet")).get
        finally ps.close()
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.move(part, dir.resolve(name))
    }
    val base = java.nio.file.Files.createTempDirectory("graft_ewma")
    val in = base.resolve("in")
    stage(first, in, "events_1.parquet")
    val q = EventStreams.ewmaStream(spark,
        EventStreams.readStream(spark, in.toString))
      .toDF().writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ewma_stream").start()
    try {
      q.processAllAvailable()
      val afterOne = spark.table("ewma_stream").count()
      stage(second, in, "events_2.parquet")
      q.processAllAvailable()
      assert(afterOne > 0 && afterOne < batch.size,
        "split must genuinely straddle two batches")
    } finally q.stop()
    val streamed = spark.table("ewma_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch,
      "two-batch streaming EWMA diverged from the batch query — " +
        "state did not carry the window exactly")
  }

  test("streaming burst alerts == batch q104 on the provably-closed " +
      "buckets, and a two-batch split carries the trailing baseline " +
      "across the boundary") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf)
    val BucketUs = 21600000000L
    // final watermark after a full run = max ts − 10 min (ms units)
    val maxTsMs = ev.agg(max("ts")).collect().head.getTimestamp(0).getTime
    val wmMs = maxTsMs - 10 * 60 * 1000
    val batchClosed = SparkEntry.queries("q104_burst_alert")(spark, sf)
      .collect().map(r => (r.getString(0), r.getAs[Long]("bucket"),
        r.getAs[Long]("cnt"),
        Option(r.getAs[java.lang.Long]("base4")).map(_.toLong),
        r.getAs[Long]("alert")))
      .filter { case (_, b, _, _, _) => ((b + 1) * BucketUs) / 1000 < wmMs }
      .toSet
    assert(batchClosed.nonEmpty &&
      batchClosed.exists(_._5 == 1L) && batchClosed.exists(_._5 == 0L),
      "fixture must close buckets with BOTH verdicts")
    def collect(name: String): Set[(String, Long, Long, Option[Long], Long)] =
      spark.table(name).collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2),
        Option(r.getAs[java.lang.Long]("base4")).map(_.toLong),
        r.getLong(4))).toSet
    def stage(df: org.apache.spark.sql.DataFrame,
        dir: java.nio.file.Path, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_burst_h")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val ps = java.nio.file.Files.list(tmp)
      val part =
        try ps.iterator().asScala
          .find(_.getFileName.toString.endsWith(".parquet")).get
        finally ps.close()
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.move(part, dir.resolve(name))
    }
    // uninterrupted run
    val baseA = java.nio.file.Files.createTempDirectory("graft_burst_a")
    val inA = baseA.resolve("in")
    stage(ev, inA, "events_1.parquet")
    val qA = EventStreams.burstAlerts(spark,
        EventStreams.readStream(spark, inA.toString))
      .toDF().writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("burst_a").start()
    try qA.processAllAvailable() finally qA.stop()
    assert(collect("burst_a") == batchClosed,
      "uninterrupted streaming alerts diverged from batch q104")
    // split run: strict ts cut so event-time order holds across batches;
    // the second half's baselines include buckets finalized in batch 1
    val cut = ev.orderBy("ts", "event_id")
      .limit(ev.count().toInt / 2).agg(max("ts")).collect().head.getTimestamp(0)
    val first = ev.filter(col("ts") <= lit(cut))
    val second = ev.filter(col("ts") > lit(cut))
    val baseB = java.nio.file.Files.createTempDirectory("graft_burst_b")
    val inB = baseB.resolve("in")
    stage(first, inB, "events_1.parquet")
    val qB = EventStreams.burstAlerts(spark,
        EventStreams.readStream(spark, inB.toString))
      .toDF().writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("burst_b").start()
    try {
      qB.processAllAvailable()
      val afterOne = collect("burst_b").size
      stage(second, inB, "events_2.parquet")
      qB.processAllAvailable()
      assert(afterOne > 0 && afterOne < batchClosed.size,
        "split must genuinely straddle two batches")
    } finally qB.stop()
    assert(collect("burst_b") == batchClosed,
      "two-batch streaming alerts diverged — the trailing baseline did " +
        "not carry across the boundary")
  }

  test("mapGroupsWithState running totals cover every user") {
    val events = Tables.events(spark, sf)
    val totals = EventStreams.runningTotals(spark, events).collect()
    val users = events.select("user_id").distinct().count()
    assert(totals.length == users)
    val sum = totals.map(_.totalValue).sum
    val expect = events.agg(org.apache.spark.sql.functions.sum("value"))
      .collect().head.getDouble(0)
    assert(math.abs(sum - expect) < 1e-6)
  }

  test("foreachBatch versioned upsert: interrupted streaming maintenance " +
      "equals the batch aggregate, and every crash window replays " +
      "idempotently") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft_upsert")
    val ev = Tables.events(spark, sf)
    val n = ev.count().toInt
    val first = ev.orderBy("ts", "event_id").limit(n / 2)
    val second = ev.join(first.select("event_id"), Seq("event_id"), "left_anti")
    def stage(df: org.apache.spark.sql.DataFrame,
        dir: java.nio.file.Path, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_half")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val partStream = java.nio.file.Files.list(tmp)
      val part =
        try partStream.iterator().asScala
          .find(_.getFileName.toString.endsWith(".parquet")).get
        finally partStream.close()
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.move(part, dir.resolve(name))
    }
    def run(input: String, cp: String, table: String): Unit = {
      val q = EventStreams.foreachBatchUpsert(spark,
        EventStreams.readStream(spark, input), table, cp)
      try q.processAllAvailable() finally q.stop()
    }
    def snapshot(table: String) =
      EventStreams.upsertTable(spark, table).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n"),
          r.getAs[Long]("cents"))).toSet
    // interrupted: half the input, stop, stage the rest, restart
    val in = base.resolve("in"); val cp = s"$base/cp"; val table = s"$base/tbl"
    stage(first, in, "events_1.parquet")
    run(in.toString, cp, table)
    val mid = snapshot(table)
    stage(second, in, "events_2.parquet")
    run(in.toString, cp, table)
    val got = snapshot(table)
    // batch twin: per-user purchase counts + exact cent totals
    val expect = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum((col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2))
          * 100).cast("long")).as("cents"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n"),
        r.getAs[Long]("cents"))).toSet
    assert(mid.nonEmpty && mid != expect,
      "phase 1 must stop with the view genuinely incomplete")
    assert(got == expect,
      s"maintained view diverged from the batch aggregate " +
        s"(${got.size} vs ${expect.size} users)")
    // GC: superseded versions must not accumulate — at most the
    // committed version and its immediate predecessor survive
    val versions = {
      val l = java.nio.file.Files.list(java.nio.file.Paths.get(table))
      try l.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("v_")).toSeq
      finally l.close()
    }
    assert(versions.size <= 2,
      s"version GC must bound the table at 2 live versions: $versions")
    // crash replay, window 1: marker already advanced -> replay skips.
    // Batch ids are per-checkpoint; replay the LAST committed id with
    // DIFFERENT (already-merged) data — a double-merge would show.
    // (marker = "<id>\n<checkpoint>" since the identity guard)
    val lastId = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(table, "_committed")), "UTF-8")
      .linesIterator.next().trim.toLong
    EventStreams.upsertBatch(spark, ev.limit(50).toDF(), table, lastId, cp)
    assert(snapshot(table) == expect, "replayed batch id must be a no-op")
    // a FRESH checkpoint against the same table (ids restart at 0) must
    // fail fast, not silently skip batches as "replays"
    val boom = intercept[IllegalStateException] {
      EventStreams.upsertBatch(spark, ev.limit(50).toDF(), table, 0L,
        s"$base/cp_fresh")
    }
    assert(boom.getMessage.contains("checkpoint"))
    // an id regression WITHIN the checkpoint is outside foreachBatch's
    // replay contract — also fail fast
    intercept[IllegalStateException] {
      EventStreams.upsertBatch(spark, ev.limit(50).toDF(), table,
        lastId - 1, cp)
    }
    // crash replay, window 2: data written but the marker move LOST
    // (crash between the two) — roll the marker back one version and
    // replay: the rewrite must land on the identical table
    val prev = (0L until lastId).filter(v => java.nio.file.Files
      .exists(java.nio.file.Paths.get(table, s"v_$v"))).max
    java.nio.file.Files.write(
      java.nio.file.Paths.get(table, "_committed"),
      s"$prev\n$cp".getBytes("UTF-8"))
    val replayData = ev.join(first.select("event_id"), Seq("event_id"),
      "left_anti") // the second half again, as the source would replay it
    EventStreams.upsertBatch(spark, replayData.toDF(), table, lastId, cp)
    assert(snapshot(table) == expect,
      "marker-lost replay must rebuild the identical version")
    // legacy one-line marker (pre-identity format): a legitimate resume
    // of an old table must NOT wedge on the identity guard — it merges
    // normally and the commit upgrades the marker in place
    java.nio.file.Files.write(
      java.nio.file.Paths.get(table, "_committed"),
      prev.toString.getBytes("UTF-8"))
    EventStreams.upsertBatch(spark, replayData.toDF(), table, lastId, cp)
    assert(snapshot(table) == expect,
      "legacy-marker resume must merge, not throw")
    val upgraded = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(table, "_committed")), "UTF-8")
      .linesIterator.toSeq
    assert(upgraded == Seq(lastId.toString, cp),
      s"commit must stamp the checkpoint identity: $upgraded")
    // legacy marker at the CURRENT id: the replay skips, but adoption
    // must stamp the identity EVEN on the skip path — otherwise a
    // second (foreign) checkpoint could still slip past the guard
    java.nio.file.Files.write(
      java.nio.file.Paths.get(table, "_committed"),
      lastId.toString.getBytes("UTF-8"))
    EventStreams.upsertBatch(spark, ev.limit(50).toDF(), table, lastId, cp)
    assert(snapshot(table) == expect, "legacy skip must not merge")
    val adopted = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(table, "_committed")), "UTF-8")
      .linesIterator.toSeq
    assert(adopted == Seq(lastId.toString, cp),
      s"skip-path adoption must stamp the identity: $adopted")
    // legacy marker AHEAD of the incoming id is ambiguous (foreign
    // fresh checkpoint vs resume) — must fail fast with migration
    // instructions, never silently drop the batch
    java.nio.file.Files.write(
      java.nio.file.Paths.get(table, "_committed"),
      lastId.toString.getBytes("UTF-8"))
    val legacyBoom = intercept[IllegalStateException] {
      EventStreams.upsertBatch(spark, ev.limit(50).toDF(), table,
        lastId - 1, cp)
    }
    assert(legacyBoom.getMessage.contains("legacy marker"))
  }
}
