package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY §2.10 — absent in the batch-only
  * reference, part of the engine's extension contract).
  *
  * Each transform takes a streaming OR batch DataFrame of the events
  * schema — the same plan runs in both modes, which is how the batch
  * DuckDB oracle (q19_time_window / ev_session) checks the streaming
  * semantics, and how `EventStreams.readStream` + memory-sink tests prove
  * the incremental path.
  */
object EventStreams {

  /** events schema as the streaming source sees it, parameterized on the
    * file's ts type (FileStreamSource needs the schema upfront, and the
    * corpus has shipped with both TIMESTAMP(NANOS) and TIMESTAMP(MICROS)
    * — see `Tables.events`). */
  def eventSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** streaming twin of `Tables.events`: parquet dir → stream of typed rows */
  def readStream(spark: SparkSession, dir: String): DataFrame = {
    // Detect the ts unit from the batch footer (same rule as
    // Tables.events), then hand FileStreamSource the matching explicit
    // schema — nanos files additionally bypass nanos-timestamp schema
    // inference this way, so no legacy session conf is needed.
    // FileStreamSource requires a directory: stream the table dir with a
    // glob pinned to the events file(s)
    val inferredTs = scala.util.Try(
      spark.read.option("pathGlobFilter", "events*.parquet").parquet(dir)
        .schema("ts").dataType).toOption
    val tsType = inferredTs match {
      case Some(TimestampType) | Some(TimestampNTZType) => inferredTs.get
      case _ => LongType // raw nanos; converted below
    }
    val raw = spark.readStream
      .schema(eventSchema(tsType))
      .option("pathGlobFilter", "events*.parquet")
      .parquet(dir)
    if (tsType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw.withColumn("ts", col("ts").cast(TimestampType))
  }

  /** tumbling 1h window counts + value sums with a 10-minute watermark —
    * identical aggregation to the batch q19_time_window oracle. */
  def hourlyWindow(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(12, 2))).cast("double").as("total_value"))
      .select(col("window.start").as("ws"), col("n_events"), col("total_value"))

  /** hopping 1h windows sliding every 30 minutes — each event lands in
    * two overlapping windows (the smooth-trend variant of hourlyWindow);
    * identical aggregation to the batch ev_hopping oracle. */
  def hoppingWindow(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(12, 2))).cast("double").as("total_value"))
      .select(col("window.start").as("ws"), col("n_events"), col("total_value"))

  /** Trending-key counts: per 1-hour window, how often each `k` (from
    * the props JSON) occurred. ONE windowed aggregation — legal in
    * append-mode streaming — whose finalized rows feed a per-window
    * top-K post-pass (the native O(k) TopKPerKey in the batch/catalog
    * face, the same operator applied over the sink table in the
    * streaming face; streaming can't stack a second aggregation before
    * the watermark finalizes the first). */
  def trendingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(window(col("ts"), "1 hour"), col("k"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("ws"), col("k"), col("cnt"))

  /** 30-minute-gap session windows per user (streaming-native twin of the
    * batch islands query ev_session). */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))

  /** streaming dedup on event_id within the watermark horizon */
  def dedupe(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** stream-stream interval join: click→purchase attribution within a
    * 2-hour window, keyed by user. Both sides carry watermarks and the
    * join condition bounds the event-time distance, so Spark can expire
    * join state — the state held per side is (watermark delay + window)
    * of rows, independent of stream length. The same plan runs in batch
    * (withWatermark is a no-op there), which is how the DuckDB oracle
    * checks it (`ev_stream_join`) while StreamingSpec proves the
    * incremental path emits the identical pairs. */
  def attributionJoin(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 2 HOURS"))
      .select(col("p_id"), col("p_user").as("user_id"), col("p_ts"),
        col("c_id"), col("c_ts"))
  }

  /** LEFT-OUTER twin of `attributionJoin`: every purchase emits — with
    * its clicks when they exist, null-padded otherwise. The streaming
    * semantics are the interesting part: an unmatched purchase can only
    * emit once the watermark PROVES no qualifying click can still
    * arrive (click watermark past the purchase's own timestamp), so
    * null rows trail the matched rows by up to the watermark delay.
    * Same plan runs in batch (an ordinary left join) — the DuckDB
    * oracle checks that (`ev_left_join`) while StreamingSpec proves the
    * incremental emission: matched pairs identical, null-padded rows
    * exactly the provably-expired unmatched purchases. */
  def attributionLeftOuter(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 2 HOURS"),
      "left_outer")
      .select(col("p_id"), col("p_user").as("user_id"), col("p_ts"),
        col("c_id"), col("c_ts"))
  }

  final case class UserRunning(userId: Long, nEvents: Long, totalValue: Double)

  /** custom state: running per-user totals via mapGroupsWithState — the
    * escape hatch for aggregations Spark's built-ins can't express. */
  def runningTotals(spark: SparkSession, events: DataFrame): Dataset[UserRunning] = {
    import spark.implicits._
    events.select(col("user_id"), col("value")).as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserRunning, UserRunning](
        GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          var n = prev.nEvents
          var v = prev.totalValue
          rows.foreach { r => n += 1; v += r._2 }
          val next = UserRunning(uid, n, v)
          state.update(next)
          next
      }
  }

  final case class EwmaState(lastCents: Seq[Long])
  final case class EwmaOut(user_id: Long, event_id: Long, ewma: Double)

  /** Streaming twin of q90_ewma — per-user dyadic EWMA as a STATEFUL
    * feature stream: state is just the user's last ≤8 integer-cents
    * values, each arriving event emits its smoothed value immediately.
    * Exactness carries over unchanged from the batch query (integer
    * numerator/denominator, one IEEE division), so streaming == batch
    * bit-for-bit as long as events arrive in event-time order across
    * batches (within a batch any order is fine — rows sort on
    * (ts, event_id) before folding). The same code runs in batch mode
    * (one group call, empty state), which is what the parity spec pins.
    * Scale: state is 8 longs per active user — a 100 TB feature stream
    * holds its working set in the state store, never re-reads history. */
  def ewmaStream(spark: SparkSession, events: DataFrame): Dataset[EwmaOut] = {
    import spark.implicits._
    events.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tsus"),
        (col("value").cast(DecimalType(12, 2)) * 100).cast("long").as("c"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[EwmaState, EwmaOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[EwmaState]) =>
          var hist = state.getOption.map(_.lastCents).getOrElse(Seq.empty[Long])
          val out = rows.toSeq.sortBy(r => (r._3, r._2)).map { r =>
            hist = (hist :+ r._4).takeRight(8)
            val taps = hist.reverse.zipWithIndex // k = 0 is the newest
            val num = taps.iterator.map { case (cv, k) => cv * (1L << (7 - k)) }.sum
            val den = taps.iterator.map { case (_, k) => 1L << (7 - k) }.sum
            EwmaOut(uid, r._2, num.toDouble / (den * 100))
          }
          state.update(EwmaState(hist))
          out.iterator
      }
  }

  /** one session interval (micros since epoch) */
  final case class SessState(start: Long, last: Long, n: Long)
  /** per-user state: disjoint session intervals, any of which may still
    * grow while the watermark has not passed its gap-end */
  final case class SessBuf(sessions: Seq[SessState])
  /** emitted closed session (micros keep the comparison exact — the
    * corpus has microsecond timestamps) */
  final case class SessionOut(user_id: Long, start_us: Long, n_events: Long)

  /** EMIT-ON-TIMEOUT sessionization: flatMapGroupsWithState +
    * EventTimeTimeout — the state-API tier session_window can't express
    * (emit a session record the moment the watermark proves it closed,
    * not at query end). Correct under arbitrary lateness within the
    * watermark: state holds the user's DISJOINT session intervals and a
    * new event merges every interval within the gap of it (a bridging
    * late event can fuse two), extending start downward as well as last
    * upward. A session emits ONLY when the watermark passes its gap-end
    * — either at the next data batch or via the event-time timeout
    * (Spark's no-data batches) — so no emitted record can ever be
    * contradicted by a late-but-valid event. State per user is the
    * open intervals inside the watermark horizon — bounded by the
    * horizon, independent of stream length. */
  def timeoutSessions(spark: SparkSession, events: DataFrame): Dataset[SessionOut] = {
    import spark.implicits._
    val GapUs = 30L * 60 * 1000000
    // an event merges a session when its distance to the interval is
    // under the gap; intervals stay disjoint, so it bridges at most two
    def absorb(ss: List[SessState], t: Long): List[SessState] = {
      val (near, far) = ss.partition(s =>
        t > s.start - GapUs && t < s.last + GapUs)
      val merged = SessState(
        (t +: near.map(_.start)).min,
        (t +: near.map(_.last)).max,
        near.map(_.n).sum + 1)
      (merged :: far).sortBy(_.start)
    }
    events
      .withWatermark("ts", "10 minutes")
      // the watermarked event-time column must reach the stateful
      // operator — project micros ALONGSIDE ts, not instead of it
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("us"))
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessBuf, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, rows, state: GroupState[SessBuf]) =>
          val prior = state.getOption.map(_.sessions.toList).getOrElse(Nil)
          val all =
            if (state.hasTimedOut) prior
            else rows.map(_._3).foldLeft(prior)(absorb)
          // closure test in WATERMARK UNITS (ms): Spark fires timeouts
          // when watermark_ms exceeds the registered ms timestamp, so
          // deciding in micros would leave a sub-ms window where a
          // session is "closed" by one clock and not the other
          val wmMs = state.getCurrentWatermarkMs
          val (closed, open) = all.partition(s =>
            (s.last + GapUs) / 1000 < wmMs)
          if (open.isEmpty) state.remove()
          else {
            state.update(SessBuf(open))
            // fire when the earliest gap-end passes; never at-or-behind
            // the current watermark (illegal). If the runtime fires
            // timeouts only when the watermark STRICTLY exceeds the
            // registered ms, emission can lag one watermark tick behind
            // the earliest provable closure — never incorrect (the
            // closure test above re-checks against the live watermark),
            // just possibly one micro-batch later than the theoretical
            // earliest emit.
            state.setTimeoutTimestamp(math.max(
              open.map(s => (s.last + GapUs) / 1000 + 1).min, wmMs + 1))
          }
          closed.map(s => SessionOut(uid, s.start, s.n)).iterator
      }
  }

  /** per-type burst-alert state: counts for buckets still inside the
    * watermark horizon, plus the trailing (up to 4) FINALIZED bucket
    * counts that form the baseline. */
  final case class BurstState(open: Seq[(Long, Long)], trail: Seq[(Long, Long)])
  /** one finalized bucket verdict (q104's row, emitted live) */
  final case class AlertOut(event_type: String, bucket: Long, cnt: Long,
      base4: Option[Long], alert: Long)

  /** STREAMING burst alerting — q104's trailing-baseline rule emitted
    * the moment the watermark proves a bucket complete (the monitoring
    * loop a 100 TB ingest actually runs: the alert must fire while the
    * burst is news, not at query end). The lag-window formulation is
    * not streaming-legal, so the state API carries exactly what the
    * batch lag carries: per event_type, the OPEN bucket counts inside
    * the watermark horizon plus the trailing four FINALIZED counts
    * (the baseline). A bucket finalizes — in bucket order — only when
    * the watermark passes its end, so no emitted verdict can be
    * contradicted by a late-but-valid event; state per key is the
    * horizon's buckets + 4 longs, independent of stream length.
    * Same integer verdict as q104: 8·cnt > 3·Σtrail4, never with an
    * incomplete baseline. StreamingSpec pins emitted == q104 on the
    * provably-closed set AND a two-batch split == uninterrupted (the
    * baseline genuinely crosses the batch boundary). */
  def burstAlerts(spark: SparkSession, events: DataFrame): Dataset[AlertOut] = {
    import spark.implicits._
    val BucketUs = 21600000000L // 6 hours
    events
      .withWatermark("ts", "10 minutes")
      .select(col("event_type"), col("ts"),
        expr(s"unix_micros(ts) div $BucketUs").as("b"))
      .as[(String, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[BurstState, AlertOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (etype, rows, state: GroupState[BurstState]) =>
          val prior = state.getOption.getOrElse(BurstState(Nil, Nil))
          val open: Map[Long, Long] =
            if (state.hasTimedOut) prior.open.toMap
            else rows.foldLeft(prior.open.toMap) { (m, r) =>
              m.updated(r._3, m.getOrElse(r._3, 0L) + 1L)
            }
          // finalize in WATERMARK UNITS (ms), in bucket order — the
          // timeoutSessions closure discipline
          val wmMs = state.getCurrentWatermarkMs
          val (closed, stillOpen) =
            open.toSeq.sortBy(_._1).partition { case (b, _) =>
              ((b + 1) * BucketUs) / 1000 < wmMs
            }
          var trail = prior.trail
          val out = closed.map { case (b, cnt) =>
            val base = if (trail.size == 4) Some(trail.map(_._2).sum) else None
            val alert = base match {
              case Some(s) if cnt * 8 > s * 3 => 1L
              case _ => 0L
            }
            trail = (trail :+ (b, cnt)).takeRight(4)
            AlertOut(etype, b, cnt, base, alert)
          }
          if (stillOpen.isEmpty && out.isEmpty && prior.trail.isEmpty)
            state.remove()
          else {
            state.update(BurstState(stillOpen, trail))
            if (stillOpen.nonEmpty)
              state.setTimeoutTimestamp(math.max(
                stillOpen.map { case (b, _) =>
                  ((b + 1) * BucketUs) / 1000 + 1 }.min,
                wmMs + 1))
          }
          out.iterator
      }
  }

  /** run a streaming DataFrame to completion against a memory sink and
    * return the materialized result (test/verification harness). */
  /** Streaming materialized-view maintenance via foreachBatch — q68's
    * incremental-aggregate move as a LIVE pipeline: each micro-batch
    * aggregates at its own (small) size, then merges into the durable
    * per-user purchase aggregate with ONE full-outer equi-join. The
    * store is a plain parquet directory made EXACTLY-ONCE by
    * versioned-rewrite: batch id B reads the table version the
    * `_committed` marker names, writes the merged result to `v_B/`,
    * then atomically points the marker at B. Every crash window is
    * covered — a replay of B either skips (marker already at B) or
    * rewrites `v_B/` from the SAME predecessor version, landing
    * byte-identically. This is the idempotent-upsert discipline a
    * 100 TB streaming sink needs when the store is not transactional
    * (a cluster deployment swaps the marker dance for a table format's
    * commit protocol; the MERGE shape is unchanged). State lives in
    * the table, not the state store — like DocStreams.incrementalDedup,
    * restarts only need source offsets.
    */
  def foreachBatchUpsert(spark: SparkSession, events: DataFrame,
      tableRoot: String, checkpoint: String, retainVersions: Int = 2)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    events.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        upsertBatch(spark, batch, tableRoot, id, checkpoint, retainVersions)
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }

  /** One exactly-once merge step (factored out so the spec can also
    * drive crash-replay cases directly).
    *
    * Batch ids are only monotonic WITHIN one checkpoint's lifetime, so
    * the marker records the checkpoint identity next to the committed
    * id and two invalid histories fail fast instead of corrupting the
    * table silently: (a) a table directory reused with a FRESH
    * checkpoint — ids restart at 0 and the old `>= id` guard would
    * have skipped every early batch as a "replay", dropping their data
    * with no error; (b) an id regression within the same checkpoint —
    * impossible under Spark's foreachBatch contract (only the latest
    * committed batch replays), so seeing one means the marker or
    * checkpoint was tampered with. */
  private[graft] def upsertBatch(spark: SparkSession,
      batch: Dataset[org.apache.spark.sql.Row], tableRoot: String,
      id: Long, checkpointId: String, retainVersions: Int = 2): Unit = {
    val committed = readCommitted(tableRoot)
    committed match {
      case Some((cid, Some(ck))) =>
        if (ck != checkpointId)
          throw new IllegalStateException(
            s"upsert table $tableRoot was last committed by checkpoint " +
              s"'$ck' but batch $id arrived from '$checkpointId'; a " +
              "fresh checkpoint restarts batch ids at 0 and would " +
              "silently skip early batches — use a new tableRoot or " +
              "restore the original checkpoint")
        if (id < cid)
          throw new IllegalStateException(
            s"upsert table $tableRoot is committed at batch $cid but " +
              s"batch $id arrived from the same checkpoint — id " +
              "regressions are outside foreachBatch's replay contract")
        if (id == cid) return // replayed batch: already merged
      case Some((cid, None)) =>
        // legacy one-line marker (no identity recorded): the FIRST
        // checkpoint to touch the table post-upgrade ADOPTS it, and the
        // adoption is stamped immediately — even on the skip path — so
        // any second checkpoint fails the identity guard from then on.
        // Only id >= cid is accepted: a lower id is indistinguishable
        // from a fresh checkpoint replaying history against a table
        // that is already ahead, so it fails fast with migration
        // instructions instead of silently dropping batches.
        if (id < cid)
          throw new IllegalStateException(
            s"upsert table $tableRoot carries a legacy marker at batch " +
              s"$cid with no checkpoint identity, and batch $id < $cid " +
              "arrived — cannot distinguish a resume from a foreign " +
              "fresh checkpoint; append the owning checkpoint path as " +
              "a second marker line to migrate, or use a new tableRoot")
        if (id == cid) {
          writeCommitted(tableRoot, cid, checkpointId) // adopt + upgrade
          return
        }
      case None => ()
    }
    val cur = upsertTable(spark, tableRoot)
    val agg = batch
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("b_n"),
        sum((col("value").cast(DecimalType(12, 2)) * 100).cast("long"))
          .as("b_cents"))
    val merged = cur
      .join(agg, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("b_n"), lit(0L)))
          .as("n"),
        (coalesce(col("cents"), lit(0L)) + coalesce(col("b_cents"), lit(0L)))
          .as("cents"))
    merged.write.mode("overwrite").parquet(s"$tableRoot/v_$id")
    writeCommitted(tableRoot, id, checkpointId)
    // GC: once the marker names id, replays of id skip at the marker
    // and a marker-lost crash replay re-reads only the immediate
    // predecessor — versions older than that are unreachable UNDER THE
    // SINGLE-WRITER ASSUMPTION (one checkpoint owns the table; only the
    // latest committed batch ever replays). The default retention of 2
    // (committed + predecessor) covers exactly that one-version
    // rollback; an operator who restores markers from backup, or has
    // external readers pinning superseded versions, must raise
    // `retainVersions` — deletes here are NOT coordinated with
    // concurrent readers of old versions.
    if (committed.nonEmpty) gcVersions(tableRoot, retainNewest = retainVersions)
  }

  /** Current view of the upsert table: the version the marker names, or
    * an empty frame before the first commit. */
  def upsertTable(spark: SparkSession, tableRoot: String): DataFrame =
    readCommitted(tableRoot) match {
      case Some((v, _)) => spark.read.parquet(s"$tableRoot/v_$v")
      case None =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("user_id", LongType),
            StructField("n", LongType), StructField("cents", LongType))))
    }

  /** marker = two lines: committed batch id, committing checkpoint.
    * A one-line marker (pre-identity format) yields checkpoint None —
    * readable, and upgraded in place on the next commit. */
  private def readCommitted(tableRoot: String): Option[(Long, Option[String])] = {
    val p = java.nio.file.Paths.get(tableRoot, "_committed")
    if (java.nio.file.Files.exists(p)) {
      val lines = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        .linesIterator.toSeq
      Some((lines.head.trim.toLong,
        lines.drop(1).headOption.map(_.trim).filter(_.nonEmpty)))
    } else None
  }

  private def writeCommitted(tableRoot: String, id: Long,
      checkpointId: String): Unit = {
    val dir = java.nio.file.Paths.get(tableRoot)
    java.nio.file.Files.createDirectories(dir)
    val tmp = dir.resolve(s"_committed.tmp$id")
    java.nio.file.Files.write(tmp, s"$id\n$checkpointId".getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, dir.resolve("_committed"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** delete every v_<n> directory except the `retainNewest` highest
    * versions (the committed version is always the highest present). */
  private def gcVersions(tableRoot: String, retainNewest: Int): Unit = {
    val root = java.nio.file.Paths.get(tableRoot)
    val all = {
      val l = java.nio.file.Files.list(root)
      try {
        val b = Seq.newBuilder[Long]
        l.iterator().forEachRemaining { p =>
          val name = p.getFileName.toString
          if (name.startsWith("v_") && name.drop(2).forall(_.isDigit))
            b += name.drop(2).toLong
        }
        b.result()
      } finally l.close()
    }
    val keep = all.sorted(Ordering[Long].reverse).take(retainNewest).toSet
    val listing = java.nio.file.Files.list(root)
    try {
      listing.iterator().forEachRemaining { p =>
        val name = p.getFileName.toString
        if (name.startsWith("v_") && name.drop(2).forall(_.isDigit)
            && !keep.contains(name.drop(2).toLong)) {
          val walk = java.nio.file.Files.walk(p)
          try walk.sorted(java.util.Comparator.reverseOrder())
            .forEach(java.nio.file.Files.delete(_))
          finally walk.close()
        }
      }
    } finally listing.close()
  }

  def runToMemory(spark: SparkSession, stream: DataFrame, name: String,
      mode: OutputMode = OutputMode.Append): DataFrame = {
    val q = stream.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .start()
    try { q.processAllAvailable() } finally q.stop()
    spark.table(name)
  }
}
