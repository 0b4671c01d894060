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
}
