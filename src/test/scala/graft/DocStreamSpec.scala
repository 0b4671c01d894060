package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{DocStreams, EventStreams}

/** Streaming documents pipeline == its batch twins on sf0.001. */
class DocStreamSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def batchDocs =
    spark.read.parquet(s"$sf/documents.parquet")

  test("streaming quality filter + token stats == batch (stateless path)") {
    val stream = DocStreams.tokenStats(
      DocStreams.qualityFilter(DocStreams.readStream(spark, sf)))
    val got = EventStreams.runToMemory(spark, stream, "doc_stats")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = DocStreams.tokenStats(DocStreams.qualityFilter(batchDocs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == batch && got.nonEmpty)
  }

  test("streaming exact dedup keeps one row per content hash, like d1") {
    val stream = DocStreams.dedupeExact(DocStreams.readStream(spark, sf))
    val got = EventStreams.runToMemory(spark, stream, "doc_dedup")
    // d1 keeps min doc_id per hash; streaming keeps the first arrival —
    // the SET of surviving fingerprints is identical either way
    val gotFps = got.select("fp").collect().map(_.getString(0)).toSet
    val d1Fps = SparkEntry.queries("d1_dedup_exact")(spark, sf)
      .select("fp").collect().map(_.getString(0)).toSet
    assert(gotFps == d1Fps)
  }

  test("streaming per-source counts == batch groupBy") {
    val stream = DocStreams.sourceCounts(DocStreams.readStream(spark, sf))
    val got = EventStreams.runToMemory(spark, stream, "doc_sources",
      OutputMode.Complete)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = batchDocs.groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == batch && got.nonEmpty)
  }
}
