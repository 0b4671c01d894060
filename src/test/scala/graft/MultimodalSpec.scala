package graft

import org.apache.spark.sql.functions._
import graft.functions.Multimodal

class MultimodalSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private lazy val media = Multimodal.asMedia(
    spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text").cache()

  test("media schema: binary payload + typed metadata struct") {
    def shape(s: org.apache.spark.sql.types.StructType): Seq[(String, String)] =
      s.fields.map(f =>
        f.name -> f.dataType.sql.replace(" NOT NULL", "")).toSeq
    assert(shape(media.schema) == shape(Multimodal.mediaSchema))
  }

  test("stub decode: one feature vector per payload, normalized histogram") {
    val feats = Multimodal.decodeFeatures(spark, media).collect()
    assert(feats.length == media.count())
    feats.foreach { r =>
      val v = r.getAs[scala.collection.Seq[Float]]("features")
      assert(v.length == 16)
      assert(math.abs(v.sum - 1.0f) < 1e-3, "histogram must normalize to 1")
    }
  }

  test("stub decode kernel is deterministic on known bytes") {
    val v = Multimodal.decodeBytesStub("aaaa".getBytes("UTF-8"))
    // 'a' = 0x61 → bin 6 gets all mass
    assert(v(6) == 1.0f && v.sum == 1.0f)
  }

  test("frame sampling reads only metadata") {
    val frames = Multimodal.sampleFrames(media, 5).collect()
    frames.foreach { r =>
      val n = r.getAs[Int]("n_frames")
      val ids = r.getAs[scala.collection.Seq[Long]]("frame_ids")
      assert(ids == (0 until n by 5).map(_.toLong))
    }
  }
}
