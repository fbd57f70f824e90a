package graft.ext

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val docs = {
    import spark.implicits._
    Seq((0L, "some image bytes", "en", "s", 16L),
      (1L, "some audio bytes", "en", "s", 16L),
      (2L, "some video bytes", "en", "s", 16L),
      (5L, "other video bytes", "en", "s", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("syntheticMedia assigns modalities round-robin and carries payload bytes") {
    val media = Multimodal.syntheticMedia(spark, docs)
    val rows = media.collect().map(r => r.media_id -> r).toMap
    assert(rows(0L).modality == "image")
    assert(rows(1L).modality == "audio")
    assert(rows(2L).modality == "video")
    assert(new String(rows(0L).payload, "UTF-8") == "some image bytes")
  }

  test("extractFeatures is deterministic per payload and batch-shaped") {
    val media = Multimodal.syntheticMedia(spark, docs)
    val f1 = Multimodal.extractFeatures(media, dim = 8, targetPartitions = 2)
      .collect().map(r => r.media_id -> r.feature.toSeq).toMap
    val f2 = Multimodal.extractFeatures(media, dim = 8)
      .collect().map(r => r.media_id -> r.feature.toSeq).toMap
    assert(f1 == f2) // partitioning must not change results
    assert(f1(0L).length == 8)
    assert(f1(0L) != f1(1L)) // different payloads -> different features
    val nb = Multimodal.extractFeatures(media, dim = 8).collect()
      .find(_.media_id == 0L).get.n_bytes
    assert(nb == "some image bytes".length.toLong)
  }

  test("sampleFrames explodes every k-th frame index for video rows only") {
    val media = Multimodal.syntheticMedia(spark, docs)
    val frames = Multimodal.sampleFrames(media, everyK = 10)
    val byId = frames.groupBy("media_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // n_frames=30 -> indices 0,10,20
    assert(byId == Map(2L -> 3L, 5L -> 3L))
  }

  test("sampleFrames yields zero frames (not an error) for empty/unknown clips") {
    import spark.implicits._
    val broken = Seq(
      Multimodal.MediaRow(9L, "video", Array[Byte](1), "m", -1, -1, -1, 0),
      Multimodal.MediaRow(10L, "video", Array[Byte](1), "m", -1, -1, -1, -1))
      .toDS()
    assert(Multimodal.sampleFrames(broken, everyK = 10).count() == 0)
  }
}
