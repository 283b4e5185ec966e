package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.asMediaTable(
    Seq(
      ("img1", "image", Array.tabulate(64)(i => (i * 7 % 251).toByte)),
      ("img2", "image", Array.tabulate(64)(i => (i * 7 % 251).toByte)), // same bytes as img1
      ("aud1", "audio", Array.tabulate(32)(i => (i * 13 % 251).toByte)),
      ("vid1", "video", Array.tabulate(1024)(i => (i % 256).toByte))).toDS())

  test("media table schema and modality partitioning") {
    assert(media.schema.fieldNames.toSeq ===
      Seq("media_id", "modality", "bytes", "meta"))
    assert(media.count() === 4)
  }

  test("batch feature extraction is deterministic and schema-typed") {
    val f = Multimodal.extractFeatures(media)
    assert(f.schema === Multimodal.featureSchema)
    val rows = f.collect().map(r => r.getAs[String]("media_id") -> r).toMap
    def feat(id: String): List[Float] =
      rows(id).getSeq[Float](rows(id).fieldIndex("feature")).toList
    // identical bytes → identical decoded features
    assert(feat("img1") === feat("img2"))
    assert(rows("img1").getAs[Int]("width") === rows("img2").getAs[Int]("width"))
    // only video gets n_frames
    assert(rows("vid1").getAs[Integer]("n_frames") !== null)
    assert(rows("img1").isNullAt(rows("img1").fieldIndex("n_frames")))
    // histogram feature sums to byte count
    assert(feat("aud1").sum === 32f)
  }

  test("frame sampling slices deterministic byte ranges per frame") {
    val frames = Multimodal.sampleFrames(media, n = 4, frameBytes = 256)
    assert(frames.count() === 4) // only vid1, 4 frames
    val f0 = frames.filter(col("frame_idx") === 0).head()
      .getAs[Array[Byte]]("frame_bytes")
    assert(f0.length === 256)
    assert(f0(0) === 0.toByte && f0(255) === 255.toByte)
    val f3 = frames.filter(col("frame_idx") === 3).head()
      .getAs[Array[Byte]]("frame_bytes")
    assert(f3(0) === (768 % 256).toByte)
  }
}
