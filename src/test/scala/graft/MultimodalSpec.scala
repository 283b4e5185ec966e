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

  test("media near-dup pairs: bucketed equi-join finds planted near-copies only") {
    // histogram features only separate SKEWED byte distributions —
    // pseudo-random streams all histogram near-uniform and rightly read
    // as near-dups of each other — so the fixture uses concentrated
    // patterns: img3 = img1 with ONE byte changed (cosine ~0.9999,
    // histogram strongly bucket-0 so the 1-count delta cannot flip an
    // LSH sign); img4 lives in a different histogram bucket entirely
    val withDup = Multimodal.asMediaTable(
      Seq(
        ("img0", "image", Array.empty[Byte]), // zero-norm feature: NaN cosine, must never pair
        ("img1", "image", Array.fill(64)(0.toByte)),
        ("img3", "image", Array.tabulate(64)(i =>
          if (i == 0) 1.toByte else 0.toByte)),
        ("img4", "image", Array.fill(64)(3.toByte)),
        ("aud1", "audio", Array.fill(32)(5.toByte)),
        ("aud2", "audio", Array.fill(32)(5.toByte)),
        ("vid1", "video", Array.tabulate(1024)(i => (i % 256).toByte))).toDS())
    // fixed hyperplanes over the 8-dim histogram space
    val planes = Seq(
      Seq(1.0, -1.0, 0.5, -0.5, 0.25, -0.25, 0.125, -0.125),
      Seq(-0.3, 0.7, -0.9, 0.2, 0.6, -0.4, 0.1, -0.8))
    val pairs = Multimodal.mediaNearDupPairs(withDup, planes, minCosine = 0.99)
    val got = pairs.select("media_a", "media_b")
      .as[(String, String)].collect().toSet
    // exact audio copy pairs; the one-byte image near-copy pairs; the
    // distinct image never does, and modalities never cross
    assert(got === Set(("aud1", "aud2"), ("img1", "img3")), s"got $got")
    // the candidate join is an equi-join on (modality, bucket), not a
    // cartesian comparison
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"media near-dup must bucket, not compare all pairs:\n$plan")
  }
}
