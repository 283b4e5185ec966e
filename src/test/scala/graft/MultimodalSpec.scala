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

  test("mediaCdcDupStats: container-shifted payload shares chunks, binary ≡ kernel reference") {
    val rnd = new scala.util.Random(13)
    val stream = Array.fill(4000)(rnd.nextInt(256).toByte)
    val other = Array.fill(4000)(rnd.nextInt(256).toByte)
    val header = Array.fill(37)(rnd.nextInt(256).toByte)
    val m = Multimodal.asMediaTable(Seq(
      ("orig", "video", stream),
      ("wrapped", "video", header ++ stream), // re-containered copy
      ("novel", "video", other)).toDS())
    val stats = Multimodal.mediaCdcDupStats(m)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // the shifted copy shares nearly all its chunks with the original
    val (nw, dw, fw) = stats("wrapped")
    assert(fw > 800000L, s"wrapped copy should be mostly duplicate: $stats")
    assert(dw >= nw - 2, s"all but the header-absorbing chunks match: $stats")
    val (_, dn, _) = stats("novel")
    assert(dn === 0L, s"novel payload must be clean: $stats")
    // the binary kernel equals a direct byte-reference implementation
    def roll(bs: Seq[Byte]) =
      bs.foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % 1000000007L)
    def slow(bs: Array[Byte], w: Int, mm: Int): Seq[Long] = {
      val n = bs.length
      if (n == 0) return Seq.empty
      val cuts = (w until n).filter(i => roll(bs.slice(i - w, i)) % mm == 0)
      ((0 +: cuts) zip (cuts :+ n)).map { case (a, b) => roll(bs.slice(a, b)) }
    }
    val fast = graft.expressions.StringExprs
      .cdcChunkHashesBytesK(stream, 16, 64).toLongArray().toSeq
    assert(fast === slow(stream, 16, 64))
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

  test("media embedding ANN: trained ivf+pq over decoded features with a recall gate") {
    // r6 verdict item 4: text had exact → minhash → persisted index but
    // media stopped at one LSH tier. This routes the decoded features
    // through the trained residual IVF+PQ recipe and gates recall@5
    // against exact-L2 ground truth over the same features.
    // Fixture: 8 histogram clusters (mass in buckets g, g+1), 4 variants
    // each — within-group L2 is tiny, across groups ~48 per bucket
    // ids ordered variant-first so the deterministic seed draw (the
    // lexicographic head) spans every cluster, not just the first one
    val items = for (g <- 0 until 8; v <- 0 until 4) yield (
      f"v${v}g$g", "image",
      Array.fill(48 + v)(g.toByte) ++ Array.fill(16 - v)(((g + 1) % 8).toByte))
    val media = Multimodal.asMediaTable(items.toDS())
    val (cents, books, codes) =
      Multimodal.mediaAnnIndex(media, nlist = 4, m = 4, bookK = 8,
        kmeansIters = 2, pqIters = 2)
    assert(codes.count() === 32)
    assert(codes.columns.toSeq ===
      Seq("media_id", "cell", "code_0", "code_1", "code_2", "code_3"))
    val probeIds = (0 until 8).map(g => s"v0g$g")
    val probes = media.filter(col("media_id").isin(probeIds: _*))
    val got = Multimodal.mediaAnnTopK(codes, cents, books, probes, k = 5, nprobe = 2)
    got.collect()
    // search is the cell-restricted broadcast equi-join — never a
    // cartesian comparison against the whole corpus
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"ANN search must restrict to cells:\n$plan")
    // exact-L2 ground truth over the same decoded features
    val fv = Multimodal.mediaFeatures(media).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    def l2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + (x - y) * (x - y) }
    val truth = probeIds.map { p =>
      p -> fv.keys.filter(_ != p).toSeq
        .sortBy(c => (l2(fv(p), fv(c)), c)).take(5).toSet
    }.toMap
    val ann = got.collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = probeIds.map(p =>
      (ann.getOrElse(p, Set.empty) intersect truth(p)).size / 5.0)
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.6, s"mean recall@5 $mean (per-probe: $recalls)")
    // and every probe's nearest group-mates are reachable: at least 2
    // of its 3 within-group variants appear in its top-5
    probeIds.foreach { p =>
      val mates = (1 until 4).map(v => s"v$v" + p.drop(2)).toSet
      assert((ann.getOrElse(p, Set.empty) intersect mates).size >= 2,
        s"probe $p lost its cluster: got ${ann.getOrElse(p, Set.empty)}")
    }
  }

  test("media features route through semanticDedup — the multimodal semantic rung") {
    import graft.operators.Dedup
    val fv = Multimodal.mediaFeatures(media) // (media_id, fv: 8-bucket histogram)
    val one = Seq((0L, Seq.fill(8)(1.0))).toDF("cid", "cv")
    // 8-dim all-positive histograms sit near-parallel (~0.998 between
    // unrelated media); only byte-identical media reach cosine ≈ 1.0
    val tau = 0.9999
    val kept = Dedup.semanticDedup(fv, one, tau, idCol = "media_id", vecCol = "fv")
      .select("media_id").as[String].collect().toSet
    // derive the expected keep-set from exact cosines with the same rule
    val feats = fv.collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).toIndexedSeq).toMap
    def cos(a: IndexedSeq[Double], b: IndexedSeq[Double]) = {
      val d = a.indices.map(i => a(i) * b(i)).sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val ids = feats.keys.toSeq.sorted
    val expected = ids.filterNot(b =>
      ids.exists(a => a < b && cos(feats(a), feats(b)) >= tau)).toSet
    assert(kept === expected, s"kept $kept vs derived $expected")
    // the planted byte-identical copy is the one semantic duplicate
    assert(kept.contains("img1") && !kept.contains("img2"))
  }

  test("sniffType: magic-byte signatures, offset checks, truncated and " +
      "mislabeled blobs fall to unknown") {
    import spark.implicits._
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    def s(x: String): Array[Byte] = x.getBytes("ISO-8859-1")
    val payload = s("payloadpayload")
    val rows = Seq(
      ("jpeg", b(0xFF, 0xD8, 0xFF) ++ payload),
      ("png", b(0x89) ++ s("PNG") ++ b(0x0D, 0x0A, 0x1A, 0x0A) ++ payload),
      ("gif", s("GIF89a") ++ payload),
      ("wav", s("RIFF") ++ b(0, 0, 0, 0) ++ s("WAVE") ++ payload),
      ("mp4", b(0, 0, 0, 0x18) ++ s("ftypisom") ++ payload),
      ("pdf", s("%PDF-1.7 ") ++ payload),
      // RIFF container that is NOT wave audio → unknown, not wav
      ("u1", s("RIFF") ++ b(0, 0, 0, 0) ++ s("AVI ") ++ payload),
      // truncated jpeg signature
      ("u2", b(0xFF, 0xD8)),
      ("u3", Array.empty[Byte]),
      ("u4", s("plain text bytes")))
      .toDF("id", "bytes")
      .select(col("id"),
        graft.operators.Multimodal.sniffType(col("bytes")).as("kind"))
      .as[(String, String)].collect().toMap
    assert(rows("jpeg") === "jpeg" && rows("png") === "png")
    assert(rows("gif") === "gif" && rows("wav") === "wav")
    assert(rows("mp4") === "mp4" && rows("pdf") === "pdf")
    Seq("u1", "u2", "u3", "u4").foreach(u => assert(rows(u) === "unknown", u))
  }
}
