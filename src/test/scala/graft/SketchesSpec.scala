package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

class SketchesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def fixture(n: Int, group: String, offset: Long = 0L) =
    spark.range(n).select(lit(group).as("g"), (col("id") + offset).as("k"))

  test("distinctSketch estimates within HLL error bounds per group") {
    val df = fixture(5000, "a").unionAll(fixture(300, "b"))
      // duplicates must not inflate the estimate
      .unionAll(fixture(300, "b"))
    val est = Sketches.estimateDistinct(
        Sketches.distinctSketch(df, "k", Seq("g")), Seq("g"))
      .as[(String, Long)].collect().toMap
    assert(math.abs(est("a") - 5000.0) / 5000.0 < 0.03, est)
    assert(math.abs(est("b") - 300.0) / 300.0 < 0.03, est)
  }

  test("sketch merge ≈ single-pass over the union; order-insensitive; monotone") {
    val b1 = fixture(4000, "a")                 // keys [0, 4000)
    val b2 = fixture(4000, "a", offset = 2000L) // keys [2000, 6000) → union 6000
    def sk(df: org.apache.spark.sql.DataFrame) =
      Sketches.distinctSketch(df, "k", Seq("g"))
    def est(df: org.apache.spark.sql.DataFrame) =
      Sketches.estimateDistinct(df, Seq("g")).as[(String, Long)].collect().toMap
    val merged = est(Sketches.mergeSketches(Seq(sk(b1), sk(b2)), Seq("g")))("a")
    val direct = est(sk(b1.unionAll(b2)))("a")
    assert(math.abs(merged - 6000.0) / 6000.0 < 0.03, s"merged=$merged")
    // merged state ≈ single-pass state (internal mode promotions may
    // differ — bounded, not bit-equal)
    assert(math.abs(merged - direct).toDouble / direct < 0.01,
      s"merged=$merged direct=$direct")
    val swapped = est(Sketches.mergeSketches(Seq(sk(b2), sk(b1)), Seq("g")))("a")
    assert(math.abs(merged - swapped).toDouble / merged < 0.005,
      s"merge must be order-insensitive: $merged vs $swapped")
    // monotone: the union estimate dominates each part's
    val part = est(sk(b1))("a")
    assert(merged >= part * 0.99, s"merged=$merged part=$part")
  }

  test("sketch tables stay tiny and merge through partial aggregation") {
    val df = fixture(20000, "a").unionAll(fixture(20000, "b")).repartition(8)
    val sk = Sketches.distinctSketch(df, "k", Seq("g"), lgK = 12)
    val rows = sk.collect()
    assert(rows.length === 2)
    // sketch bytes bounded by ~2^lgK (+ header) regardless of input size
    rows.foreach(r => assert(r.getAs[Array[Byte]]("sketch").length < 5000))
    val p = sk.queryExecution.executedPlan.toString
    assert(p.contains("partial_hll_sketch_agg") || p.contains("partial"),
      s"sketch agg must partial-aggregate map-side:\n$p")
  }

  private def items(group: String, pairs: (String, Int)*) =
    pairs.flatMap { case (it, n) => Seq.fill(n)(group -> it) }

  test("heavyHitters: batch Misra-Gries cut, hand-computed") {
    val df = (items("g", "a" -> 10, "b" -> 6, "c" -> 4, "d" -> 3, "e" -> 1) ++
      items("h", "x" -> 2, "y" -> 1))
      .toDF("g", "item")
    val hh = Sketches.heavyHitters(df, "item", Seq("g"), capacity = 3)
      .as[(String, String, Long)].collect().toSet
    // group g: 4th-largest count = d(3) → subtract 3: a 7, b 3, c 1
    // group h: only 2 items ≤ capacity → exact counts survive
    assert(hh === Set(("g", "a", 7L), ("g", "b", 3L), ("g", "c", 1L),
      ("h", "x", 2L), ("h", "y", 1L)))
    // boundary ties subtract to zero and drop — no tie-break judgement
    val tied = items("t", "a" -> 5, "b" -> 2, "c" -> 2, "d" -> 2).toDF("g", "item")
    val th = Sketches.heavyHitters(tied, "item", Seq("g"), capacity = 2)
      .as[(String, String, Long)].collect().toSet
    assert(th === Set(("t", "a", 3L)))
  }

  test("heavyHitters merge: lower bound + N/(C+1) error, order-free") {
    val c = 4
    val shard1 = items("g", "hot" -> 40, "w1" -> 9, "w2" -> 8, "w3" -> 7,
      "w4" -> 6, "w5" -> 5).toDF("g", "item")
    val shard2 = items("g", "hot" -> 35, "w3" -> 9, "w5" -> 8, "w6" -> 7,
      "w7" -> 2).toDF("g", "item")
    val s1 = Sketches.heavyHitters(shard1, "item", Seq("g"), c)
    val s2 = Sketches.heavyHitters(shard2, "item", Seq("g"), c)
    val merged = Sketches.mergeHeavyHitters(Seq(s1, s2), Seq("g"), c)
      .as[(String, String, Long)].collect().map(r => r._2 -> r._3).toMap
    val truth = shard1.unionAll(shard2).groupBy("item").count()
      .as[(String, Long)].collect().toMap
    val n = truth.values.sum
    // every reported count is a lower bound within N/(C+1) of truth
    merged.foreach { case (it, lo) =>
      assert(lo <= truth(it), s"$it: $lo > ${truth(it)}")
      assert(truth(it) - lo <= n / (c + 1), s"$it: ${truth(it)} - $lo")
    }
    // an item with frequency > N/(C+1) must survive the merge
    assert(merged.contains("hot") && truth("hot") > n / (c + 1))
    // merge order cannot change the summary
    val flipped = Sketches.mergeHeavyHitters(Seq(s2, s1), Seq("g"), c)
      .as[(String, String, Long)].collect().map(r => r._2 -> r._3).toMap
    assert(flipped === merged)
  }

  test("histogram sketch: lossless merge, bin-bounded quantiles, hand case") {
    val w = 10L
    val vals1 = Seq(0L, 3L, 9L, 10L, 25L, 25L, 99L)
    val vals2 = Seq(5L, 30L, 31L, 99L, 100L)
    def df(vs: Seq[Long]) = vs.map(("g", _)).toDF("g", "v")
    val h1 = Sketches.histogramSketch(df(vals1), "v", Seq("g"), w)
    val h2 = Sketches.histogramSketch(df(vals2), "v", Seq("g"), w)
    // hand case: vals1 bins 0:{0,3,9}, 1:{10}, 2:{25,25}, 9:{99}
    assert(h1.as[(String, Long, Long)].collect().toSet ===
      Set(("g", 0L, 3L), ("g", 1L, 1L), ("g", 2L, 2L), ("g", 9L, 1L)))
    // merge is LOSSLESS: merged table == single pass over the union
    val merged = Sketches.mergeHistograms(Seq(h1, h2), Seq("g"))
    val direct = Sketches.histogramSketch(df(vals1 ++ vals2), "v", Seq("g"), w)
    assert(merged.as[(String, Long, Long)].collect().toSet ===
      direct.as[(String, Long, Long)].collect().toSet)
    // quantile estimates: lower bin edge; truth within [est, est + w)
    val qs = Seq(500000L, 900000L, 1000000L)
    val est = Sketches.histogramQuantiles(merged, Seq("g"), qs, w)
      .select("q_micro", "n", "est")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val sorted = (vals1 ++ vals2).sorted
    qs.foreach { q =>
      val (n, e) = est(q)
      assert(n === sorted.length.toLong)
      val truth = sorted(((q * n + 999999L) / 1000000L).toInt - 1)
      assert(e <= truth && truth < e + w, s"q=$q est=$e truth=$truth")
    }
    // p50 of 12 values → rank 6 → value 25 → bin 2 → est 20
    assert(est(500000L)._2 === 20L)
    assert(est(1000000L)._2 === 100L)
    intercept[IllegalArgumentException] {
      Sketches.histogramQuantiles(merged, Seq("g"), Seq(0L), w)
    }
  }

  test("heavyHitters rank filter compiles to WindowGroupLimit") {
    val df = items("g", "a" -> 3, "b" -> 2, "c" -> 1).toDF("g", "item")
    val p = Sketches.heavyHitters(df, "item", Seq("g"), capacity = 2)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      s"top-(C+1) filter must pre-reduce per partition:\n$p")
  }

  test("histogram maintenance across real micro-batches equals one pass") {
    // the incremental-state claim exercised END TO END: each streaming
    // micro-batch contributes its own histogram rows to a state table,
    // and the merged state equals the single-pass histogram — the
    // pattern a 100 TB pipeline runs in foreachBatch against a landing
    import graft.streaming.DocStreams.Doc
    import graft.functions.TextFunctions.tokenCount
    implicit val sqlCtx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def doc(id: Long, n: Int) = Doc(t0, id, Seq.fill(n)("w").mkString(" "))
    val wave1 = Seq(doc(1L, 3), doc(2L, 9), doc(3L, 12))
    val wave2 = Seq(doc(4L, 4), doc(5L, 40))
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Doc]
    val state = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
    var batches = 0
    val q = mem.toDF()
      .select(lit("all").as("g"), tokenCount(col("text")).cast("long").as("v"))
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batches += 1
        state ++= Sketches.histogramSketch(b, "v", Seq("g"), 4L)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        ()
      }
      .start()
    mem.addData(wave1); q.processAllAvailable()
    mem.addData(wave2); q.processAllAvailable()
    q.stop()
    assert(batches >= 2, s"expected multiple micro-batches, got $batches")
    val merged = Sketches
      .mergeHistograms(Seq(state.toSeq.toDF("g", "bin", "cnt")), Seq("g"))
      .as[(String, Long, Long)].collect().toSet
    val direct = Sketches
      .histogramSketch(
        (wave1 ++ wave2).map(d => ("all", d.text.split(" ").length.toLong))
          .toDF("g", "v"),
        "v", Seq("g"), 4L)
      .as[(String, Long, Long)].collect().toSet
    assert(merged === direct, s"merged $merged vs single-pass $direct")
  }

  // ---- count-min ------------------------------------------------------

  private def cmsItems(group: String, kv: (String, Int)*) =
    kv.flatMap { case (item, n) => Seq.fill(n)((group, item)) }
      .toDF("g", "item")

  test("cmsSketch: estimates upper-bound exact counts, exact sans collision") {
    val df = cmsItems("g", "aa" -> 10, "bb" -> 5, "cc" -> 1)
    val sk = Sketches.cmsSketch(df, "item", Seq("g"))
    val probes = Seq(("g", "aa"), ("g", "bb"), ("g", "cc"), ("g", "zz"))
      .toDF("g", "item")
    val est = Sketches.cmsEstimate(sk, probes, "item", Seq("g"))
      .as[(String, String, Long)].collect()
      .map { case (_, i, e) => i -> e }.toMap
    // upper bound always; at 3 distinct items × width 64 no row collides
    // in all 4 rows, so the min recovers the exact count — including the
    // absent probe's 0
    assert(est === Map("aa" -> 10L, "bb" -> 5L, "cc" -> 1L, "zz" -> 0L))
  }

  test("cmsSketch: forced collisions only inflate — never under-count") {
    val kv = (0 until 40).map(i => s"it$i" -> (i + 1))
    val df = cmsItems("g", kv: _*)
    // width 4: 40 items in 4 columns per row — collisions guaranteed
    val sk = Sketches.cmsSketch(df, "item", Seq("g"), depth = 4, width = 4)
    val probes = kv.map { case (i, _) => ("g", i) }.toDF("g", "item")
    val est = Sketches.cmsEstimate(sk, probes, "item", Seq("g"),
        depth = 4, width = 4)
      .as[(String, String, Long)].collect()
      .map { case (_, i, e) => i -> e }.toMap
    val exact = kv.toMap
    kv.foreach { case (i, _) =>
      assert(est(i) >= exact(i).toLong,
        s"$i: est ${est(i)} < exact ${exact(i)}")
    }
    // and at least one real overestimate proves the collisions happened
    assert(kv.exists { case (i, n) => est(i) > n.toLong },
      s"width 4 over 40 items must collide somewhere: $est")
  }

  test("mergeCms ≡ single pass; any merge tree; grid bounded by parameters") {
    val b1 = cmsItems("g", "aa" -> 7, "bb" -> 2)
    val b2 = cmsItems("g", "aa" -> 3, "cc" -> 9)
    val b3 = cmsItems("h", "aa" -> 4)
    def sk(df: org.apache.spark.sql.DataFrame) =
      Sketches.cmsSketch(df, "item", Seq("g"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Int, Int, Long)].collect().toSet
    val direct = rows(sk(b1.unionAll(b2).unionAll(b3)))
    val flat = rows(Sketches.mergeCms(Seq(sk(b1), sk(b2), sk(b3)), Seq("g")))
    val tree = rows(Sketches.mergeCms(
      Seq(Sketches.mergeCms(Seq(sk(b3), sk(b2)), Seq("g")), sk(b1)), Seq("g")))
    assert(flat === direct, "merge must be lossless vs the single pass")
    assert(tree === direct, "merge must be associative/order-insensitive")
    // tall grid ≤ groups × depth × width rows no matter the item stream
    assert(direct.size <= 2 * 4 * 64)
  }

  test("count-min maintenance across real micro-batches equals one pass") {
    // same end-to-end incremental-state claim as the histogram: each
    // micro-batch contributes grid rows in foreachBatch, merged state
    // ≡ the single pass — frequency state a 100 TB pipeline never
    // rebuilds by re-scanning history
    import graft.streaming.DocStreams.Doc
    implicit val sqlCtx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def doc(id: Long, text: String) = Doc(t0, id, text)
    val wave1 = Seq(doc(1L, "aa bb aa"), doc(2L, "cc aa"))
    val wave2 = Seq(doc(3L, "bb bb zz"))
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Doc]
    val state = scala.collection.mutable.ArrayBuffer[(String, Int, Int, Long)]()
    var batches = 0
    val q = mem.toDF()
      .select(lit("all").as("g"),
        explode(graft.functions.TextFunctions.wsTokens(col("text"))).as("item"))
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batches += 1
        state ++= Sketches.cmsSketch(b, "item", Seq("g"))
          .collect().map(r =>
            (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3)))
        ()
      }
      .start()
    mem.addData(wave1); q.processAllAvailable()
    mem.addData(wave2); q.processAllAvailable()
    q.stop()
    assert(batches >= 2, s"expected multiple micro-batches, got $batches")
    val merged = Sketches
      .mergeCms(Seq(state.toSeq.toDF("g", "r", "c", "cnt")), Seq("g"))
      .as[(String, Int, Int, Long)].collect().toSet
    val direct = Sketches
      .cmsSketch(
        (wave1 ++ wave2).flatMap(d => d.text.split(" ").map(("all", _)))
          .toDF("g", "item"),
        "item", Seq("g"))
      .as[(String, Int, Int, Long)].collect().toSet
    assert(merged === direct, s"merged $merged vs single-pass $direct")
    // and the merged state still answers point queries exactly here
    val est = Sketches.cmsEstimate(
        merged.toSeq.toDF("g", "r", "c", "cnt"),
        Seq(("all", "aa"), ("all", "bb"), ("all", "zz")).toDF("g", "item"),
        "item", Seq("g"))
      .as[(String, String, Long)].collect()
      .map { case (_, i, e) => i -> e }.toMap
    assert(est("aa") === 3L && est("bb") === 3L && est("zz") === 1L)
  }

  test("cmsEstimateCol: a grid built at another width (or corrupted) " +
      "fails loudly instead of under-counting") {
    // width mismatch: columns from a width-64 build probed at width 4
    // would miss every cell and read 0 — the upper-bound guarantee
    // silently inverted; the require rejects it
    val wide = Seq((0, 37, 5L), (1, 61, 5L))
    intercept[IllegalArgumentException] {
      Sketches.cmsEstimateCol(wide, lit("aa"), depth = 2, width = 4)
    }
    // negative counters are corrupted state, not a valid sketch
    intercept[IllegalArgumentException] {
      Sketches.cmsEstimateCol(Seq((0, 1, -3L)), lit("aa"),
        depth = 2, width = 4)
    }
    // an in-range grid at the matching width still reads exactly
    val df = cmsItems("g", "aa" -> 6)
    val grid = Sketches.cmsSketch(df, "item", Seq("g"), depth = 4, width = 64)
      .select(col("r"), col("c"), col("cnt"))
      .as[(Int, Int, Long)].collect().toSeq
    val est = df.limit(1)
      .select(Sketches.cmsEstimateCol(grid, col("item")).as("est"))
      .as[Long].collect().head
    assert(est === 6L)
  }
}
