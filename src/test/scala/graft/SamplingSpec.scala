package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def corpus = (0L until 4000L).map(i =>
    (i, if (i % 4 == 0) "en" else if (i % 4 == 1) "de" else "fr"))
    .toDF("id", "lang")

  test("stratified keeps ~rate per stratum and drops unlisted strata") {
    val out = Sampling.stratified(corpus, "lang", "id",
      Map("en" -> 0.5, "de" -> 0.2))
    val byLang = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    // 1000 docs per listed stratum; hash gate is uniform so expect
    // rate ± a few percent
    assert(byLang("en") > 420 && byLang("en") < 580, s"en=${byLang.get("en")}")
    assert(byLang("de") > 140 && byLang("de") < 260, s"de=${byLang.get("de")}")
    assert(!byLang.contains("fr"), "unlisted stratum must be dropped")
  }

  test("sample is deterministic and stable under repartitioning") {
    val rates = Map("en" -> 0.3, "de" -> 0.7)
    val a = Sampling.stratified(corpus, "lang", "id", rates)
      .select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.stratified(corpus.repartition(13), "lang", "id", rates)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a === b, "rand()-free gate must not depend on partitioning")
  }

  test("rate 1.0 keeps everything, 0.0 keeps nothing") {
    val out = Sampling.stratified(corpus, "lang", "id",
      Map("en" -> 1.0, "de" -> 0.0))
    assert(out.filter(col("lang") === "en").count() === 1000)
    assert(out.filter(col("lang") === "de").count() === 0)
  }

  test("structured ids (multiples of 1000) still sample at ~rate") {
    // The pre-fix hash collapsed to a bijection of id % buckets, so ids
    // that are all ≡ 0 (mod 1000) landed in ONE bucket: rate 0.5 kept
    // either all 2000 or none. The mod-p MCG must mix the high digits.
    val structured = (0L until 2000L).map(i => (i * 1000L, "en")).toDF("id", "lang")
    val kept = Sampling.stratified(structured, "lang", "id", Map("en" -> 0.5)).count()
    assert(kept > 840 && kept < 1160, s"multiples-of-1000 ids kept $kept of 2000 at rate 0.5")
    val fixedLow = (0L until 2000L).map(i => (i * 1000L + 7L, "en")).toDF("id", "lang")
    val kept7 = Sampling.stratified(fixedLow, "lang", "id", Map("en" -> 0.25)).count()
    assert(kept7 > 380 && kept7 < 620, s"fixed-low-digit ids kept $kept7 of 2000 at rate 0.25")
  }

  test("out-of-range rates are rejected") {
    intercept[IllegalArgumentException] {
      Sampling.stratified(corpus, "lang", "id", Map("en" -> 1.5))
    }
  }

  test("sampling is a narrow plan — no exchange") {
    val out = Sampling.stratified(corpus, "lang", "id", Map("en" -> 0.5))
    val plan = out.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"stratified sampling must not shuffle:\n$plan")
  }

  test("temperatureMix hits the hand-computed per-stratum targets") {
    // corpus: en=1000, de=1000, fr=2000; α=0.5 → w=(31.62.., 31.62.., 44.72..)
    val kept = Sampling.temperatureMix(corpus, "lang", "id", budget = 400L)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val ws = Seq("de" -> 1000L, "en" -> 1000L, "fr" -> 2000L)
      .map { case (l, n) => l -> math.sqrt(n.toDouble) }
    val wTot = ws.foldLeft(0.0)(_ + _._2)
    val want = ws.map { case (l, w) =>
      l -> math.floor(400.0 * w / wTot).toLong
    }.toMap
    assert(kept === want, s"kept=$kept want=$want")
    assert(kept.values.sum <= 400L)
    // temperature pulls the head DOWN: fr has 2× the docs but < 2× the draw
    assert(kept("fr").toDouble / kept("en") < 2.0)
  }

  test("temperatureMix α=1 is natural proportions") {
    val kept = Sampling.temperatureMix(corpus, "lang", "id",
      budget = 400L, alpha = 1.0)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(kept === Map("en" -> 100L, "de" -> 100L, "fr" -> 200L))
  }

  test("temperatureMix draws nest: a smaller budget is a subset") {
    val small = Sampling.temperatureMix(corpus, "lang", "id", budget = 100L)
      .select("id").as[Long].collect().toSet
    val big = Sampling.temperatureMix(corpus, "lang", "id", budget = 300L)
      .select("id").as[Long].collect().toSet
    assert(small.subsetOf(big),
      s"rank order is fixed, so draws must nest: ${small -- big}")
  }

  test("temperatureMix is deterministic under repartitioning") {
    val a = Sampling.temperatureMix(corpus, "lang", "id", budget = 250L)
      .select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.temperatureMix(corpus.repartition(13), "lang", "id",
      budget = 250L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a === b)
  }

  test("temperatureMix rank window is the ONE exchange in the plan") {
    val out = Sampling.temperatureMix(corpus, "lang", "id", budget = 100L)
    val plan = out.queryExecution.executedPlan.toString()
    val n = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(n === 1, s"expected exactly the stratum-window exchange:\n$plan")
  }

  test("temperatureMixTokens running-cost window is still the ONE exchange") {
    val priced = corpus.withColumn("cost", lit(3L) + col("id") % 5)
    val out = Sampling.temperatureMixTokens(priced, "lang", "id", "cost",
      budget = 500L)
    val plan = out.queryExecution.executedPlan.toString()
    val n = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(n === 1, s"expected exactly the stratum-window exchange:\n$plan")
  }

  test("temperatureMix broadcast fallback (forced) matches the inline path exactly") {
    val inline = Sampling.temperatureMix(corpus, "lang", "id", budget = 250L)
      .select("id", "lang").as[(Long, String)].collect().toSet
    val fb = Sampling.temperatureMix(corpus, "lang", "id", budget = 250L,
        inlineLimit = 0)
      .select("id", "lang").as[(Long, String)].collect().toSet
    assert(fb === inline)
    // and the fallback plan still has only the one window exchange —
    // the target table must ride a broadcast, not a shuffle
    val plan = Sampling.temperatureMix(corpus, "lang", "id", budget = 100L,
        inlineLimit = 0)
      .queryExecution.executedPlan.toString()
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1, plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("temperatureMix drops NULL strata instead of NPE-ing the driver sort") {
    val withNulls = corpus.withColumn("lang",
      when(col("id") % 100 === 0, lit(null: String)).otherwise(col("lang")))
    val kept = Sampling.temperatureMix(withNulls, "lang", "id", budget = 400L)
      .select("id", "lang").as[(Long, String)].collect()
    assert(kept.forall(_._2 != null))
    // the non-null strata still hit their targets (counts shrink by the
    // nulled-out rows, but every stratum stays populated)
    val byLang = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang.keySet === Set("en", "de", "fr"))
    assert(kept.length === byLang.values.sum && kept.length > 300)
  }

  test("temperatureMixTokens draws nest: a smaller token budget is a subset") {
    val priced = corpus.withColumn("cost", lit(2L) + col("id") % 9)
    val small = Sampling.temperatureMixTokens(priced, "lang", "id", "cost", 1000L)
      .select("id").as[Long].collect().toSet
    val big = Sampling.temperatureMixTokens(priced, "lang", "id", "cost", 3000L)
      .select("id").as[Long].collect().toSet
    assert(small.subsetOf(big),
      s"targets and the hash order are both monotone, so draws must nest: ${small -- big}")
    assert(small.nonEmpty && big.size > small.size)
  }

  test("temperatureMixTokens cuts each stratum at its inclusive cost target") {
    // en: ids 1..4, costs 10/50/30/20 → mass 110; de: ids 5..6, costs
    // 40/40 → mass 80. α=0.5: w=(√110, √80), budget 100 →
    // t_en=⌊100·10.488../19.432..⌋=53, t_de=46. MCG-hash order:
    // en id2 < id4 < id1 < id3 (cum 50, 70, …) → only id2 fits 53;
    // de id5 < id6 (cum 40, 80) → only id5 fits 46.
    val corpus = Seq(
      (1L, "en", 10L), (2L, "en", 50L), (3L, "en", 30L), (4L, "en", 20L),
      (5L, "de", 40L), (6L, "de", 40L)).toDF("id", "lang", "cost")
    val kept = Sampling.temperatureMixTokens(corpus, "lang", "id", "cost",
        budget = 100L)
      .select("id").as[Long].collect().toSet
    assert(kept === Set(2L, 5L))
  }

  test("temperatureMixTokens never overshoots a stratum's cost target") {
    val corpus = (0L until 1000L).map(i =>
      (i, if (i % 3 == 0) "en" else "fr", 1L + i % 17)).toDF("id", "lang", "cost")
    val budget = 2000L
    val kept = Sampling.temperatureMixTokens(corpus, "lang", "id", "cost", budget)
    val perStratum = kept.groupBy("lang").agg(sum("cost").as("c"))
      .as[(String, Long)].collect().toMap
    // recompute the targets exactly as the operator defines them
    val masses = corpus.groupBy("lang").agg(sum("cost").as("m"))
      .as[(String, Long)].collect().sortBy(_._1)
    val ws = masses.map { case (st, m) => st -> math.sqrt(m.toDouble) }
    val wTot = ws.foldLeft(0.0)(_ + _._2)
    ws.foreach { case (st, w) =>
      val t = math.floor(budget.toDouble * w / wTot).toLong
      assert(perStratum(st) <= t, s"stratum $st kept ${perStratum(st)} > target $t")
      assert(perStratum(st) > 0, s"stratum $st kept nothing")
    }
  }

  test("temperatureMixTokens broadcast fallback (forced) matches the inline path") {
    val corpus = (0L until 500L).map(i =>
      (i, "s" + (i % 5), 1L + i % 7)).toDF("id", "lang", "cost")
    val inline = Sampling.temperatureMixTokens(corpus, "lang", "id", "cost", 300L)
      .select("id").as[Long].collect().toSet
    val fallback = Sampling.temperatureMixTokens(corpus, "lang", "id", "cost", 300L,
        inlineLimit = 1)
      .select("id").as[Long].collect().toSet
    assert(inline === fallback && inline.nonEmpty)
  }

  test("temperatureMixTokens: a zero-mass stratum drops entirely, zero-cost rows included") {
    // 'junk' has only zero-cost docs: its temperature share is 0, and
    // the rows must NOT ride free (their inclusive running cost 0 <= 0)
    val mixed = (Seq((1L, "en", 5L), (2L, "en", 5L), (3L, "en", 5L)) ++
      (10L until 15L).map(i => (i, "junk", 0L))).toDF("id", "lang", "cost")
    val kept = Sampling.temperatureMixTokens(mixed, "lang", "id", "cost", 10L)
      .select("lang").as[String].collect().toSet
    assert(kept === Set("en"), s"zero-mass stratum leaked into the mix: $kept")
  }

  test("temperatureMixTokens refuses non-integral cost columns") {
    val doubly = Seq((1L, "en", 5.0)).toDF("id", "lang", "cost")
    val e = intercept[IllegalArgumentException] {
      Sampling.temperatureMixTokens(doubly, "lang", "id", "cost", 10L)
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
  }

  test("temperatureMixTokens drops null costs/strata and refuses negative costs") {
    val withNulls = Seq(
      (1L, "en", java.lang.Long.valueOf(5L)),
      (2L, "en", null.asInstanceOf[java.lang.Long]),
      (3L, null.asInstanceOf[String], java.lang.Long.valueOf(5L)),
      (4L, "en", java.lang.Long.valueOf(5L))).toDF("id", "lang", "cost")
    val kept = Sampling.temperatureMixTokens(withNulls, "lang", "id", "cost", 100L)
      .select("id").as[Long].collect().toSet
    assert(kept === Set(1L, 4L))
    intercept[IllegalArgumentException] {
      Sampling.temperatureMixTokens(
        Seq((1L, "en", -5L)).toDF("id", "lang", "cost"),
        "lang", "id", "cost", 100L)
    }
  }

  test("temperatureMix rejects bad budget and alpha") {
    intercept[IllegalArgumentException] {
      Sampling.temperatureMix(corpus, "lang", "id", budget = 0L)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureMix(corpus, "lang", "id", budget = 10L, alpha = 1.5)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureMix(corpus, "lang", "id", budget = 10L, alpha = 0.0)
    }
  }

  test("dsirLogWeights: target-like docs outrank off-target, counts exact, partition-stable") {
    import spark.implicits._
    // target vocabulary {alpha..delta}, off-target {red..blue}; raw
    // docs 10/11 are target-like, 12/13 off-target-like
    val docs = Seq(
      (1L, "tgt", "alpha beta gamma delta alpha beta"),
      (2L, "tgt", "beta gamma alpha delta delta gamma"),
      (10L, "raw", "alpha beta gamma delta"),
      // target-attested bigrams only (beta gamma / gamma delta / delta
      // alpha all occur in the target) — a REVERSED word order scores
      // negative because bigram features encode order
      (11L, "raw", "beta gamma delta alpha"),
      (12L, "raw", "red green blue yellow"),
      (13L, "raw", "blue yellow red green"))
      .toDF("doc_id", "src", "text")
    val w = Sampling.dsirLogWeights(docs, "doc_id", "text",
      col("src") === "tgt", buckets = 16)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    // n_feats = unigrams + bigrams = 2n − 1
    assert(w(10L)._1 === 7L)
    assert(w(1L)._1 === 11L)
    // target-vocabulary docs carry positive evidence, off-target negative
    assert(w(10L)._2 > w(12L)._2,
      s"target-like ${w(10L)} must outrank off-target ${w(12L)}")
    assert(w(12L)._2 < 0, s"off-target doc should score negative: ${w(12L)}")
    // per-feature normalized: same-vocab docs of different length agree in sign
    assert(w(11L)._2 > 0)
    // determinism: identical output under a different partitioning
    val w2 = Sampling.dsirLogWeights(docs.repartition(7), "doc_id", "text",
      col("src") === "tgt", buckets = 16)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(w === w2)
  }

  test("weightedSampleWor: exactly min(k, n) distinct rows, weight-biased, " +
      "deterministic, degenerate weights dropped") {
    import spark.implicits._
    // 50 strata, each with one weight-1e6 item and five weight-1 items:
    // the ES race picks the heavy item with P ≈ 1 − 5e-6 per stratum
    val df = (0 until 50).flatMap { s =>
      (s"s$s", s * 100L + 0L, 1000000L) +:
        (1L to 5L).map(i => (s"s$s", s * 100L + i, 1L))
    }.toDF("st", "id", "w")
    val picked = Sampling.weightedSampleWor(df, "st", "id", "w", k = 1)
      .select($"st", $"id", $"w")
      .as[(String, Long, Long)].collect()
    assert(picked.length === 50)                        // exactly k per stratum
    assert(picked.map(_._1).distinct.length === 50)
    val heavyWins = picked.count(_._3 === 1000000L)
    assert(heavyWins >= 45, s"weight bias broken: $heavyWins/50 heavy wins")
    // k beyond the stratum returns everything, exactly once
    val all = Sampling.weightedSampleWor(
        df.filter($"st" === "s0"), "st", "id", "w", k = 100)
      .select($"st", $"id", $"w")
      .as[(String, Long, Long)].collect()
    assert(all.length === 6 && all.map(_._2).distinct.length === 6)
    // deterministic under repartitioning
    val again = Sampling
      .weightedSampleWor(df.repartition(7), "st", "id", "w", k = 1)
      .select($"st", $"id", $"w")
      .as[(String, Long, Long)].collect()
    assert(picked.toSet === again.toSet)
    // zero/negative weights can never win a race leg
    val degenerate = Seq(("a", 1L, 0L), ("a", 2L, -5L), ("a", 3L, 2L))
      .toDF("st", "id", "w")
    val d = Sampling.weightedSampleWor(degenerate, "st", "id", "w", k = 3)
      .select($"st", $"id", $"w")
      .as[(String, Long, Long)].collect()
    assert(d.toSeq === Seq(("a", 3L, 2L)))
    // output contract: the caller's columns, unchanged, in order
    assert(picked.length === 50)
    assert(Sampling.weightedSampleWor(df, "st", "id", "w", k = 1)
      .columns.toSeq === df.columns.toSeq)
  }

  test("weightedSampleWor: ES key quantizes ln(u) BEFORE the weight " +
      "divide (quantize-after collapses heavy strata onto the id tie)") {
    import spark.implicits._
    // ids 1, 11, 21, 40 at weight 1e6 all share quantize-after key
    // floor(ln(u)/w*1e6) = -3; quantize-after would fall back to the
    // id tiebreak and pick id 1. The correct quantize-first keys are
    // floor(ln(u)*1e6)/w = -2.287472, -2.147711, -2.025109, -2.798302
    // — id 21 holds the strict maximum and must win at k = 1.
    val df = Seq(1L, 11L, 21L, 40L).map(("s", _, 1000000L))
      .toDF("st", "id", "w")
    val win = Sampling.weightedSampleWor(df, "st", "id", "w", k = 1)
      .select($"id").as[Long].collect()
    assert(win.toSeq === Seq(21L),
      s"quantize-order regression: picked ${win.toSeq}, want Seq(21)")
  }

  test("materializeMix: full epochs for everyone, a deterministic " +
      "hash-order prefix fills the fraction, two-phase cumsum ≡ plain") {
    import spark.implicits._
    val docs = (
      (1L to 3L).map(i => ("A", i, 10L)) ++      // 3 docs × 10 tokens
      (11L to 12L).map(i => ("B", i, 5L)) ++     // 2 docs × 5 tokens
      (21L to 24L).map(i => ("C", i, 10L)))      // 4 docs × 10 tokens
      .toDF("source", "doc_id", "tok")
    val alloc = Seq(
      // A: 2.5 epochs of 30 tokens → alloc 75: f=2, rem=15 → 2 docs
      // get a third pass (cum 0 and 10 < 15; cum 20 does not)
      ("A", 30L, 2500000L, 75L),
      // B: exactly 1 epoch → rem 0, nobody gets a second pass
      ("B", 10L, 1000000L, 10L),
      // C: half an epoch → f=0, only the 20-token hash prefix appears
      ("C", 40L, 500000L, 20L))
      .toDF("source", "n_tokens", "epochs_micro", "alloc_tokens")
    val out = Sampling
      .materializeMix(docs, "source", "doc_id", "tok", alloc)
      .as[(String, Long, Long)].collect()
    val perDoc = out.groupBy(r => (r._1, r._2)).view
      .mapValues(v => v.map(_._3).sorted.toSeq).toMap
    // A: every doc has epochs 1..2; exactly two docs also epoch 3
    val aEpochs = (1L to 3L).map(i => perDoc(("A", i)))
    assert(aEpochs.forall(e => e.startsWith(Seq(1L, 2L))))
    assert(aEpochs.count(_.length == 3) === 2, aEpochs)
    // B: exactly one epoch each
    assert((11L to 12L).forall(i => perDoc(("B", i)) === Seq(1L)))
    // C: exactly two of the four docs appear, with epoch 1 only
    val cDocs = (21L to 24L).filter(i => perDoc.contains(("C", i)))
    assert(cDocs.length === 2, cDocs)
    cDocs.foreach(i => assert(perDoc(("C", i)) === Seq(1L)))
    // determinism: identical under repartitioning AND under a
    // different block count (two-phase prefix sum ≡ the plain one)
    val again = Sampling
      .materializeMix(docs.repartition(7), "source", "doc_id", "tok",
        alloc, blocks = 1)
      .as[(String, Long, Long)].collect()
    assert(out.sorted.toSeq === again.sorted.toSeq)
  }

  test("ppsSystematic: Σdraws = k per stratum, heavy-item multiplicity, " +
      "weight-proportional, deterministic") {
    import spark.implicits._
    // stratum a: one item holds 60% of the mass → at k=10 it must draw
    // ≥ 5 times (its interval covers ≥ 5 grid points); zero-weight
    // rows must vanish
    val df = ((1L to 8L).map(i => ("a", i, 50L)) ++
      Seq(("a", 9L, 600L), ("a", 10L, 0L)) ++
      (11L to 15L).map(i => ("b", i, 10L)))
      .toDF("s", "id", "w")
    val out = Sampling.ppsSystematic(df, "s", "id", "w", k = 10)
      .select($"s", $"id", $"weight", $"n_draws")
      .as[(String, Long, Long, Long)].collect()
    val byStratum = out.groupBy(_._1)
    assert(byStratum("a").map(_._4).sum === 10L, out.toSeq)
    assert(byStratum("b").map(_._4).sum === 10L, out.toSeq)
    val heavy = out.find(r => r._1 == "a" && r._2 == 9L).get
    assert(heavy._4 >= 5L, s"60% of the mass must draw >= 5 of 10: $heavy")
    assert(!out.exists(_._2 == 10L), "zero-weight rows cannot be drawn")
    // every uniform-weight b item draws exactly k/n = 2 times — the
    // equal-weight degenerate case is round-robin exact
    byStratum("b").foreach(r => assert(r._4 === 2L, r))
    // deterministic under repartitioning
    val out2 = Sampling.ppsSystematic(df.repartition(7), "s", "id", "w", k = 10)
      .select($"s", $"id", $"weight", $"n_draws")
      .as[(String, Long, Long, Long)].collect()
    assert(out.toSet === out2.toSet)
  }

  test("epochWaterfill: hand-computed level per segment, exact-budget hit, " +
      "all-capped overflow case, degenerate rows dropped") {
    import spark.implicits._
    // A: 100 tok cap 3.0; B: 200 tok cap 1.0; C: 700 tok cap 2.0
    // (plus a zero-token and a zero-cap row that can't be allocated)
    val strata = Seq(
      ("A", 100L, 3000000L), ("B", 200L, 1000000L), ("C", 700L, 2000000L),
      ("Z0", 0L, 2000000L), ("Zc", 50L, 0L)).toDF("src", "n", "c")
    def run(b: Long) = Sampling
      .epochWaterfill(strata, "src", "n", "c", b)
      .select($"src", $"epochs_micro", $"alloc_tokens")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    // budget 1000 = exactly one epoch of everything: level t = 1.0
    // lands on B's cap boundary (valid in the SECOND segment: B capped,
    // remTok = 800, t = (1e9 - 2e8)/800 = 1e6)
    val r1000 = run(1000L)
    assert(r1000 === Map("A" -> ((1000000L, 100L)),
      "B" -> ((1000000L, 200L)), "C" -> ((1000000L, 700L))), r1000)
    // budget 1500: t = (1.5e9 - 2e8)/800 = 1 625 000 — B pinned at its
    // cap, A and C repeat at 1.625 epochs; floors make Σ = 1499 ≤ 1500
    val r1500 = run(1500L)
    assert(r1500 === Map("A" -> ((1625000L, 162L)),
      "B" -> ((1000000L, 200L)), "C" -> ((1625000L, 1137L))), r1500)
    assert(r1500.values.map(_._2).sum === 1499L)
    // budget 5000 exceeds every cap (max spend 1900): everything pins
    val r5000 = run(5000L)
    assert(r5000 === Map("A" -> ((3000000L, 300L)),
      "B" -> ((1000000L, 200L)), "C" -> ((2000000L, 1400L))), r5000)
    // zero budget: level 0, zero allocations
    assert(run(0L).values.forall(_ === ((0L, 0L))))
    // LLaMA-scale budgets are in-contract: B·1e6 lives in decimal
    // arithmetic only (a vestigial int64 require used to reject this) —
    // 15T tokens dwarfs every cap, so everything pins
    val huge = run(15000000000000L)
    assert(huge === Map("A" -> ((3000000L, 300L)),
      "B" -> ((1000000L, 200L)), "C" -> ((2000000L, 1400L))), huge)
  }

  test("ppsSystematic: stratum mass past the int64 product bound RAISES " +
      "instead of wrapping") {
    import spark.implicits._
    // byte-weight scale: two 5e17 items at k=10 put __tot·k at 1e19 —
    // past 2^63, where the non-ANSI multiply used to wrap silently and
    // return wrong draws; now the row raises with the operator's name
    val hot = Seq(("a", 1L, 500000000000000000L),
      ("a", 2L, 500000000000000000L)).toDF("s", "id", "w")
    val e = intercept[Exception] {
      Sampling.ppsSystematic(hot, "s", "id", "w", k = 10).collect()
    }
    assert(e.getMessage.contains("ppsSystematic"), e.getMessage)
    // just inside the bound the draw is exact: W = 8e17 < 2^63/(k+1)
    val ok = Seq(("a", 1L, 400000000000000000L),
      ("a", 2L, 400000000000000000L)).toDF("s", "id", "w")
    val draws = Sampling.ppsSystematic(ok, "s", "id", "w", k = 10)
      .select($"n_draws").as[Long].collect()
    assert(draws.sum === 10L && draws.forall(_ === 5L), draws.toSeq)
    // k = Int.MaxValue: the guard threshold must be computed in LONG
    // arithmetic (k + 1 wrapped to Int.MinValue and made it negative,
    // raising on every stratum) — a tiny-mass stratum is safe here
    val big = Seq(("a", 1L, 1L), ("a", 2L, 1L)).toDF("s", "id", "w")
    val bigDraws = Sampling
      .ppsSystematic(big, "s", "id", "w", k = Int.MaxValue)
      .select($"n_draws").as[Long].collect()
    assert(bigDraws.sum === Int.MaxValue.toLong, bigDraws.toSeq)
  }
}
