package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Privacy

class PrivacySpec extends AnyFunSuite with SparkSpec {

  // quasi = (city, ageb); ladder: widen the age band, then mask city
  private val ladder = Seq(
    Map("ageb" -> expr("ageb div 10")),
    Map("city" -> lit("*")))

  private def fixture = {
    import spark.implicits._
    (Seq.fill(3)(("nyc", 23L)) ++          // safe at level 0
      Seq(("nyc", 24L), ("nyc", 24L), ("nyc", 27L)) ++ // fuse at level 1 (band 2)
      Seq(("la", 31L), ("sf", 35L), ("chi", 33L)) ++   // fuse at level 2 (*, 3)
      Seq(("mia", 99L)))                   // unreachable → suppressed
      .zipWithIndex.map { case ((c, a), i) => (i.toLong, c, a) }
      .toDF("id", "city", "ageb")
  }

  test("local recoding: rows climb only as far as k requires; the " +
      "unreachable row is suppressed") {
    import spark.implicits._
    val out = Privacy.kAnonymize(fixture, Seq("city", "ageb"), ladder, k = 3)
      .select($"id", $"city", $"ageb", $"anon_level", $"suppressed")
      .collect()
      .map(r => r.getLong(0) -> ((Option(r.getString(1)).orNull,
        if (r.isNullAt(2)) -1L else r.getLong(2),
        r.getInt(3), r.getBoolean(4))))
      .toMap
    // level 0: the 3×(nyc,23) class is already safe
    (0L to 2L).foreach(i => assert(out(i) === (("nyc", 23L, 0, false))))
    // level 1: (nyc,24)×2 + (nyc,27) fuse into band (nyc, 2)
    (3L to 5L).foreach(i => assert(out(i) === (("nyc", 2L, 1, false))))
    // level 2: three singleton cities fuse into (*, 3)
    (6L to 8L).foreach(i => assert(out(i) === (("*", 3L, 2, false))))
    // suppressed: (mia, 99) reaches (*, 9) alone — quasi nulled
    assert(out(9L) === ((null, -1L, 2, true)))
  }

  test("the k-anonymity invariant holds: every surviving (level, quasi) " +
      "class has >= k rows; deterministic under repartitioning") {
    val out = Privacy.kAnonymize(
      fixture.repartition(7), Seq("city", "ageb"), ladder, k = 3)
    val classes = out.filter(!col("suppressed"))
      .groupBy("anon_level", "city", "ageb").count().collect()
    assert(classes.nonEmpty)
    classes.foreach(r => assert(r.getLong(3) >= 3L, r))
    val a = Privacy.kAnonymize(fixture, Seq("city", "ageb"), ladder, k = 3)
      .select("id", "city", "ageb", "anon_level", "suppressed")
      .collect().map(_.toString).sorted.toSeq
    val b = out.select("id", "city", "ageb", "anon_level", "suppressed")
      .collect().map(_.toString).sorted.toSeq
    assert(a === b)
  }

  test("l-diversity: a k-satisfying but homogeneous class still promotes; " +
      "a class that stays homogeneous after the ladder is suppressed") {
    import spark.implicits._
    val rows = (
      Seq.fill(3)(("nyc", "flu")) ++           // c=3 ok, d=1 < 2 → promote
      Seq(("la", "flu"), ("la", "cold")) ++    // c=2, d=2 → safe at L0
      Seq(("sf", "flu"), ("sf", "cold"), ("sf", "flu")) ++ // safe at L0
      Seq(("mia", "flu"), ("mia", "flu")) ++   // d=1 → promote
      Seq(("bos", "cold")))                    // c=1 → promote
      .zipWithIndex.map { case ((c, s), i) => (i.toLong, c, s) }
      .toDF("id", "city", "diag")
    val out = Privacy.kAnonymize(rows, Seq("city"),
        Seq(Map("city" -> lit("*"))), k = 2,
        sensitive = Some("diag"), l = 2)
      .select($"id", $"city", $"anon_level", $"suppressed")
      .collect()
      .map(r => r.getLong(0) ->
        ((Option(r.getString(1)).orNull, r.getInt(2), r.getBoolean(3))))
      .toMap
    // the promoted rows fuse at level 1 into (*) with {flu, cold}: pass
    Seq(0L, 1L, 2L, 8L, 9L, 10L).foreach(i =>
      assert(out(i) === (("*", 1, false)), s"id $i: ${out(i)}"))
    Seq(3L, 4L).foreach(i => assert(out(i) === (("la", 0, false))))
    Seq(5L, 6L, 7L).foreach(i => assert(out(i) === (("sf", 0, false))))
    // same data WITHOUT bos: the level-1 class is all-flu → suppressed
    val out2 = Privacy.kAnonymize(rows.filter($"id" =!= 10L), Seq("city"),
        Seq(Map("city" -> lit("*"))), k = 2,
        sensitive = Some("diag"), l = 2)
      .select($"id", $"city", $"suppressed").collect()
      .map(r => r.getLong(0) -> ((Option(r.getString(1)).orNull,
        r.getBoolean(2)))).toMap
    Seq(0L, 1L, 2L, 8L, 9L).foreach(i => assert(out2(i) === ((null, true))))
  }

  test("plan: each rung's count and join share the class-key exchange " +
      "(ReusedExchange) — the corpus is not re-scanned per reference") {
    val out = Privacy.kAnonymize(
      fixture.repartition(4), Seq("city", "ageb"), ladder, k = 3)
    out.collect()
    val p = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // cur feeds both the per-class count agg and the join-back on the
    // SAME key per rung: the shuffle must be computed once and reused
    assert(p.contains("ReusedExchange"), s"rung exchange not shared:\n$p")
  }

  test("guards: k >= 1, quasi non-empty, ladder only rewrites quasi") {
    intercept[IllegalArgumentException] {
      Privacy.kAnonymize(fixture, Seq("city"), Nil, k = 0)
    }
    intercept[IllegalArgumentException] {
      Privacy.kAnonymize(fixture, Nil, Nil, k = 3)
    }
    intercept[IllegalArgumentException] {
      Privacy.kAnonymize(fixture, Seq("city"),
        Seq(Map("ageb" -> lit(0L))), k = 3)
    }
    // l > 1 needs a sensitive column, and it must not be quasi
    intercept[IllegalArgumentException] {
      Privacy.kAnonymize(fixture, Seq("city"), Nil, k = 3, l = 2)
    }
    intercept[IllegalArgumentException] {
      Privacy.kAnonymize(fixture, Seq("city"), Nil, k = 3,
        sensitive = Some("city"), l = 2)
    }
  }

  // ---- dpCountRelease ----

  /** Independent plain-Scala spelling of one geometric leg — the same
    * arithmetic the operator builds in Catalyst. */
  private def geomLeg(rk: Long, legIx: Long, mult: Long, epsMicro: Long,
      seed: Long = 0L): Long = {
    val p = 1000000007L
    val x0 = (rk * 2 + legIx + math.floorMod(seed, p)) % p
    val m1 = x0 * 2654435761L % p
    val m2 = m1 * mult % p
    val u = (m2 + 1).toDouble / 1000000008.0
    val lnuMicro = math.floor(math.log(u) * 1000000.0).toLong
    math.floor(lnuMicro.toDouble / (-epsMicro).toDouble).toLong
  }

  private def dpFixture = {
    import spark.implicits._
    (Seq.fill(12)("a") ++ Seq.fill(3)("b") ++ Seq.fill(7)("c") ++
      Seq.fill(1)("d") ++ Seq.fill(25)("e"))
      .zipWithIndex.map { case (g, i) => (i.toLong, g) }
      .toDF("id", "grp")
  }

  test("dpCountRelease: noisy counts equal the hand-replayed discrete " +
      "Laplace draw per cell rank, clamped at zero") {
    import spark.implicits._
    val eps = 200000L
    val out = Privacy.dpCountRelease(dpFixture, Seq("grp"), eps)
      .orderBy("grp").as[(String, Long)].collect()
    val exact = Map("a" -> 12L, "b" -> 3L, "c" -> 7L, "d" -> 1L, "e" -> 25L)
    val expected = exact.keys.toSeq.sorted.zipWithIndex.map {
      case (g, i) =>
        val rk = i + 1L
        val noise = geomLeg(rk, 0L, Privacy.DpMult1, eps) -
          geomLeg(rk, 1L, Privacy.DpMult2, eps)
        g -> math.max(exact(g) + noise, 0L)
    }
    assert(out.toSeq === expected)
    // ε = 0.2 noise (std ≈ 7) must actually perturb SOME cell — a
    // no-op noise path would pass a hash gate vacuously
    assert(out.exists { case (g, n) => n != exact(g) },
      s"no cell perturbed: ${out.toSeq}")
  }

  test("dpCountRelease: a secret seed changes the draw (same seed → " +
      "same release, different seed → different noise), replayable") {
    import spark.implicits._
    val eps = 200000L
    def release(seed: Long) =
      Privacy.dpCountRelease(dpFixture, Seq("grp"), eps, seed)
        .orderBy("grp").as[(String, Long)].collect().toSeq
    val s1a = release(123456789L)
    val s1b = release(123456789L)
    val s2 = release(987654321L)
    assert(s1a === s1b)
    assert(s1a !== s2, "two seeds produced identical noise")
    // seeded draw replays exactly
    val exact = Map("a" -> 12L, "b" -> 3L, "c" -> 7L, "d" -> 1L, "e" -> 25L)
    val expected = exact.keys.toSeq.sorted.zipWithIndex.map { case (g, i) =>
      val rk = i + 1L
      val noise = geomLeg(rk, 0L, Privacy.DpMult1, eps, 123456789L) -
        geomLeg(rk, 1L, Privacy.DpMult2, eps, 123456789L)
      g -> math.max(exact(g) + noise, 0L)
    }
    assert(s1a === expected)
  }

  test("dpCountRelease: deterministic under repartitioning, and never " +
      "negative") {
    import spark.implicits._
    val a = Privacy.dpCountRelease(dpFixture, Seq("grp"), 100000L)
      .orderBy("grp").as[(String, Long)].collect().toSeq
    val b = Privacy.dpCountRelease(dpFixture.repartition(7), Seq("grp"),
      100000L).orderBy("grp").as[(String, Long)].collect().toSeq
    assert(a === b)
    assert(a.forall(_._2 >= 0L))
  }

  test("dpCountRelease guards: positive epsilon, non-empty keys") {
    intercept[IllegalArgumentException] {
      Privacy.dpCountRelease(dpFixture, Seq("grp"), 0L)
    }
    intercept[IllegalArgumentException] {
      Privacy.dpCountRelease(dpFixture, Nil, 100000L)
    }
  }
}
