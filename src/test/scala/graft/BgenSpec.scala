package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.BgenReader
import graft.sources.BgenReader.BgenEnc

/** BGEN v1.2 reader (q242's format surface): byte-exact round trips
  * through the encoder, hand-computed fixed-6-decimal GP strings,
  * missing/multiallelic classes, offset-walk splittability, and the
  * contract that a BGEN reads ROW-IDENTICAL to its VCF/GP twin
  * through the dosage operators (the r15 verdict's Missing #2 done
  * criterion).
  */
class BgenSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val tmp = java.nio.file.Files.createTempDirectory("graft-bgen")

  private val samples = Seq("sA", "sB", "sC")

  // probs are the STORED (nGts−1) raw 8-bit values; last is implicit
  private def fixtureVariants = Seq(
    BgenEnc("v1", "rs1", "1", 1000L, Seq("A", "G"),
      Seq(Array(255L, 0L), Array(0L, 255L), Array(51L, 102L))),
    // sB missing at v2
    BgenEnc("v2", "rs2", "1", 2000L, Seq("C", "T"),
      Seq(Array(0L, 128L), null, Array(255L, 0L))),
    // multiallelic K = 3: 6 genotypes, 5 stored values
    BgenEnc("v3", "rs3", "2", 3000L, Seq("A", "C", "T"),
      Seq(Array(255L, 0L, 0L, 0L, 0L), Array(0L, 255L, 0L, 0L, 0L),
        Array(0L, 0L, 0L, 0L, 0L))))

  private def writeFixture(name: String, zlib: Boolean): String = {
    val f = tmp.resolve(name).toFile
    val out = new java.io.FileOutputStream(f)
    try BgenReader.writeBgen(out, samples, fixtureVariants.iterator,
      bBits = 8, zlib = zlib)
    finally out.close()
    f.getAbsolutePath
  }

  test("round trip: header, sample ids, hand-computed exact " +
      "fixed-6-decimal GP strings, the missing sample as './.' with " +
      "NULL GP, multiallelic K=3 flagged — zlib AND uncompressed") {
    for (zlib <- Seq(true, false)) {
      val path = writeFixture(s"rt-$zlib.bgen", zlib)
      val df = BgenReader.readBgen(spark, path)
      val rows = df.select("chrom", "pos", "rsid", "ref", "alt",
          "multiallele", "sample_id", "gt", "GP")
        .as[(String, Int, String, String, String, Int, String, String,
          Option[String])]
        .collect().map(r => (r._3, r._7) -> r).toMap
      assert(rows.size === 9)
      // v1: 255/255 = 1 exactly; 51/255 = .2, 102/255 = .4
      assert(rows(("rs1", "sA"))._9 ===
        Some("1.000000,0.000000,0.000000"))
      assert(rows(("rs1", "sB"))._9 ===
        Some("0.000000,1.000000,0.000000"))
      assert(rows(("rs1", "sC"))._9 ===
        Some("0.200000,0.400000,0.400000"))
      // v2 sA: 128/255 floors to 0.501960; last = 127/255 = 0.498039
      assert(rows(("rs2", "sA"))._9 ===
        Some("0.000000,0.501960,0.498039"))
      assert(rows(("rs2", "sB"))._9 === None) // missing bit
      assert(rows(("rs2", "sB"))._8 === "./.")
      assert(rows(("rs2", "sC"))._9 ===
        Some("1.000000,0.000000,0.000000"))
      // v3: K = 3 → multiallele = 1, alt joined, 6-entry GP
      assert(rows(("rs3", "sA"))._6 === 1)
      assert(rows(("rs3", "sA"))._5 === "C,T")
      assert(rows(("rs3", "sA"))._9 === Some(
        "1.000000,0.000000,0.000000,0.000000,0.000000,0.000000"))
      assert(rows(("rs3", "sC"))._9 === Some(
        "0.000000,0.000000,0.000000,0.000000,0.000000,1.000000"))
    }
  }

  test("splittability: the offset walk assigns variant-block ranges " +
      "to tasks — splits > 1 plans multiple partitions and the row " +
      "multiset is identical") {
    val path = writeFixture("split.bgen", zlib = true)
    val one = BgenReader.readBgen(spark, path, splits = 1)
    val three = BgenReader.readBgen(spark, path, splits = 3)
    assert(three.rdd.getNumPartitions === 3)
    assert(three.collect().toSet === one.collect().toSet)
    assert(one.count() === 9)
  }

  test("VCF/GP twin: the BGEN frame runs dosageAf and the dosage " +
      "polygenicScore ROW-IDENTICAL to a VCF-shaped ann frame " +
      "carrying the same GP strings — the operators cannot tell the " +
      "formats apart") {
    import graft.operators.VariantQc
    val path = writeFixture("twin.bgen", zlib = true)
    val bgen = BgenReader.readBgen(spark, path)
    // the VCF twin: what annotate(formatKeys = GP) yields from a VCF
    // whose GP strings match the BGEN decode exactly
    val twin = bgen.select("chrom", "pos", "ref", "alt", "multiallele",
      "sample_id", "gt", "gt1", "gt2", "GP")
    val key = Seq("chrom", "pos", "ref", "alt")
    val afB = VariantQc.dosageAf(bgen).orderBy(key.map(col): _*).collect()
    val afT = VariantQc.dosageAf(twin).orderBy(key.map(col): _*).collect()
    assert(afB.toSeq === afT.toSeq)
    // hand-check one site: v1 dosages 0, 1·1e6 (het), 0.4+2·0.4 →
    // 1.2e6; AF = (0 + 1e6 + 1.2e6) / (2·3)
    val v1 = afB.find(_.getAs[Int]("pos") == 1000).get
    assert(v1.getAs[Long]("dose_sum_micro") === 2200000L)
    assert(v1.getAs[Long]("af_micro") === 2200000L / 6L)
    val weights = Seq(("1", 1000, "A", "G", 500000L),
      ("1", 2000, "C", "T", 1000000L))
      .toDF("chrom", "pos", "ref", "alt", "beta_micro")
    val psB = VariantQc.polygenicScore(bgen, weights,
      dosageCol = Some("DS")).orderBy("sample_id").collect()
    val psT = VariantQc.polygenicScore(twin, weights,
      dosageCol = Some("DS")).orderBy("sample_id").collect()
    assert(psB.toSeq === psT.toSeq)
    // sA: v1 GP hom-ref → 0; v2 GP het .501960 + 2·.498039 →
    // 1498038 micro; score = 0·.5 + 1498038·1.0 pico-aggregated
    val sA = psB.find(_.getAs[String]("sample_id") == "sA").get
    assert(sA.getAs[Long]("dose_sum_micro") === 1498038L)
    assert(sA.getAs[Long]("score_pico") === 1498038L * 1000000L)
  }

  test("format(\"bgen\") DSv2: load() row-identical to the library " +
      "reader, chrom/pos pushdown reaches the scan (block-level, " +
      "pre-decode), sites-shaped projections skip the payload, tiny " +
      "maxPartitionBytes splits by block offsets") {
    val path = writeFixture("dsv2.bgen", zlib = true)
    val lib = BgenReader.readBgen(spark, path)
    val dsv2 = spark.read.format("bgen").load(path)
    assert(dsv2.collect().toSet === lib.collect().toSet)
    // pushdown: the pushed filters appear in the scan description and
    // filtering is exact at block level
    val filtered = spark.read.format("bgen").load(path)
      .filter(col("chrom") === "1" && col("pos") === 2000)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("pushed=") && plan.contains("chrom"),
      s"chrom/pos not pushed:\n$plan")
    assert(filtered.count() === 3) // v2's 3 samples
    assert(filtered.select("rsid").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("rs2"))
    // sites-shaped projection (no GP/gt): payload never decoded —
    // observable as correct variant rows without genotype columns
    val sites = spark.read.format("bgen").load(path)
      .select("chrom", "pos", "ref", "alt").distinct()
    assert(sites.count() === 3)
    // splittability: 1-byte budget → one partition per block
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1")
    try {
      val split = spark.read.format("bgen").load(path)
      assert(split.rdd.getNumPartitions === 3,
        s"expected one partition per variant block, got " +
          s"${split.rdd.getNumPartitions}")
      assert(split.count() === 9)
    } finally
      spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")
    // contradictory chrom equalities plan ZERO tasks
    val none = spark.read.format("bgen").load(path)
      .filter(col("chrom") === "1" && col("chrom") === "2")
    assert(none.rdd.getNumPartitions === 0)
  }

  test("loud failures outside the supported surface: phased data and " +
      "non-diploid ploidy refuse instead of mis-decoding") {
    // hand-patch a phased flag into a valid single-variant payload
    val path = writeFixture("phased.bgen", zlib = false)
    val bytesAll = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path))
    // uncompressed layout: find the genotype block of v1 and flip the
    // phased byte (offset: after N(4) + K(2) + minP(1) + maxP(1) +
    // N ploidy bytes)
    val df = BgenReader.readBgen(spark, path) // sanity: readable
    assert(df.count() === 9)
    val geno = new Array[Byte](bytesAll.length)
    System.arraycopy(bytesAll, 0, geno, 0, bytesAll.length)
    // decodeGenotypes directly: craft a phased payload
    val g = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    g.putInt(1).putShort(2.toShort).put(2.toByte).put(2.toByte)
      .put(2.toByte).put(1.toByte) // phased = 1
      .put(8.toByte).put(0.toByte).put(0.toByte)
    val e1 = intercept[IllegalArgumentException] {
      BgenReader.decodeGenotypes(g.array(), 2, 1L)
    }
    assert(e1.getMessage.contains("phased"))
    val g2 = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    g2.putInt(1).putShort(2.toShort).put(1.toByte).put(1.toByte)
    val e2 = intercept[IllegalArgumentException] {
      BgenReader.decodeGenotypes(g2.array(), 2, 1L)
    }
    assert(e2.getMessage.contains("diploid"))
  }
}
