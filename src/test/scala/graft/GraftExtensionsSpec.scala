package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VariantAnnotator
import graft.sources.VcfReader

class GraftExtensionsSpec extends AnyFunSuite with SparkSpec {

  test("SQL users can call vartype and rolling_hash via extensions") {
    // register on the already-running shared session — the builder-time
    // path (withExtensions / spark.sql.extensions) runs the same
    // injections at session construction
    val s2 = spark
    GraftExtensions.register(s2)
    val r = s2.sql(
      "SELECT vartype('AC', 'A') AS vt, rolling_hash('AB') AS rh").head()
    assert(r.getString(0) === "del")
    assert(r.getLong(1) === 2081L)
    val agg = s2.sql(
      """SELECT vartype(r, a) AS vt, count(*) AS n FROM VALUES
         ('A','G'), ('A','A'), ('TTC','TAG'), ('T','TTG') AS t(r, a)
         GROUP BY 1 ORDER BY 1""").collect()
      .map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(agg === Seq(("ins", 1L), ("mnp", 1L), ("ref", 1L), ("snp", 1L)))
  }

  test("SQL users get the CDC chunker, with loud non-literal params") {
    val s2 = spark
    GraftExtensions.register(s2)
    // single chunk for a short string: just rolling_hash of the whole
    val r = s2.sql(
      "SELECT cdc_chunk_hashes('AB', 8, 16) AS c, rolling_hash('AB') AS h").head()
    assert(r.getSeq[Long](0) === Seq(r.getLong(1)))
    val err = intercept[Exception](
      s2.sql("SELECT cdc_chunk_hashes('AB', length('AB'), 16)").collect())
    assert(err.getMessage.contains("integer literal"), err.getMessage)
  }

  test("SQL users get the vector kernels too (vec_dot/l2sq/cosine)") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(a, b) AS d, vec_l2sq(a, b) AS l, vec_cosine(a, a) AS c
         FROM VALUES (array(1.0D, 2.0D), array(3.0D, 4.0D)) AS t(a, b)""").head()
    assert(r.getDouble(0) === 11.0)
    assert(r.getDouble(1) === 8.0)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("unstackBySample pivots the long frame back to wide (notebook parity)") {
    val ann = VariantAnnotator.annotate(
      VcfReader.read(spark, VcfFixture.write().toString),
      VariantAnnotator.Options(dropHomRef = false, formatKeys = Some(Seq("GT"))))
    val wideAgain = VariantAnnotator.unstackBySample(
      ann, "zygosity", samples = Some(Seq("NA1", "NA2")))
    assert(wideAgain.columns.toSeq === Seq("chrom", "pos", "ref", "alt", "NA1", "NA2"))
    val r400 = wideAgain.filter(wideAgain("pos") === 400).head()
    assert(r400.getString(4) === "het-alt") // NA1 1/2
    assert(r400.getString(5) === "hom-alt") // NA2 2|2
  }
}
