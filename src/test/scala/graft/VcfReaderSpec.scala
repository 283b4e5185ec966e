package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.VcfReader

class VcfReaderSpec extends AnyFunSuite with SparkSpec {

  private lazy val path = VcfFixture.write().toString

  test("metadata parses ##kv header, columns and samples") {
    val m = VcfReader.metadata(spark, path)
    assert(m.headerKv.contains(("fileformat", "VCFv4.2")))
    assert(m.columns.take(5) === Seq("#CHROM", "POS", "ID", "REF", "ALT"))
    assert(m.samples === Seq("NA1", "NA2"))
  }

  test("read produces the wide graft schema with normalized chrom") {
    val df = VcfReader.read(spark, path)
    assert(df.columns.toSeq === Seq("chrom", "pos", "id", "ref", "alt",
      "qual", "filter", "info", "format", "genotypes"))
    assert(df.count() === 7)
    val r1 = df.filter(col("pos") === 100).head()
    assert(r1.getString(0) === "1") // chr1 → 1
    assert(r1.getAs[Map[String, String]]("genotypes") ===
      Map("NA1" -> "0/1:12:3,9", "NA2" -> "1|1:8:0,8"))
  }

  test("sample projection keeps only requested samples") {
    val df = VcfReader.read(spark, path, sampleIds = Some(Seq("NA2")))
    val g = df.filter(col("pos") === 100).head().getAs[Map[String, String]]("genotypes")
    assert(g === Map("NA2" -> "1|1:8:0,8"))
  }

  test("reads the reference repo's real 1000-genomes .vcf.gz") {
    val real =
      "/root/reference/test_data/ALL.chr22.phase3_shapeit2_mvncall_integrated_v4.20130502.genotypes_10k.vcf.gz"
    val meta = VcfReader.metadata(spark, real)
    assert(meta.samples.size > 2000) // 2504-sample multi-sample VCF
    val two = meta.samples.take(2)
    val df = VcfReader.read(spark, real, sampleIds = Some(two))
    val n = df.count()
    assert(n > 9000)
    assert(df.filter(col("chrom") === "22").count() === n)
  }

  test("infoMap parses key=value pairs") {
    val df = VcfReader.read(spark, path).filter(col("pos") === 100)
      .select(VcfReader.infoMap(col("info")).as("m"))
    assert(df.head().getAs[Map[String, String]]("m") ===
      Map("NS" -> "2", "DP" -> "10"))
  }
}
