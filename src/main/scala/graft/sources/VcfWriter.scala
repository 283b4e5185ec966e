package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.VcfReader.VcfMetadata

/** VCF emission — the sink twin of [[VcfReader]] (the reference is
  * read-only; its users export via pandas `to_csv`, which this replaces
  * with a distributed path).
  *
  * The distributed part is [[toVcfLines]]: a NARROW projection from the
  * wide graft schema to tab-separated data lines — it runs in the scan
  * stage at I/O speed and text-writes as parallel shards. The header is
  * driver-side metadata ([[headerLines]]); a valid single VCF is
  * `header + cat(shards)` (the bgzip/bcftools convention for sharded
  * emission). [[writeSharded]] lays both down under one directory.
  */
object VcfWriter {

  /** Wide graft rows → `value: STRING` VCF data lines; genotype calls
    * in `samples` order, absent samples emitted as the missing call.
    */
  def toVcfLines(df: DataFrame, samples: Seq[String]): DataFrame = {
    val fixed = Seq("chrom", "pos", "id", "ref", "alt", "qual", "filter",
      "info", "format").map(c => coalesce(col(c).cast("string"), lit(".")))
    val calls = samples.map(sid =>
      coalesce(element_at(col("genotypes"), sid), lit("./.")))
    df.select(concat_ws("\t", fixed ++ calls: _*).as("value"))
  }

  /** `##key=value` lines + the `#CHROM…` column line from parsed
    * metadata — byte-faithful to what [[VcfReader.fromHeaderLines]] read.
    */
  def headerLines(meta: VcfMetadata): Seq[String] =
    meta.headerKv.map { case (k, v) => s"##$k=$v" } :+
      meta.columns.mkString("\t")

  /** Write `outDir/header.vcf` (driver-side, tiny) plus
    * `outDir/shards/part-*` data shards (distributed text write).
    * Concatenating header + shards yields one valid VCF.
    */
  def writeSharded(df: DataFrame, meta: VcfMetadata, outDir: String): Unit = {
    toVcfLines(df, meta.samples).write.mode("overwrite").text(s"$outDir/shards")
    Files.createDirectories(Paths.get(outDir))
    Files.write(Paths.get(outDir, "header.vcf"),
      (headerLines(meta).mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
  }
}
