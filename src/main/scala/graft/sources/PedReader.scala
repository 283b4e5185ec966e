package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** PLINK pedigree-file reader (`.ped` first-6-columns / `.fam` —
  * www.cog-genomics.org/plink/1.9/formats#fam): the r16 verdict's
  * Missing #4 — the trio family (phaseByTransmission, Mendel q80,
  * de novo q196) takes explicit (child, mother, father) sample
  * columns, but real cohorts ship the pedigree as a `.ped`/`.fam`
  * sidecar. Columns: `FID IID PAT MAT SEX PHENO`, whitespace
  * separated, `0` = missing parent / unknown sex.
  *
  * Driver-side read (the [[graft.operators.Liftover.readChain]]
  * pattern): a pedigree is dimension-sized — thousands of lines for
  * the largest cohorts — and the deliverable is the trio list the
  * per-sample operators are parameterized with. Malformed lines
  * (< 6 fields, SEX outside {0,1,2}, duplicate (FID, IID), an
  * individual listed as its own parent) fail loudly.
  */
object PedReader {

  final case class PedEntry(familyId: String, sampleId: String,
      fatherId: Option[String], motherId: Option[String],
      sex: Int, phenotype: String)

  /** A complete, genotype-able trio: child plus BOTH parents present
    * as individuals in the file — the unit the trio operators take
    * as (child, mother, father) sample columns. */
  final case class Trio(child: String, mother: String, father: String)

  /** Parse the file into entries (file order). */
  def readEntries(spark: SparkSession, path: String): Seq[PedEntry] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(
      fs.open(p), java.nio.charset.StandardCharsets.UTF_8))
    try {
      val out = Seq.newBuilder[PedEntry]
      val seen = scala.collection.mutable.HashSet.empty[(String, String)]
      var line = in.readLine()
      var lineNo = 0
      while (line != null) {
        lineNo += 1
        val t = line.trim
        if (t.nonEmpty && !t.startsWith("#")) {
          val f = t.split("\\s+")
          require(f.length >= 6,
            s"$path:$lineNo: pedigree line needs >= 6 fields " +
              s"(FID IID PAT MAT SEX PHENO), got ${f.length}")
          val sex = f(4) match {
            case "0" | "1" | "2" => f(4).toInt
            case other => throw new IllegalArgumentException(
              s"$path:$lineNo: SEX must be 0/1/2, got '$other'")
          }
          require(f(1) != "0",
            s"$path:$lineNo: IID must not be '0'")
          require(f(2) != f(1) && f(3) != f(1),
            s"$path:$lineNo: individual ${f(1)} listed as its own parent")
          val key = (f(0), f(1))
          require(seen.add(key),
            s"$path:$lineNo: duplicate individual (FID=${f(0)}, " +
              s"IID=${f(1)})")
          out += PedEntry(f(0), f(1),
            if (f(2) == "0") None else Some(f(2)),
            if (f(3) == "0") None else Some(f(3)),
            sex, f(5))
        }
        line = in.readLine()
      }
      val entries = out.result()
      require(entries.nonEmpty, s"$path: empty pedigree")
      entries
    } finally in.close()
  }

  /** The pedigree as a DataFrame (dimension-sized — broadcasts). */
  def readPed(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    readEntries(spark, path)
      .map(e => (e.familyId, e.sampleId, e.fatherId.orNull,
        e.motherId.orNull, e.sex, e.phenotype))
      .toDF("family_id", "sample_id", "father_id", "mother_id",
        "sex", "phenotype")
  }

  /** Complete trios in child file order: both parent ids present AND
    * listed as individuals in the same family (a parent referenced
    * but not genotyped in the file cannot anchor a trio analysis).
    * Consistency is enforced loudly: a named father of SEX 2 or a
    * named mother of SEX 1 is a pedigree error, not a trio. */
  def trios(spark: SparkSession, path: String): Seq[Trio] = {
    val entries = readEntries(spark, path)
    val byId = entries.map(e => (e.familyId, e.sampleId) -> e).toMap
    entries.flatMap { e =>
      (e.fatherId, e.motherId) match {
        case (Some(fa), Some(mo)) =>
          (byId.get((e.familyId, fa)), byId.get((e.familyId, mo))) match {
            case (Some(faE), Some(moE)) =>
              require(faE.sex != 2,
                s"pedigree error: father $fa of ${e.sampleId} has SEX 2")
              require(moE.sex != 1,
                s"pedigree error: mother $mo of ${e.sampleId} has SEX 1")
              Some(Trio(e.sampleId, mo, fa))
            case _ => None
          }
        case _ => None
      }
    }
  }
}
