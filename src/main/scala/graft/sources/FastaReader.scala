package graft.sources

import java.io.{BufferedInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.expressions.Genome

/** Indexed-FASTA reader — the missing front door of every
  * genome-dependent operator ([[graft.operators.Liftover]] REF
  * validation, [[graft.operators.VariantNorm.leftAlign]],
  * [[graft.expressions.GenomeSliceExpr]]): real users lift GRCh37→38
  * against a reference FASTA + the `samtools faidx` `.fai` sidecar on
  * day one; until now the genome arrived as a hand-built
  * `Map[String, String]`.
  *
  * `.fai` format (htslib faidx, one line per contig):
  * `NAME  LENGTH  OFFSET  LINEBASES  LINEWIDTH` — LENGTH in bases,
  * OFFSET the byte position of the contig's first sequence byte,
  * LINEBASES the bases per sequence line, LINEWIDTH the bytes per
  * line including the terminator. Base i (0-based) of a contig lives
  * at byte `OFFSET + (i / LINEBASES) * LINEWIDTH + (i % LINEBASES)` —
  * which is exactly how [[readContig]] slices without parsing the
  * rest of the file.
  *
  * Reads are DRIVER-side (the [[graft.operators.Liftover.readChain]]
  * pattern): a reference genome is a dimension, not a fact table —
  * the deliverable is [[readGenome]]'s broadcast [[Genome]] handle
  * that ships the sequence once per executor and rides task closures
  * as an id. Malformed `.fai` lines, an index that disagrees with the
  * file (offset not preceded by a header, short contig), and
  * non-FASTA content all fail loudly.
  */
object FastaReader {

  /** One `.fai` line. `lineWidth − lineBases` is the line-terminator
    * width (1 for `\n`, 2 for `\r\n`). */
  final case class FaiEntry(name: String, length: Long, offset: Long,
      lineBases: Int, lineWidth: Int)

  /** Parse a `.fai` index file. */
  def readFai(spark: SparkSession, path: String): Seq[FaiEntry] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(
      fs.open(p), StandardCharsets.UTF_8))
    try {
      val out = Seq.newBuilder[FaiEntry]
      var line = in.readLine()
      var lineNo = 0
      while (line != null) {
        lineNo += 1
        val t = line.trim
        if (t.nonEmpty) {
          val f = t.split("\t", -1)
          require(f.length >= 5,
            s"$path:$lineNo: .fai line needs 5 tab-separated fields, " +
              s"got ${f.length}")
          val e = try FaiEntry(f(0), f(1).toLong, f(2).toLong,
            f(3).toInt, f(4).toInt)
          catch { case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"$path:$lineNo: non-numeric .fai field in '$t'") }
          require(e.length >= 0 && e.offset >= 0 && e.lineBases > 0 &&
            e.lineWidth >= e.lineBases,
            s"$path:$lineNo: inconsistent .fai entry $e " +
              "(need lineWidth >= lineBases > 0)")
          out += e
        }
        line = in.readLine()
      }
      val entries = out.result()
      require(entries.nonEmpty, s"$path: empty .fai index")
      require(entries.map(_.name).distinct.length == entries.length,
        s"$path: duplicate contig names in .fai")
      entries
    } finally in.close()
  }

  /** Build the `.fai` entries by scanning a FASTA — the
    * `samtools faidx` computation, used when no sidecar exists and by
    * the spec to pin that [[readFai]] and the scan agree. Enforces
    * faidx's own constraint: every sequence line of a contig except
    * the last must have the same length (an irregular body makes the
    * offset arithmetic undefined — htslib errors too). */
  def buildFai(spark: SparkSession, faPath: String): Seq[FaiEntry] = {
    val p = new Path(faPath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = new BufferedInputStream(fs.open(p), 1 << 16)
    try {
      var pos = 0L // bytes consumed so far == index of the next byte
      def rd(): Int = { val c = in.read(); if (c >= 0) pos += 1; c }
      val out = Seq.newBuilder[FaiEntry]
      var b = rd()
      require(b == '>',
        s"$faPath: not FASTA (first byte '${if (b < 0) "EOF" else b.toChar}')")
      while (b == '>') {
        // header line: name = up to first whitespace
        val hdr = new java.lang.StringBuilder()
        b = rd()
        while (b >= 0 && b != '\n') { hdr.append(b.toChar); b = rd() }
        require(b == '\n', s"$faPath: EOF inside a FASTA header")
        val name = hdr.toString.stripSuffix("\r").takeWhile(c =>
          c != ' ' && c != '\t')
        require(name.nonEmpty, s"$faPath: empty contig name at byte $pos")
        val offset = pos // first sequence byte
        var length = 0L
        var lineBases = 0
        var lineWidth = 0
        var prevShort = false // a line shorter than lineBases must be LAST
        var done = false
        b = rd()
        while (!done) {
          if (b == '>' || b < 0) done = true
          else if (b == '\n' || b == '\r') {
            // blank line ends the body; skip blanks to the next record
            while (b == '\n' || b == '\r') b = rd()
            done = true
          } else {
            var nBases = 0
            var nBytes = 0
            while (b >= 0 && b != '\n') {
              require(b != '>',
                s"$faPath: '>' inside a sequence line of contig $name")
              if (b != '\r') nBases += 1
              nBytes += 1
              b = rd()
            }
            if (b == '\n') { nBytes += 1; b = rd() }
            require(!prevShort,
              s"$faPath: contig $name has irregular line lengths — " +
                "faidx offset arithmetic is undefined; reflow the FASTA")
            if (lineBases == 0) { lineBases = nBases; lineWidth = nBytes }
            else if (nBases != lineBases) {
              require(nBases < lineBases,
                s"$faPath: contig $name line of $nBases bases after " +
                  s"$lineBases-base lines — irregular, reflow the FASTA")
              prevShort = true
            }
            length += nBases
          }
        }
        require(b == '>' || b < 0,
          s"$faPath: junk between FASTA records after contig $name")
        require(length > 0, s"$faPath: contig $name has no sequence")
        // a sole line with no trailing newline never exercises
        // lineWidth; record the htslib convention anyway
        out += FaiEntry(name, length, offset, lineBases,
          if (lineWidth > lineBases) lineWidth else lineBases + 1)
      }
      val entries = out.result()
      require(entries.map(_.name).distinct.length == entries.length,
        s"$faPath: duplicate contig names")
      entries
    } finally in.close()
  }

  private def readFully(in: InputStream, a: Array[Byte]): Unit = {
    var off = 0
    while (off < a.length) {
      val r = in.read(a, off, a.length - off)
      if (r < 0) throw new EOFException(
        "FASTA shorter than its .fai declares (truncated file?)")
      off += r
    }
  }

  /** Read ONE contig through its `.fai` entry: seek to `offset`, read
    * the exact byte span the line geometry implies, strip terminators.
    * The whole-contig form of htslib's `faidx_fetch_seq`. */
  def readContig(spark: SparkSession, faPath: String,
      e: FaiEntry): String = {
    val p = new Path(faPath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    try {
      in.seek(e.offset)
      if (e.length == 0) return ""
      val lastBase = e.length - 1
      val spanBytes = (lastBase / e.lineBases) * e.lineWidth +
        (lastBase % e.lineBases) + 1
      require(spanBytes <= Int.MaxValue - 8,
        s"contig ${e.name} byte span $spanBytes exceeds a JVM array — " +
          "read it in windows")
      val buf = new Array[Byte](spanBytes.toInt)
      readFully(new BufferedInputStream(in, 1 << 16), buf)
      val sb = new java.lang.StringBuilder(e.length.toInt)
      var i = 0
      while (i < buf.length) {
        val c = buf(i)
        if (c != '\n' && c != '\r') {
          require(c != '>',
            s"contig ${e.name}: ran into the next record — .fai " +
              "LENGTH/geometry disagrees with the file")
          sb.append(c.toChar)
        }
        i += 1
      }
      require(sb.length == e.length,
        s"contig ${e.name}: decoded ${sb.length} bases, .fai declares " +
          s"${e.length} — index and file disagree")
      sb.toString
    } finally in.close()
  }

  /** The chrom → sequence map: through the sidecar `<path>.fai` when
    * it exists (validated slice reads), else one [[buildFai]] scan
    * then the same slice path — so both roads produce identical maps.
    * `contigs` non-empty restricts to (and requires) those names —
    * the partial-genome path that loads two contigs, not 3 GB. */
  def readFasta(spark: SparkSession, faPath: String,
      contigs: Seq[String] = Nil): Map[String, String] = {
    val p = new Path(faPath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val faiPath = new Path(faPath + ".fai")
    val entries =
      if (fs.exists(faiPath)) readFai(spark, faiPath.toString)
      else buildFai(spark, faPath)
    val wanted =
      if (contigs.isEmpty) entries
      else {
        val byName = entries.map(e => e.name -> e).toMap
        contigs.map(c => byName.getOrElse(c,
          throw new IllegalArgumentException(
            s"$faPath: contig '$c' not in the index (has: " +
              s"${entries.map(_.name).mkString(", ")})")))
      }
    wanted.map(e => e.name -> readContig(spark, faPath, e)).toMap
  }

  /** The deliverable: FASTA → broadcast [[Genome]] handle. The
    * uppercased map ships ONCE per executor (torrent broadcast);
    * every genome-backed expression serializes only the handle. */
  def readGenome(spark: SparkSession, faPath: String,
      contigs: Seq[String] = Nil): Genome = {
    val m = readFasta(spark, faPath, contigs)
    Genome.broadcast(spark, m)
  }
}
