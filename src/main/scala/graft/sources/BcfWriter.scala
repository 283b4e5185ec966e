package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.v2.{BgzfOutputStream, TabixIndex}

/** BCF2.2 binary VCF WRITING — the encode inverse of [[BcfReader]]
  * (the r13 verdict's Missing #3: read-side parity shipped in r13, a
  * `.bcf`-in → `.bcf`-out pipeline still needed an external bcftools
  * pass). Every byte follows the public VCF 4.2 spec §6 exactly as the
  * reader decodes it — same dictionaries (header text IS the string
  * table, implicit-PASS-first + explicit `IDX=` honored via
  * [[BcfReader.decodeHeaderText]]), same typed-value conventions
  * (smallest int width over the htslib-safe bands, reserved-NaN float
  * missing, count≥15 typed-count escape, GT `(allele+1)<<1|phased`
  * vectors with END-OF-VECTOR ploidy padding), so writeBcf → BcfReader
  * round-trips ROW-IDENTICAL and the encoder reproduces the
  * hand-encoded spec fixture byte-for-byte.
  *
  * Type selection is VALUE-DRIVEN (the typed encoding is
  * self-describing): a vector whose elements are all canonical int32
  * literals encodes integer at the smallest safe width; else all
  * elements whose float parse RENDERS BACK identically (the reader's
  * integral-float rule: 3.0f → "3", so the literal "3" round-trips as
  * float but "3.0" does not) encode float; anything else lands as a
  * verbatim char string. This guarantees decode(encode(x)) == x per
  * field — the property the round-trip spec pins. One canonicalization
  * is inherent to BCF: a call carrying FEWER subfields than FORMAT
  * declares (legal trailing drop in text VCF) decodes back with `.` in
  * the dropped slots — BCF stores a value for every (field, sample)
  * cell, exactly as htslib does.
  *
  * Scale shape: one `.bcf` per partition under `outDir/shards` (each
  * self-contained: header + records), written streaming with O(record)
  * memory; with `index = true` (requires per-partition position-sorted
  * input — use a range repartition upstream, the [[VcfWriter
  * .writeIndexedBgzf]] layout) every shard gets its `.csi` sibling
  * built DURING the emit from [[BgzfOutputStream.voff]] — never read
  * back — in htslib's `.bcf.csi` shape (EMPTY aux: reference ids are
  * the header's contig table), which is exactly what [[BcfReader]]'s
  * split planner and region pruner consume. The engine's own BCF
  * output is therefore splittable and region-prunable with zero
  * external tooling, closing the loop the text path closed in r7.
  */
object BcfWriter {

  import BcfReader.BcfHeader

  // ---- little-endian byte builder ----------------------------------------

  private final class W {
    val out = new ByteArrayOutputStream()
    def u8(v: Int): W = { out.write(v & 0xff); this }
    def i16(v: Int): W = { u8(v); u8(v >> 8) }
    def i32(v: Int): W = { u8(v); u8(v >> 8); u8(v >> 16); u8(v >> 24) }
    def f32bits(bits: Int): W = i32(bits)
    def bytes(b: Array[Byte]): W = { out.write(b); this }
    def result: Array[Byte] = out.toByteArray
  }

  private val FloatMissing = 0x7f800001
  private val FloatEov = 0x7f800002

  /** Descriptor byte; count ≥ 15 uses the typed-count escape. */
  private def descr(w: W, t: Int, n: Int): Unit = {
    if (n < 15) w.u8((n << 4) | t)
    else { w.u8((15 << 4) | t); typedInt(w, n) }
  }

  /** Typed scalar int at the smallest htslib-safe width — the bands
    * leave each width's missing/EOV/reserved sentinels unused.
    */
  private def typedInt(w: W, v: Int): Unit = {
    if (v >= -120 && v <= 127) { w.u8(0x11); w.u8(v) }
    else if (v >= -32000 && v <= 32767) { w.u8(0x12); w.i16(v) }
    else { w.u8(0x13); w.i32(v) }
  }

  private def typedStr(w: W, s: String): Unit = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    descr(w, 7, b.length)
    w.bytes(b)
  }

  /** Width type (1/2/3) for an int vector: smallest band holding every
    * present value (sentinels fit any width by construction).
    */
  private def intWidth(vs: Seq[Int]): Int =
    if (vs.forall(v => v >= -120 && v <= 127)) 1
    else if (vs.forall(v => v >= -32000 && v <= 32767)) 2
    else 3

  private def putInt(w: W, t: Int, v: Int): Unit = t match {
    case 1 => w.u8(v)
    case 2 => w.i16(v)
    case _ => w.i32(v)
  }

  private def intMissing(t: Int): Int = t match {
    case 1 => -128
    case 2 => -32768
    case _ => Int.MinValue
  }
  private def intEov(t: Int): Int = intMissing(t) + 1

  // ---- value typing --------------------------------------------------------

  /** Canonical int32 literal: what the reader renders back identically
    * ("007"/"-0"/"+1" are valid numbers but do not round-trip). */
  private def isCanonicalInt(s: String): Boolean =
    s.matches("0|-?[1-9][0-9]{0,9}") && {
      try { s.toLong; s.toLong >= Int.MinValue && s.toLong <= Int.MaxValue }
      catch { case _: NumberFormatException => false }
    }

  /** Float literal whose parse RENDERS BACK identically under the
    * reader's integral-float rule. */
  private def floatRoundTrips(s: String): Boolean =
    try {
      val f = s.toFloat
      if (f.isNaN || f.isInfinite) false
      else {
        val rendered =
          if (f == math.rint(f) && math.abs(f) < 1e15) f.toLong.toString
          else f.toString
        rendered == s
      }
    } catch { case _: NumberFormatException => false }

  private sealed trait VType
  private case object TInt extends VType
  private case object TFloat extends VType
  private case object TChar extends VType

  /** Joint type decision over every element of a (multi-sample) vector
    * set: all-int → int, else all float-round-trip → float, else char.
    * `.` (missing) is compatible with any type.
    */
  private def decideType(elems: Seq[String]): VType = {
    val present = elems.filter(_ != ".")
    if (present.isEmpty) TInt // all-missing: smallest encoding
    else if (present.forall(isCanonicalInt)) TInt
    else if (present.forall(floatRoundTrips)) TFloat
    else TChar
  }

  // ---- record encoding -------------------------------------------------------

  /** Dictionary index of `key`, failing loudly when the header does
    * not declare it — an undeclared key would decode as garbage. */
  private def dictIdx(hdr: BcfHeader, key: String, what: String): Int = {
    val i = hdr.dict.indexOf(key)
    require(i >= 0, s"$what '$key' is not declared in the BCF header")
    i
  }

  /** Encode one INFO/FORMAT-free value vector (comma-split text). */
  private def encodeInfoValue(w: W, value: String): Unit = {
    val elems = value.split(",", -1).toSeq
    decideType(elems) match {
      case TInt =>
        val present = elems.filter(_ != ".").map(_.toInt)
        val t = intWidth(present)
        descr(w, t, elems.length)
        elems.foreach { e =>
          putInt(w, t, if (e == ".") intMissing(t) else e.toInt)
        }
      case TFloat =>
        descr(w, 5, elems.length)
        elems.foreach { e =>
          w.f32bits(if (e == ".") FloatMissing
            else java.lang.Float.floatToRawIntBits(e.toFloat))
        }
      case TChar =>
        typedStr(w, value) // verbatim, commas and all
    }
  }

  /** One sample's GT text → allele codes `(allele+1)<<1 | phased`
    * (first allele's phase bit 0; missing allele → code 0 + the
    * separator's phase bit).
    */
  private def gtCodes(call: String): Seq[Int] = {
    if (call == "." || call.isEmpty) return Seq(0)
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    var phased = false
    var start = 0
    def emit(endEx: Int): Unit = {
      val a = call.substring(start, endEx)
      val code =
        if (a == ".") 0
        else {
          require(a.matches("[0-9]+"), s"malformed GT allele '$a' in '$call'")
          (a.toInt + 1) << 1
        }
      out += (code | (if (phased && out.nonEmpty) 1 else 0))
    }
    while (i < call.length) {
      val c = call.charAt(i)
      if (c == '/' || c == '|') {
        emit(i)
        phased = c == '|'
        start = i + 1
      }
      i += 1
    }
    emit(call.length)
    out.toSeq
  }

  /** Contig-table index of `chromRaw`, tolerant of the `chr` prefix on
    * either side (the reader NORMALIZES chrom, so a frame read from a
    * `chr2`-contig file carries `2`).
    */
  private[graft] def resolveRid(hdr: BcfHeader, chromRaw: String): Int = {
    val exact = hdr.contigs.indexOf(chromRaw)
    if (exact >= 0) exact
    else {
      val q = chromRaw.stripPrefix("chr")
      val i = hdr.contigs.indexWhere(_.stripPrefix("chr") == q)
      require(i >= 0,
        s"chromosome '$chromRaw' is not in the header's contig table")
      i
    }
  }

  /** Record span in bases: the INFO `END` key when present and numeric
    * (boundary-anchored — the [[graft.operators.Gvcf]] rule) else the
    * REF footprint; what htslib writes as `rlen` and bins the record
    * under, so an external `bcftools view -r` against the engine's
    * `.bcf.csi` hits an inner locus of an END-spanned record (gVCF
    * band, symbolic `<DEL>`) exactly as it would against htslib's.
    */
  private[graft] def spanOf(pos: Int, ref: String, info: String): Int =
    spanOfLen(pos.toLong, ref.length, info)

  /** [[spanOf]] when only the REF length is at hand (the text index
    * builders project `length(ref)` instead of shipping the allele). */
  private[graft] def spanOfLen(pos: Long, refLen: Int, info: String): Int = {
    val m = "(^|;)END=([0-9]+)(;|$)".r.findFirstMatchIn(
      if (info == null) "" else info)
    val footprint = math.max(1, refLen)
    // END is valid up to Int.MaxValue (the tbi→csi escalation supports
    // CSI-scale contigs to 2^31−1); the length guard only rejects
    // values that would overflow the Long parse, and an in-range check
    // does the rest — a 10-digit END ≥ 1e9 must still widen the span
    // or region queries inside the band miss the record.
    m.map(_.group(2)) match {
      case Some(e) if e.length <= 10 && e.toLong >= pos &&
          e.toLong <= Int.MaxValue =>
        math.max(footprint, (e.toLong - pos + 1).toInt)
      case Some(e) if e.length > 10 || (e.length == 10 &&
          e.toLong > Int.MaxValue) =>
        // beyond i32 a BCF rlen/virtual-bin cannot represent the span
        // at all — fail loudly rather than silently bin by footprint
        throw new IllegalArgumentException(
          s"INFO END=$e exceeds Int.MaxValue — unrepresentable in BCF" +
            " rlen / tbi-csi binning")
      case _ => footprint
    }
  }

  /** Encode one whole record (the [[BcfReader]] decode inverse).
    * `calls` are the per-sample genotype strings in `hdr.samples`
    * order; pass Nil with `format = "."` for sites-only rows.
    */
  private[graft] def encodeRecord(
      hdr: BcfHeader,
      chromRaw: String, pos: Int, id: String, ref: String, alt: String,
      qual: String, filter: String, info: String, format: String,
      calls: Seq[String]): Array[Byte] = {
    val rid = resolveRid(hdr, chromRaw)
    val alleles =
      if (alt == "." || alt.isEmpty) Seq(ref)
      else ref +: alt.split(",", -1).toSeq
    val infoEntries =
      if (info == "." || info.isEmpty) Seq.empty[String]
      else info.split(";").toSeq.filter(_.nonEmpty)
    val fmtKeys =
      if (format == "." || format.isEmpty) Seq.empty[String]
      else format.split(":").toSeq
    require(fmtKeys.isEmpty || fmtKeys.head == "GT" ||
      !fmtKeys.contains("GT"),
      s"GT must be FORMAT's first subfield when present: '$format'")

    val sh = new W
    sh.i32(rid).i32(pos - 1).i32(spanOf(pos, ref, info))
    sh.f32bits(if (qual == "." || qual.isEmpty) FloatMissing
      else java.lang.Float.floatToRawIntBits(qual.toFloat))
    sh.i32((alleles.length << 16) | infoEntries.length)
    sh.i32((fmtKeys.length << 24) | hdr.samples.length)
    typedStr(sh, if (id.isEmpty) "." else id)
    alleles.foreach(a => typedStr(sh, a))

    // FILTER: '.' → the zero descriptor; else dict-index int vector
    if (filter == "." || filter.isEmpty) sh.u8(0x00)
    else {
      val ids = filter.split(";").toSeq.map(dictIdx(hdr, _, "FILTER"))
      val t = intWidth(ids)
      descr(sh, t, ids.length)
      ids.foreach(putInt(sh, t, _))
    }

    // INFO: key index + typed value (flag = bare key → zero descriptor)
    infoEntries.foreach { e =>
      val eq = e.indexOf('=')
      if (eq < 0) {
        typedInt(sh, dictIdx(hdr, e, "INFO"))
        sh.u8(0x00)
      } else {
        typedInt(sh, dictIdx(hdr, e.substring(0, eq), "INFO"))
        encodeInfoValue(sh, e.substring(eq + 1))
      }
    }

    // indiv block: per FORMAT key, dict index + one shared-descriptor
    // vector set (n = max per-sample arity, EOV-padded)
    val iv = new W
    fmtKeys.zipWithIndex.foreach { case (key, ki) =>
      typedInt(iv, dictIdx(hdr, key, "FORMAT"))
      val values = calls.map { c =>
        val parts = c.split(":", -1)
        if (ki < parts.length) parts(ki) else "." // trailing drop → '.'
      }
      if (key == "GT") {
        val codes = values.map(gtCodes)
        val n = codes.map(_.length).max
        val t = intWidth(codes.flatten)
        descr(iv, t, n)
        codes.foreach { cs =>
          cs.foreach(putInt(iv, t, _))
          (cs.length until n).foreach(_ => putInt(iv, t, intEov(t)))
        }
      } else {
        val split = values.map(_.split(",", -1).toSeq)
        val n = split.map(_.length).max
        decideType(split.flatten) match {
          case TInt =>
            val present = split.flatten.filter(_ != ".").map(_.toInt)
            val t = intWidth(present)
            descr(iv, t, n)
            split.foreach { es =>
              es.foreach(e =>
                putInt(iv, t, if (e == ".") intMissing(t) else e.toInt))
              (es.length until n).foreach(_ => putInt(iv, t, intEov(t)))
            }
          case TFloat =>
            descr(iv, 5, n)
            split.foreach { es =>
              es.foreach(e => iv.f32bits(if (e == ".") FloatMissing
                else java.lang.Float.floatToRawIntBits(e.toFloat)))
              (es.length until n).foreach(_ => iv.f32bits(FloatEov))
            }
          case TChar =>
            // char vectors are fixed-width per sample set; BCF has no
            // per-sample string padding our reader round-trips, so
            // unequal lengths must fail loudly, not corrupt silently
            val lens = values.map(_.getBytes(StandardCharsets.UTF_8).length)
            require(lens.distinct.length <= 1,
              s"char FORMAT '$key' has unequal per-sample lengths " +
                s"$lens — not representable losslessly")
            descr(iv, 7, lens.headOption.getOrElse(0))
            values.foreach(v =>
              iv.bytes(v.getBytes(StandardCharsets.UTF_8)))
        }
      }
    }

    val shared = sh.result
    val indiv = iv.result
    val frame = new W
    frame.i32(shared.length).i32(indiv.length)
    frame.bytes(shared).bytes(indiv)
    frame.result
  }

  /** The uncompressed BCF prologue: magic + NUL-terminated header text. */
  private[graft] def encodePrologue(headerText: String): Array[Byte] = {
    val w = new W
    w.bytes("BCF".getBytes(StandardCharsets.US_ASCII)).u8(2).u8(2)
    val txt = headerText.getBytes(StandardCharsets.UTF_8)
    w.i32(txt.length + 1).bytes(txt).u8(0)
    w.result
  }

  /** Synthesize a minimal BCF header for `df` when the caller has no
    * original one (a parquet-landed cohort headed back out as `.bcf`):
    * ONE driver-side distinct pass collects the contig set, FILTER
    * vocabulary, INFO keys, FORMAT keys, and sample panel — the
    * [[graft.operators.VariantAnnotator]] discovery-scan posture
    * (convenient; at 100 TB prefer passing the real header, this is a
    * second corpus read). Declarations land as `Number=.`,
    * `Type=String` — legal, and IRRELEVANT to decode fidelity: the
    * typed encoding is value-driven and self-describing, the header
    * only has to carry the dictionary entries. All collected sets are
    * vocabulary-bounded (contigs/keys/samples), never row-scale.
    */
  /** Assemble the minimal synthesized header text from collected
    * vocabulary — the tail of [[synthesizeHeader]], shared with the
    * DSv2 write path's per-shard executor-side synthesis. All inputs
    * are deduped + sorted here so driver- and executor-synthesized
    * headers are deterministic for the same vocabulary.
    */
  private[graft] def composeHeader(
      contigs: Seq[String], filterIdsIn: Seq[String],
      infoIdsIn: Seq[String], fmtIdsIn: Seq[String],
      samplesIn: Seq[String]): String = {
    val filterIds = filterIdsIn.distinct.sorted.filterNot(_ == "PASS")
    val infoIds = infoIdsIn.distinct.sorted
    val fmtIds = fmtIdsIn.distinct.sorted
    val samples = samplesIn.distinct.sorted
    (Seq("##fileformat=VCFv4.2",
      "##FILTER=<ID=PASS,Description=\"All filters passed\">") ++
      filterIds.map(f => s"""##FILTER=<ID=$f,Description="$f">""") ++
      infoIds.map(k =>
        s"""##INFO=<ID=$k,Number=.,Type=String,Description="$k">""") ++
      fmtIds.map(k =>
        s"""##FORMAT=<ID=$k,Number=.,Type=String,Description="$k">""") ++
      contigs.distinct.sorted.map(c => s"##contig=<ID=$c>") :+
      (Seq("#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER",
        "INFO", "FORMAT") ++ samples).mkString("\t"))
      .mkString("", "\n", "\n")
  }

  def synthesizeHeader(df: DataFrame): String = {
    val parts = df.select(
      collect_set(col("chrom")).as("contigs"),
      collect_set(when(col("filter").isNotNull && col("filter") =!= ".",
        split(col("filter"), ";")).otherwise(array()))
        .as("filters"),
      collect_set(when(col("info").isNotNull && col("info") =!= ".",
        transform(split(col("info"), ";"),
          e => substring_index(e, "=", 1))).otherwise(array()))
        .as("infos"),
      collect_set(when(col("format").isNotNull && col("format") =!= ".",
        split(col("format"), ":")).otherwise(array()))
        .as("formats"),
      collect_set(map_keys(col("genotypes"))).as("samples"))
      .collect().head
    def flat(i: Int): Seq[String] =
      parts.getSeq[Seq[String]](i).flatten.distinct.sorted
    composeHeader(parts.getSeq[String](0), flat(1), flat(2), flat(3),
      flat(4))
  }

  /** `.bcf.csi` refs are POSITIONAL against the header's contig table
    * (empty aux): reorder the builder's run-order refs into contig
    * order, padding unseen contigs with empty refs. Shared by
    * [[writeBcf]] and the DSv2 write path.
    */
  private[graft] def paddedIndex(hdr: BcfHeader,
      builder: TabixIndex.Builder): TabixIndex.Index = {
    val built = builder.build()
    val byName = built.refs.map(r => r.name -> r).toMap
    val lastSeen = hdr.contigs.lastIndexWhere(byName.contains)
    TabixIndex.Index(hdr.contigs.take(lastSeen + 1).map { c =>
      byName.getOrElse(c, TabixIndex.Ref(c, 0L, 0L,
        Array.empty[Long], Map.empty, 14, builder.chosenDepth))
    })
  }

  /** [[writeBcf]] with a [[synthesizeHeader]] pass first — the
    * one-liner for frames with no original header. */
  def writeBcfSynth(df: DataFrame, outDir: String,
      index: Boolean = true): Unit =
    writeBcf(df, synthesizeHeader(df), outDir, index)

  /** Write `df` (the [[BcfReader.read]] wide schema: chrom, pos, id,
    * ref, alt, qual, filter, info, format, genotypes MAP) as BCF
    * shards under `outDir/shards`, one self-contained `.bcf` per
    * partition. `headerText` must declare every contig / FILTER /
    * INFO / FORMAT key the rows carry (it IS the dictionary — same
    * rule as any BCF emitter) and its `#CHROM` line's sample panel
    * fixes the per-record call order; samples missing from a row's
    * map encode as `.`. With `index = true` each shard must arrive
    * position-sorted (range-repartition + sortWithinPartitions
    * upstream) and gets a `.csi` sibling built during the emit.
    */
  def writeBcf(
      df: DataFrame, headerText: String, outDir: String,
      index: Boolean = true): Unit = {
    val spark = df.sparkSession
    val hdr = BcfReader.decodeHeaderText(headerText)
    require(hdr.contigs.nonEmpty,
      "headerText must carry ##contig lines (the BCF contig table)")
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val shardsDir = s"$outDir/shards"
    val outRoot = new Path(shardsDir)
    val rootFs = outRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    rootFs.delete(outRoot, true)
    rootFs.mkdirs(outRoot)
    val samples = hdr.samples
    val rows = df.select(
      col("chrom").cast("string"), col("pos").cast("int"),
      coalesce(col("id"), lit(".")).cast("string"),
      col("ref").cast("string"),
      coalesce(col("alt"), lit(".")).cast("string"),
      coalesce(col("qual"), lit(".")).cast("string"),
      coalesce(col("filter"), lit(".")).cast("string"),
      coalesce(col("info"), lit(".")).cast("string"),
      coalesce(col("format"), lit(".")).cast("string"),
      // a NULL map (outer-join/union debris) must encode like a
      // sites-only row, not NPE the executor — same coalesce
      // treatment as every other nullable column
      coalesce(col("genotypes"),
        map().cast("map<string,string>")).as("genotypes"))
    rows.rdd.foreachPartition { it =>
      if (it.hasNext) {
        val tc = org.apache.spark.TaskContext.get
        val dir = new Path(shardsDir)
        val fs = dir.getFileSystem(confBc.value.value)
        val fin = new Path(dir, f"part-${tc.partitionId}%05d.bcf")
        // COMMIT PROTOCOL (speculation-safe): shard + .csi are staged
        // in a per-ATTEMPT dir, then committed rename-if-absent with
        // the .csi FIRST — two racing attempts never rename over each
        // other (first committed shard wins, the loser discards its
        // attempt dir), and a task dying mid-commit can only leave an
        // orphan .csi (readers key off .bcf files and ignore it),
        // never an indexed-write shard silently missing its index
        val attemptDir = new Path(dir,
          f".attempt-${tc.partitionId}%05d-${tc.taskAttemptId}%d")
        fs.mkdirs(attemptDir)
        val tmp = new Path(attemptDir, fin.getName)
        val bgz = new BgzfOutputStream(fs.create(tmp, true))
        val builder =
          if (index) new TabixIndex.Builder(14, 5, fin.toString) else null
        try {
          bgz.write(encodePrologue(headerText))
          it.foreach { r =>
            val gmap = r.getMap[String, String](9)
            val calls = samples.map(s => gmap.getOrElse(s, "."))
            val v0 = bgz.voff
            bgz.write(encodeRecord(hdr, r.getString(0), r.getInt(1),
              r.getString(2), r.getString(3), r.getString(4),
              r.getString(5), r.getString(6), r.getString(7),
              r.getString(8), calls))
            if (builder != null)
              // index refs by the header's OWN contig name (the .csi
              // refs are positional against the contig table; the
              // frame's chrom may be the normalized form); the binned
              // span honors INFO END so END-spanned records (gVCF
              // bands, symbolic SVs) are findable at inner loci
              builder.record(hdr.contigs(resolveRid(hdr, r.getString(0))),
                r.getInt(1).toLong,
                spanOf(r.getInt(1), r.getString(3), r.getString(7)),
                v0, bgz.voff)
          }
          bgz.finish()
        } finally bgz.close()
        val tmpCsi =
          if (builder != null && !builder.isEmpty) {
            val t = new Path(attemptDir,
              TabixIndex.csiSibling(fin).getName)
            TabixIndex.writeCsi(fs, t,
              paddedIndex(hdr, builder), 14, builder.chosenDepth,
              tabixAux = false)
            t
          } else null
        // commit: a twin attempt's committed shard wins (rename-if-
        // absent); .csi first so a committed shard is never index-less
        if (!fs.exists(fin)) {
          if (tmpCsi != null) {
            val finCsi = TabixIndex.csiSibling(fin)
            if (!fs.rename(tmpCsi, finCsi) && !fs.exists(finCsi))
              throw new java.io.IOException(
                s"commit rename $tmpCsi -> $finCsi failed")
          }
          if (!fs.rename(tmp, fin) && !fs.exists(fin))
            throw new java.io.IOException(
              s"commit rename $tmp -> $fin failed")
        }
        fs.delete(attemptDir, true)
      }
    }
  }
}
