package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
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
    * With NO samples the emission is SITES-ONLY: exactly the 8 fixed
    * columns, no FORMAT — per the VCF spec FORMAT exists only when
    * genotype columns follow it (`format`/`genotypes` columns are then
    * never referenced, so a sites-only frame can omit them).
    */
  private def lineCol(samples: Seq[String]): org.apache.spark.sql.Column = {
    val fixedNames = Seq("chrom", "pos", "id", "ref", "alt", "qual", "filter",
      "info") ++ (if (samples.nonEmpty) Seq("format") else Nil)
    val fixed = fixedNames.map(c => coalesce(col(c).cast("string"), lit(".")))
    val calls = samples.map(sid =>
      coalesce(element_at(col("genotypes"), sid), lit("./.")))
    concat_ws("\t", fixed ++ calls: _*)
  }

  def toVcfLines(df: DataFrame, samples: Seq[String]): DataFrame =
    df.select(lineCol(samples).as("value"))

  /** `##key=value` lines + the `#CHROM…` column line from parsed
    * metadata. A bare `##line` (no `=`; parsed as an empty value) is
    * re-emitted bare rather than as `##line=`.
    *
    * `##contig` IDs are normalized the same way the reader normalizes
    * CHROM (strip the leading `chr` — VariantFunctions.normalizeChrom):
    * the data lines carry normalized chrom values, so a byte-faithful
    * `<ID=chr22,…>` contig line would make the emitted file internally
    * inconsistent (header names no chromosome the body uses).
    */
  def headerLines(meta: VcfMetadata): Seq[String] =
    meta.headerKv.map {
      case (k, "") => s"##$k"
      // the VCF spec fixes no attribute order — match ID= after '<' or ','
      case ("contig", v) => s"##contig=${v.replaceFirst("([<,])ID=chr", "$1ID=")}"
      case (k, v) => s"##$k=$v"
    } :+ meta.columns.mkString("\t")

  /** Write `outDir/header.vcf` (tiny, driver-written) plus
    * `outDir/shards/part-*` data shards (distributed text write).
    * Concatenating header + shards yields one valid VCF. Both go
    * through the Hadoop filesystem of `outDir`, so hdfs://, s3a://,
    * and local paths all work — the shards and the header can't land
    * on different filesystems.
    */
  def writeSharded(df: DataFrame, meta: VcfMetadata, outDir: String): Unit = {
    toVcfLines(df, meta.samples).write.mode("overwrite").text(s"$outDir/shards")
    writeHeader(df, meta, outDir)
  }

  /** Per-CHROMOSOME sharded emission — the region-sharded layout big
    * callsets actually distribute as (one VCF per chromosome, the
    * 1000-Genomes/gnomAD convention): data lines land under
    * `outDir/shards/chrom=C/part-…`, so header.vcf + cat of one chrom
    * directory is a valid single-chromosome VCF and every chromosome can be
    * assembled (or bgzipped + indexed) independently, in parallel.
    *
    * The write REPARTITIONS on (chrom, pos bucket) — one directory per
    * chromosome but MANY writer tasks per chromosome ([[VcfReader
    * .toParquet]]'s anti-straggler reasoning: hashing on chrom alone
    * would serialize a multi-TB chromosome through one task) — and
    * sorts within each task so every shard is position-sorted
    * internally (bgzip/tabix-friendly).
    */
  def writeShardedByChrom(df: DataFrame, meta: VcfMetadata, outDir: String,
      bgzf: Boolean = false): Unit = {
    // sort key leads with chrom: the partitioned text writer REQUIRES
    // its tasks ordered by the partition column and would insert its
    // own (unstable) sort otherwise, clobbering the pos order
    val w = df.repartition(col("chrom"), VcfReader.posBucket(col("pos")))
      .sortWithinPartitions(col("chrom"), col("pos"))
      .select(col("chrom"), lineCol(meta.samples).as("value"))
      .write.mode("overwrite")
      .partitionBy("chrom")
    (if (bgzf) w.option("compression", classOf[graft.sources.v2.BgzfCodec].getName)
     else w).text(s"$outDir/shards")
    writeHeader(df, meta, outDir)
  }

  /** [[writeSharded]] with BGZF-compressed shards (graft's own
    * [[graft.sources.v2.BgzfCodec]]): each `part-*.gz` is a valid
    * multi-member gzip stream (any gunzip reads it) built from ≤64 KiB
    * BGZF blocks — so a sorted shard can be tabix/CSI-indexed and the
    * engine's OWN voff-splittable scan (`format("vcf")` + sibling
    * index) applies to the engine's own output. The emit stays fully
    * distributed; compression is per-writer-task, streaming.
    */
  def writeShardedBgzf(df: DataFrame, meta: VcfMetadata, outDir: String): Unit = {
    // each shard position-sorted (chrom runs contiguous) — the
    // precondition for indexing it; cheap relative to the write
    toVcfLines(df.sortWithinPartitions(col("chrom"), col("pos")), meta.samples)
      .write.mode("overwrite")
      .option("compression", classOf[graft.sources.v2.BgzfCodec].getName)
      .text(s"$outDir/shards")
    writeHeader(df, meta, outDir)
  }

  /** [[writeSharded]] with GLOBAL (chrom, pos) order ACROSS shards:
    * range-repartition on (chrom, pos) — shard k's last coordinate
    * precedes shard k+1's first — then sort within each shard, so
    * `header + cat(part-00000 … part-NNNNN)` in filename order is ONE
    * coordinate-sorted VCF (the precondition for single-file indexing
    * and `bcftools concat`-style consumption) while the write itself
    * stays fully parallel. Chrom order is lexicographic (the engine's
    * one total order for chrom strings — same as `orderBy`); the range
    * exchange samples the data to pick balanced split points, so skewed
    * chromosomes spread over multiple shards instead of one straggler.
    * `bgzf = true` compresses each shard with [[graft.sources.v2
    * .BgzfCodec]] — cat of the shards is then a valid multi-member
    * bgzip VCF, and [[indexBgzfShards]] makes the landing splittable.
    */
  def writeShardedSorted(
      df: DataFrame, meta: VcfMetadata, outDir: String,
      numShards: Int = 0, bgzf: Boolean = false): Unit = {
    val ranged =
      if (numShards > 0) df.repartitionByRange(numShards, col("chrom"), col("pos"))
      else df.repartitionByRange(col("chrom"), col("pos"))
    val w = toVcfLines(ranged.sortWithinPartitions(col("chrom"), col("pos")),
      meta.samples).write.mode("overwrite")
    (if (bgzf) w.option("compression", classOf[graft.sources.v2.BgzfCodec].getName)
     else w).text(s"$outDir/shards")
    writeHeader(df, meta, outDir)
  }

  /** [[writeShardedByChrom]] × [[writeShardedBgzf]]: the RECOMMENDED
    * distribution layout for big callsets — one directory per
    * chromosome, many BGZF-compressed position-sorted shards per
    * chromosome. Follow with [[indexBgzfShards]] (it recurses into the
    * `chrom=C/` dirs) and the whole landing is region-prunable and
    * voff-splittable through `format("vcf")`, while any chromosome can
    * still be assembled independently as header + cat(dir) (a valid
    * multi-member gzip = one bgzipped single-chrom VCF).
    */
  def writeShardedByChromBgzf(df: DataFrame, meta: VcfMetadata, outDir: String): Unit =
    writeShardedByChrom(df, meta, outDir, bgzf = true)

  /** BGZF emission with the region index built DURING the write — the
    * bgzip+tabix one-pass pipeline, fully distributed: globally
    * (chrom, pos)-range-partitioned sorted shards ([[writeShardedSorted]]'s
    * layout), each writer task streaming its rows through
    * [[graft.sources.v2.BgzfOutputStream]] while recording every
    * record's virtual offset ([[graft.sources.v2.BgzfOutputStream.voff]]
    * — the codec owns the block boundaries, so the offsets are exact)
    * into a [[graft.sources.v2.TabixIndex.Builder]]. When the shard
    * closes, the SAME task writes the sibling index next to it: classic
    * `.tbi` when the shard's positions fit tabix's fixed geometry
    * (minShift 14 / depth 5, positions < 2^29), `.csi` otherwise —
    * exactly htslib's escalation rule. Unlike [[indexBgzfShards]] the
    * data is never read back: at 100 TB that second decompress-and-parse
    * pass is the difference between "index while the bytes are hot" and
    * doubling the job's IO.
    *
    * Each task writes through a hidden attempt-suffixed temp name and
    * renames on success — a retried/speculative attempt either fully
    * replaces the shard or leaves only `.`-prefixed litter that every
    * consumer here ([[indexBgzfShards]], the `format("vcf")` scan,
    * Hadoop globs) already skips.
    */
  def writeIndexedBgzf(
      df: DataFrame, meta: VcfMetadata, outDir: String,
      numShards: Int = 0, minShift: Int = 14, depth: Int = 5): Unit = {
    import graft.sources.v2.{BgzfOutputStream, TabixIndex}
    val spark = df.sparkSession
    val ranged =
      if (numShards > 0) df.repartitionByRange(numShards, col("chrom"), col("pos"))
      else df.repartitionByRange(col("chrom"), col("pos"))
    val rows = ranged.sortWithinPartitions(col("chrom"), col("pos"))
      .select(col("chrom").cast("string"), col("pos").cast("long"),
        length(col("ref")).cast("int"), col("info").cast("string"),
        lineCol(meta.samples))
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val shardsDir = s"$outDir/shards"
    // clear a previous landing (mode.overwrite semantics of the text path)
    val outRoot = new Path(shardsDir)
    val rootFs = outRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    rootFs.delete(outRoot, true)
    rootFs.mkdirs(outRoot)
    rows.rdd.foreachPartition { it =>
      if (it.hasNext) {
        val tc = org.apache.spark.TaskContext.get
        val dir = new Path(shardsDir)
        val fs = dir.getFileSystem(confBc.value.value)
        val fin = new Path(dir, f"part-${tc.partitionId}%05d.vcf.gz")
        // COMMIT PROTOCOL (the BcfWriter.writeBcf rule): shard + index
        // staged in a per-ATTEMPT dir, committed rename-if-absent with
        // the index FIRST — racing speculative attempts never rename
        // over each other, and a task dying mid-commit can only leave
        // an orphan index (readers key off the data files), never an
        // index-less committed shard
        val attemptDir = new Path(dir,
          f".attempt-${tc.partitionId}%05d-${tc.taskAttemptId}%d")
        fs.mkdirs(attemptDir)
        val tmp = new Path(attemptDir, fin.getName)
        val bgz = new BgzfOutputStream(fs.create(tmp, true))
        val builder = new TabixIndex.Builder(minShift, depth, fin.toString)
        try {
          it.foreach { r =>
            val v0 = bgz.voff
            bgz.write((r.getString(4) + "\n")
              .getBytes(StandardCharsets.UTF_8))
            // END-aware span (htslib's tabix VCF preset parses INFO
            // END=): a gVCF band's bins must cover the band interior,
            // not just the anchor base, or external region queries
            // left of the window silently miss the record
            builder.record(r.getString(0), r.getLong(1),
              BcfWriter.spanOfLen(r.getLong(1), r.getInt(2),
                if (r.isNullAt(3)) "" else r.getString(3)),
              v0, bgz.voff)
          }
          bgz.finish()
        } finally bgz.close()
        val idx = builder.build()
        // classic .tbi iff the shard fits tabix's fixed geometry;
        // otherwise .csi at the builder's (possibly escalated) depth —
        // htslib's own fallback rule
        val finIdx =
          if (minShift == 14 && depth == 5 && builder.chosenDepth == 5 &&
              builder.maxEnd0 <= (1L << 29)) TabixIndex.sibling(fin)
          else TabixIndex.csiSibling(fin)
        val tmpIdx = new Path(attemptDir, finIdx.getName)
        if (finIdx.getName.endsWith(".tbi"))
          TabixIndex.writeTbi(fs, tmpIdx, idx)
        else TabixIndex.writeCsi(fs, tmpIdx, idx, minShift,
          builder.chosenDepth)
        if (!fs.exists(fin)) {
          if (!fs.rename(tmpIdx, finIdx) && !fs.exists(finIdx))
            throw new java.io.IOException(
              s"commit rename $tmpIdx -> $finIdx failed")
          if (!fs.rename(tmp, fin) && !fs.exists(fin))
            throw new java.io.IOException(
              s"commit rename $tmp -> $fin failed")
        }
        fs.delete(attemptDir, true)
      }
    }
    writeHeader(df, meta, outDir)
  }

  /** Build a `.csi` sibling for every BGZF shard under `outDir/shards`
    * (recursively — the [[writeShardedByChromBgzf]] layout nests shards
    * in `chrom=C/` dirs) — the engine indexes its own bgzf output with
    * no external tooling (TabixIndex.buildForBgzfVcf walks each shard's
    * blocks), after which `format("vcf")` over the shard glob prunes
    * `chrom`/`pos` regions AND splits large shards exactly like any
    * tabix-indexed input. One executor task per shard; the driver never
    * reads data bytes. `minShift`/`depth` are the CSI geometry knobs
    * (htslib defaults 14/5 cover positions to 2^(14+3·5) ≈ 512 Mb —
    * raise depth for longer contigs, lower minShift for finer pruning
    * at more index bytes).
    */
  def indexBgzfShards(spark: org.apache.spark.sql.SparkSession, outDir: String,
      minShift: Int = 14, depth: Int = 5): Unit = {
    val dir = new Path(s"$outDir/shards")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Hadoop convention: skip hidden path components ('_'/'.'-prefixed) —
    // a crashed writer's _temporary attempt files are truncated bgzf and
    // must not be indexed (or fail the whole indexing job)
    def hidden(p: Path): Boolean =
      Iterator.iterate(p)(_.getParent)
        .takeWhile(q => q != null && q.toUri.getPath != dir.toUri.getPath)
        .exists(q => q.getName.startsWith("_") || q.getName.startsWith("."))
    val shards = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = fs.listFiles(dir, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".gz") && !hidden(f.getPath))
        shards += f.getPath.toString
    }
    if (shards.isEmpty) return
    // Task-side FS from the DRIVER'S hadoopConfiguration, shipped via a
    // broadcast SerializableConfiguration: `new Configuration()` loads
    // only default resources, silently dropping every `spark.hadoop.*`
    // setting (s3a/abfs credentials, endpoints, HDFS nameservices)
    // injected through Spark conf — indexing would fail or mis-resolve
    // the filesystem on any cluster configured that way.
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    spark.sparkContext
      .parallelize(shards.toSeq, shards.length)
      .foreach { p =>
        val sp = new Path(p)
        val tfs = sp.getFileSystem(confBc.value.value)
        graft.sources.v2.TabixIndex.indexBgzfSibling(tfs, sp, minShift, depth)
      }
  }

  private def writeHeader(df: DataFrame, meta: VcfMetadata, outDir: String): Unit = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val headerPath = new Path(outDir, "header.vcf")
    val fs = headerPath.getFileSystem(conf)
    val out = fs.create(headerPath, true)
    try out.write((headerLines(meta).mkString("\n") + "\n")
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }
}
