package graft.sources.v2

import java.util

import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.BgenReader

/** DataSource V2 BGEN reader: `spark.read.format("bgen").load(path)`
  * — the declarative twin of [[graft.sources.BgenReader.readBgen]]
  * (same long ann-shaped schema, so the GP dosage ladder consumes it
  * unchanged), with the scan behaviors only Catalyst can drive:
  *
  *  - **chrom/pos pushdown applied BEFORE payload decode**: a variant
  *    block's identifying fields (chrom, pos) are a few dozen bytes
  *    ahead of the (compressed) genotype payload, so pushed
  *    `chrom === c && pos between (a, b)` predicates skip the
  *    inflate+bit-unpack of every non-matching block — the dominant
  *    per-block cost at biobank sample widths. Block-level checks are
  *    EXACT (one site per block), so the filters report as fully
  *    pushed.
  *  - **column pruning that skips DECODE work**: when neither `GP`
  *    nor `gt` is required, the probability payload is never
  *    inflated/unpacked — a sites-shaped query (`select chrom, pos,
  *    ref, alt`) does per-variant work, not per-(variant × sample).
  *  - **splittable by variant-block offsets**: planning walks each
  *    file's block headers once (lengths only — the
  *    [[BgenReader.readBgen]] plan pass, run per file on the bounded
  *    [[PlanPool]]) and assigns contiguous byte-budgeted block ranges
  *    (~`spark.sql.files.maxPartitionBytes` each); readers re-open
  *    through the broadcast-free session conf rebuilt from the
  *    planned kv set (the executor-conf rule).
  *  - [[SupportsReportStatistics]]: post-pruning bytes × a zlib
  *    inflation guess + exact row count (blocks × samples), so a
  *    pruned BGEN read broadcast-joins where the raw size wouldn't.
  */
class BgenDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "bgen"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BgenReader.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val multi = Option(properties.get("paths")).toSeq.flatMap { s =>
      try new com.fasterxml.jackson.databind.ObjectMapper()
        .readValue(s, classOf[Array[String]]).toSeq
      catch {
        case e: Exception => throw new IllegalArgumentException(
          "bgen option 'paths' must be a JSON array of strings, got: " + s,
          e)
      }
    }
    val paths = Option(properties.get("path")).toSeq ++ multi
    new BgenTable(paths)
  }
}

final class BgenTable(paths: Seq[String]) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = s"bgen(${paths.mkString(",")})"
  override def schema(): StructType = BgenReader.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.ACCEPT_ANY_SCHEMA)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new BgenScanBuilder(paths)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(paths.length == 1,
      s"bgen write needs exactly one target path, got $paths")
    new GraftWriteBuilder("bgen", paths.head, info)
  }
}

final class BgenScanBuilder(paths: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = BgenReader.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, rest) = filters.partition {
      case EqualTo("chrom", _) => true
      case EqualTo("pos", _) | GreaterThan("pos", _) |
           GreaterThanOrEqual("pos", _) | LessThan("pos", _) |
           LessThanOrEqual("pos", _) => true
      case _ => false
    }
    pushed = supported
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new BgenScan(paths, required, pushed)
}

/** One planned block range of one file. */
final case class BgenPartition(path: String, startOffset: Long,
    count: Int, bytes: Long, compression: Int, samples: Seq[String])
    extends InputPartition

final class BgenScan(paths: Seq[String], required: StructType,
    filters: Array[Filter])
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def description(): String =
    s"BgenScan[${required.fieldNames.mkString(",")}] " +
      s"pushed=${filters.mkString(",")}"
  override def toBatch: Batch = this

  private def chromEq: Option[String] = {
    val eqs = filters.collect { case EqualTo("chrom", v) => v.toString }
      .distinct
    if (eqs.length == 1) Some(eqs.head) else None
  }
  private def chromUnsatisfiable: Boolean =
    filters.collect { case EqualTo("chrom", v) => v.toString }
      .distinct.length > 1
  private def posLo: Option[Long] = {
    val b = filters.collect {
      case GreaterThan("pos", v) => v.toString.toLong + 1
      case GreaterThanOrEqual("pos", v) => v.toString.toLong
      case EqualTo("pos", v) => v.toString.toLong
    }
    if (b.isEmpty) None else Some(b.max)
  }
  private def posHi: Option[Long] = {
    val b = filters.collect {
      case LessThan("pos", v) => v.toString.toLong - 1
      case LessThanOrEqual("pos", v) => v.toString.toLong
      case EqualTo("pos", v) => v.toString.toLong
    }
    if (b.isEmpty) None else Some(b.min)
  }

  private lazy val plannedParts: Array[InputPartition] =
    if (chromUnsatisfiable) Array.empty else {
    val spark = SparkSession.active
    val hconf = spark.sessionState.newHadoopConf()
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    val files = mutable.ArrayBuffer.empty[Path]
    paths.foreach { p =>
      val fs = new Path(p).getFileSystem(hconf)
      def expand(st: org.apache.hadoop.fs.FileStatus)
          : Seq[org.apache.hadoop.fs.FileStatus] = {
        val n = st.getPath.getName
        if (n.startsWith(".") || n.startsWith("_")) Seq.empty
        else if (st.isDirectory)
          fs.listStatus(st.getPath).toSeq.flatMap(expand)
        else Seq(st)
      }
      val statuses = (fs.globStatus(new Path(p)) match {
        case null | Array() => throw new IllegalArgumentException(
          s"[PATH_NOT_FOUND] bgen path does not exist: $p")
        case s => s.toSeq.flatMap(expand)
      }).filter(_.getPath.getName.endsWith(".bgen"))
      require(statuses.nonEmpty,
        s"no .bgen files under $p (a silent empty scan would read " +
          "as 'no variants')")
      files ++= statuses.map(_.getPath)
    }
    val out = mutable.ArrayBuffer.empty[InputPartition]
    // per-file planning on the bounded pool: through the `.bgi`
    // sqlite sidecar when present (index-sized read + block-level
    // chrom/pos PRUNING — non-matching blocks never read AT ALL, not
    // even their identifiers), else header + offset walk
    val cEq = chromEq; val pLo = posLo; val pHi = posHi
    val perFile = PlanPool.mapOrdered(files.toSeq) { fp =>
      val fs = fp.getFileSystem(hconf)
      val in = new java.io.BufferedInputStream(fs.open(fp), 1 << 16)
      val header = try BgenReader.readHeader(in) finally in.close()
      val bgi = new Path(fp.toString + ".bgi")
      if (fs.exists(bgi)) {
        val entries = graft.sources.BgiIndex.read(SparkSession.active,
          bgi.toString, fs.getFileStatus(fp).getLen)
        require(entries.length == header.mVariants,
          s"$fp.bgi indexes ${entries.length} variants, header " +
            s"declares ${header.mVariants} — rebuild the index")
        // exact block-level pruning from the index alone
        val kept = entries.filter(e =>
          cEq.forall(_ == e.chrom) &&
            pLo.forall(e.pos >= _) && pHi.forall(e.pos <= _))
        (fp.toString, header,
          kept.map(e => (e.fileStart, e.sizeBytes)), -1L)
      } else {
        val raw = fs.open(fp)
        try {
          raw.seek(header.firstVariantOffset)
          val bin = new java.io.BufferedInputStream(raw, 1 << 16)
          val counting = new java.io.FilterInputStream(bin) {
            var count = 0L
            override def read(): Int = {
              val r = super.read(); if (r >= 0) count += 1; r }
            override def read(b: Array[Byte], o: Int, l: Int): Int = {
              val r = super.read(b, o, l); if (r > 0) count += r; r }
            override def skip(n: Long): Long = {
              val s = super.skip(n); count += s; s }
          }
          val blocks =
            Seq.newBuilder[(Long, Long)]
          var i = 0
          while (i < header.mVariants) {
            val start = header.firstVariantOffset + counting.count
            BgenReader.readVariantBlock(counting, header.compression,
              skipGeno = true)
            val end = header.firstVariantOffset + counting.count
            blocks += ((start, end - start))
            i += 1
          }
          (fp.toString, header, blocks.result(), -1L)
        } finally raw.close()
      }
    }
    perFile.foreach { case (p, header, blocks, _) =>
      // contiguous runs only (a task decodes sequentially from its
      // start offset), split further by the byte budget
      var s0 = 0
      while (s0 < blocks.length) {
        var e = s0 + 1
        while (e < blocks.length &&
            blocks(e)._1 == blocks(e - 1)._1 + blocks(e - 1)._2 &&
            blocks(e)._1 - blocks(s0)._1 < maxSplit) e += 1
        val endOff = blocks(e - 1)._1 + blocks(e - 1)._2
        out += BgenPartition(p, blocks(s0)._1, e - s0,
          endOff - blocks(s0)._1, header.compression, header.samples)
        s0 = e
      }
    }
    out.toArray
  }

  override def planInputPartitions(): Array[InputPartition] = plannedParts

  override def createReaderFactory(): PartitionReaderFactory = {
    // the Hadoop conf rides the FACTORY, serialized once per task-set
    // broadcast — not inside every InputPartition, where hundreds of
    // kv pairs would bloat each task payload (the readBgen rule)
    val hconf = SparkSession.active.sessionState.newHadoopConf()
    val kv = {
      val it = hconf.iterator()
      val b = mutable.ArrayBuffer.empty[(String, String)]
      while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
      b.toSeq
    }
    new BgenReaderFactory(required, chromEq, posLo, posHi, kv)
  }

  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes = plannedParts.map {
      case b: BgenPartition => b.bytes
      case _ => 0L
    }.sum
    private val rows = plannedParts.map {
      case b: BgenPartition => b.count.toLong * b.samples.length
      case _ => 0L
    }.sum
    // zlib probability payloads inflate ~3-4×; decoded GP strings a
    // bit more — conservative enough that pruned reads broadcast
    override def sizeInBytes(): util.OptionalLong =
      util.OptionalLong.of(math.max(1L, bytes * 6))
    override def numRows(): util.OptionalLong =
      util.OptionalLong.of(rows)
  }
}

final class BgenReaderFactory(required: StructType,
    chromEq: Option[String], posLo: Option[Long], posHi: Option[Long],
    confKv: Seq[(String, String)])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new BgenPartitionReader(p.asInstanceOf[BgenPartition], required,
      chromEq, posLo, posHi, confKv)
}

final class BgenPartitionReader(part: BgenPartition, required: StructType,
    chromEq: Option[String], posLo: Option[Long], posHi: Option[Long],
    confKv: Seq[(String, String)])
    extends PartitionReader[InternalRow] {
  import BgenReader._

  private val conf = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    confKv.foreach { case (k, v) => c.set(k, v) }
    c
  }
  private val in = {
    val p = new Path(part.path)
    val raw = p.getFileSystem(conf).open(p)
    raw.seek(part.startOffset)
    new java.io.BufferedInputStream(raw, 1 << 16)
  }
  // which output slots feed from which source field
  private val fieldIdx = required.fieldNames.map(
    BgenReader.schema.fieldNames.indexOf(_))
  private val needGeno = required.fieldNames.exists(n =>
    n == "GP" || n == "gt" || n == "gt1" || n == "gt2")

  private var blocksLeft = part.count
  private var current: BgenVariant = _
  private var calls: BgenReader.DecodedCalls = _
  private var sampleI = 0
  private var row: InternalRow = _

  private def blockMatches(v: BgenVariant): Boolean =
    chromEq.forall(_ == v.chrom) &&
      posLo.forall(v.pos >= _) && posHi.forall(v.pos <= _)

  override def next(): Boolean = {
    while (current == null || sampleI >= part.samples.length) {
      if (blocksLeft <= 0) return false
      // identifiers first, payload only for MATCHING blocks that need
      // genotype columns — a filtered-out block costs a seek, never
      // an inflate/bit-unpack (the pushdown payoff)
      val ids = readVariantIds(in)
      blocksLeft -= 1
      val matches = blockMatches(ids)
      val geno = readGenoPayload(in, part.compression,
        skip = !(matches && needGeno))
      if (matches) {
        current = ids
        calls = if (needGeno)
          decodeGenotypes(geno, ids.alleles.length,
            part.samples.length.toLong)
          else null
        sampleI = 0
      } else current = null
    }
    val v = current
    val si = sampleI
    sampleI += 1
    val ref = if (v.alleles.nonEmpty) v.alleles.head else "."
    val alt = if (v.alleles.length > 1) v.alleles.tail.mkString(",")
      else "."
    def utf(s: String): Any =
      if (s == null) null else UTF8String.fromString(s)
    def full(i: Int): Any = i match {
      case 0 => UTF8String.fromString(v.chrom)
      case 1 => v.pos.toInt
      case 2 => UTF8String.fromString(v.varId)
      case 3 => UTF8String.fromString(v.rsid)
      case 4 => UTF8String.fromString(ref)
      case 5 => UTF8String.fromString(alt)
      case 6 => if (v.alleles.length > 2) 1 else 0
      case 7 => UTF8String.fromString(part.samples(si))
      // call columns only when the payload was decoded; a pruned
      // sites read never touches them (fieldIdx filters the slots)
      case 8 => utf(if (calls == null) null else calls.gt(si))
      case 9 => utf(if (calls == null) null else calls.gt1(si))
      case 10 => utf(if (calls == null) null else calls.gt2(si))
      case 11 => utf(if (calls == null) null else calls.gp(si))
    }
    row = new GenericInternalRow(fieldIdx.map(full))
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
