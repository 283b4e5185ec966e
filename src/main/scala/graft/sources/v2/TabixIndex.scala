package graft.sources.v2

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.GZIPInputStream

import scala.collection.mutable

import org.apache.hadoop.fs.{FileSystem, Path}

/** Minimal tabix (.tbi) index reader — enough to PRUNE: which reference
  * sequences a bgzip-compressed VCF contains, and where (as BGZF virtual
  * offsets) each sequence's records live.
  *
  * Format is the public tabix spec (htslib "Tabix index file format",
  * samtools.github.io/hts-specs/tabix.pdf): a BGZF-compressed block of
  * little-endian binary — magic "TBI\1", header ints, concatenated
  * NUL-terminated sequence names, then per sequence a binning index
  * (bin → chunks of [cnk_beg, cnk_end) virtual offsets) and a linear
  * index (16 kb windows → smallest virtual offset of records
  * overlapping the window). A virtual offset packs
  * (compressed block start) << 16 | (offset within decompressed block).
  *
  * The reference ships .tbi files with both of its test VCFs
  * (reference: vcf_metadata.py:8-15 assumes tabix-indexed input).
  */
object TabixIndex {

  /** Pseudo-bin number holding per-ref statistics, NOT file chunks —
    * its "chunks" are (off_beg, off_end) + (n_mapped, n_unmapped) and
    * must not be mixed into real chunk offset aggregation.
    */
  private val PseudoBin = 37450

  /** One indexed reference sequence.
    *
    * @param minVoff smallest record virtual offset (start of this ref's
    *                data region in the BGZF file)
    * @param maxVoff largest chunk-end virtual offset (end of data)
    * @param ioff    linear index: ioff(w) = smallest virtual offset of
    *                records overlapping window [w*16kb, (w+1)*16kb); 0
    *                entries mean "no update" (fall back to minVoff)
    */
  final case class Ref(name: String, minVoff: Long, maxVoff: Long, ioff: Array[Long]) {
    def nIntv: Int = ioff.length
    /** Max record start position covered: every record STARTS in some
      * indexed window, so pos lower bounds at or beyond this prune the
      * whole ref. */
    def maxCoveredPos: Long = ioff.length.toLong << 14
  }

  final case class Index(refs: Seq[Ref]) {
    /** Lookup tolerant of `chr` prefixes on either side (the engine
      * normalizes `chrN` → `N` before filtering). */
    def ref(chrom: String): Option[Ref] = {
      val q = chrom.stripPrefix("chr")
      refs.find(r => r.name.stripPrefix("chr") == q)
    }
  }

  /** Sibling index path convention: `<data file>.tbi`. */
  def sibling(dataPath: Path): Path =
    new Path(dataPath.getParent, dataPath.getName + ".tbi")

  def read(fs: FileSystem, tbiPath: Path): Index = {
    val in = new GZIPInputStream(fs.open(tbiPath), 65536)
    val bytes = try in.readAllBytes() finally in.close()
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)

    val magic = Array.fill(4)(bb.get())
    require(magic.sameElements(Array('T'.toByte, 'B'.toByte, 'I'.toByte, 1.toByte)),
      s"$tbiPath is not a tabix index (bad magic)")
    val nRef = bb.getInt
    bb.getInt // format
    bb.getInt // col_seq
    bb.getInt // col_beg
    bb.getInt // col_end
    bb.getInt // meta char
    bb.getInt // skip
    val lNm = bb.getInt
    val nameBytes = new Array[Byte](lNm)
    bb.get(nameBytes)
    val names = new String(nameBytes, "UTF-8").split('\u0000').filter(_.nonEmpty)
    require(names.length == nRef,
      s"$tbiPath: ${names.length} names for $nRef references")

    val refs = mutable.ArrayBuffer.empty[Ref]
    for (i <- 0 until nRef) {
      var minV = Long.MaxValue
      var maxV = 0L
      val nBin = bb.getInt
      for (_ <- 0 until nBin) {
        val bin = bb.getInt
        val nChunk = bb.getInt
        for (_ <- 0 until nChunk) {
          val beg = bb.getLong
          val end = bb.getLong
          if (bin != PseudoBin) {
            if (beg < minV) minV = beg
            if (end > maxV) maxV = end
          }
        }
      }
      val nIntv = bb.getInt
      val ioff = Array.fill(nIntv)(bb.getLong)
      refs += Ref(names(i), if (minV == Long.MaxValue) 0L else minV, maxV, ioff)
    }
    Index(refs.toSeq)
  }

  def compressedOffset(voff: Long): Long = voff >>> 16
  def uncompressedOffset(voff: Long): Int = (voff & 0xffff).toInt

  /** BGZF blocks are at most 64 KiB compressed — reading this many raw
    * bytes past a block start always covers the whole block. */
  val MaxBlockSize: Long = 65536L
}
