package graft.sources.v2

import java.io.OutputStream
import java.util.zip.{CRC32, Deflater}

import org.apache.hadoop.io.compress.{CompressionCodec, CompressionInputStream, CompressionOutputStream, Compressor, Decompressor}

/** BGZF (blocked-gzip) OUTPUT codec — the write twin of
  * [[BgzfLineReader]]: emit VCF/text shards as a series of ≤64 KiB
  * standalone gzip members whose `BC` extra subfield carries the
  * compressed block size (public BGZF spec, SAMv1.pdf §4.1), closed by
  * the fixed 28-byte EOF member. Output is a VALID multi-member gzip
  * stream (any gunzip reads it) AND indexable/splittable: run tabix (or
  * [[TabixIndex.writeCsi]]-style tooling) over a sorted shard and the
  * engine's voff-bounded split scan applies to the engine's own output.
  * Use via the text writer:
  * `df.write.option("compression", classOf[BgzfCodec].getName).text(dir)`.
  *
  * Spark's text sink only calls the single-argument
  * `createOutputStream`; the Compressor-pool overloads delegate (the
  * pooled compressor is unused — each block owns a raw Deflater).
  */
final class BgzfCodec extends CompressionCodec {
  override def createOutputStream(out: OutputStream): CompressionOutputStream =
    new BgzfOutputStream(out)
  override def createOutputStream(out: OutputStream, c: Compressor): CompressionOutputStream =
    new BgzfOutputStream(out)
  override def getCompressorType: Class[_ <: Compressor] =
    throw new UnsupportedOperationException("BgzfCodec pools no compressors")
  override def createCompressor(): Compressor =
    throw new UnsupportedOperationException("BgzfCodec pools no compressors")
  override def createInputStream(in: java.io.InputStream): CompressionInputStream =
    throw new UnsupportedOperationException(
      "read bgzf through format(\"vcf\")/BgzfLineReader, not the codec")
  override def createInputStream(in: java.io.InputStream, d: Decompressor): CompressionInputStream =
    createInputStream(in)
  override def getDecompressorType: Class[_ <: Decompressor] =
    throw new UnsupportedOperationException("BgzfCodec pools no decompressors")
  override def createDecompressor(): Decompressor =
    throw new UnsupportedOperationException("BgzfCodec pools no decompressors")
  // bgzip's own convention: the file stays a .gz (it IS gzip); the
  // reader sniffs blocked-ness from the BC subfield, not the name
  override def getDefaultExtension: String = ".gz"
}

object BgzfOutputStream {
  /** Max uncompressed payload per block — bgzip's own value (keeps the
    * compressed member safely under 64 KiB, the BSIZE field's ceiling).
    */
  val BlockPayload = 0xff00

  /** The fixed 28-byte BGZF end-of-file member (SAMv1.pdf §4.1.2). */
  val EofMarker: Array[Byte] = Array(
    0x1f, 0x8b, 0x08, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00, 0xff, 0x06, 0x00,
    0x42, 0x43, 0x02, 0x00, 0x1b, 0x00, 0x03, 0x00, 0x00, 0x00, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x00).map(_.toByte)
}

final class BgzfOutputStream(out: OutputStream)
    extends CompressionOutputStream(out) {
  import BgzfOutputStream._

  private val buf = new Array[Byte](BlockPayload)
  private var n = 0
  private var cBytes = 0L // compressed bytes flushed (block starts)
  private val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
  private val crc = new CRC32()
  private val cbuf = new Array[Byte](BlockPayload + 1024) // worst-case incompressible

  /** Current VIRTUAL OFFSET — (compressed offset of the open block <<
    * 16) | in-block byte offset, the BGZF/tabix coordinate. Captured
    * before/after each record write, this is what lets an indexing
    * writer record chunk voffs DURING the emit instead of re-reading
    * the shard ([[graft.sources.VcfWriter.writeIndexedBgzf]]).
    */
  def voff: Long = (cBytes << 16) | n.toLong

  override def write(b: Int): Unit = {
    buf(n) = b.toByte
    n += 1
    if (n == BlockPayload) flushBlock()
  }

  override def write(b: Array[Byte], off: Int, len: Int): Unit = {
    var o = off
    var rem = len
    while (rem > 0) {
      val take = math.min(rem, BlockPayload - n)
      System.arraycopy(b, o, buf, n, take)
      n += take; o += take; rem -= take
      if (n == BlockPayload) flushBlock()
    }
  }

  private def u16(a: Array[Byte], at: Int, v: Int): Unit = {
    a(at) = (v & 0xff).toByte; a(at + 1) = ((v >> 8) & 0xff).toByte
  }
  private def u32(a: Array[Byte], at: Int, v: Long): Unit =
    (0 until 4).foreach(i => a(at + i) = ((v >> (8 * i)) & 0xff).toByte)

  private def flushBlock(): Unit = {
    if (n == 0) return
    deflater.reset()
    deflater.setInput(buf, 0, n)
    deflater.finish()
    var clen = 0
    while (!deflater.finished()) {
      val w = deflater.deflate(cbuf, clen, cbuf.length - clen)
      clen += w
      require(clen < cbuf.length || deflater.finished(),
        "BGZF block payload did not fit the worst-case buffer")
    }
    crc.reset()
    crc.update(buf, 0, n)
    val bsize = 18 + clen + 8 // header(12) + BC extra(6) + cdata + trailer(8)
    require(bsize <= 0x10000, s"BGZF block overflow: $bsize bytes compressed")
    val hdr = new Array[Byte](18)
    hdr(0) = 0x1f.toByte; hdr(1) = 0x8b.toByte; hdr(2) = 8; hdr(3) = 4 // FEXTRA
    // MTIME(4)=0, XFL=0 at 8; OS=0xff at 9
    hdr(9) = 0xff.toByte
    u16(hdr, 10, 6) // XLEN
    hdr(12) = 'B'; hdr(13) = 'C'
    u16(hdr, 14, 2) // subfield length
    u16(hdr, 16, bsize - 1) // BSIZE - 1
    out.write(hdr)
    out.write(cbuf, 0, clen)
    val tr = new Array[Byte](8)
    u32(tr, 0, crc.getValue)
    u32(tr, 4, n.toLong)
    out.write(tr)
    cBytes += bsize
    n = 0
  }

  private var finished = false

  // the base class close() calls finish() then out.close() — the guard
  // keeps a finish()+close() sequence from emitting two EOF members
  override def finish(): Unit = if (!finished) {
    flushBlock()
    out.write(EofMarker)
    finished = true
  }

  override def resetState(): Unit = { n = 0; deflater.reset() }
}
