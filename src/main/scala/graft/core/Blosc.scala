package graft.core

import com.github.luben.zstd.Zstd

/** Blosc v1 frame codec (zstd + byte-shuffle), pure JVM.
  *
  * Re-implements, from the public c-blosc 1.x container format, the codec
  * the reference configures as `Blosc(cname="zstd", clevel=3,
  * shuffle=SHUFFLE)` (`zeiss_job.py:89-101`, `models.py:52-56`) so our Zarr
  * chunks carry the same framing numcodecs expects (SURVEY.md §7.5 hard
  * part #3).
  *
  * Frame layout (all ints little-endian):
  * {{{
  *   byte  0      format version (2)
  *   byte  1      codec format version (1)
  *   byte  2      flags: 0x01 byte-shuffle | 0x02 memcpy | 0x04 bit-shuffle
  *                       | compressor-format-id << 5 (zstd = 4)
  *   byte  3      typesize
  *   bytes 4-7    nbytes   (uncompressed length)
  *   bytes 8-11   blocksize
  *   bytes 12-15  cbytes   (total frame length)
  *   then, unless memcpy flag:
  *     int32 * nblocks     block start offsets (from frame start)
  *     per block: int32 csize, then the zstd stream for that block
  *                (csize == block's uncompressed size => stored raw)
  *   with memcpy flag: the raw (unshuffled) bytes follow the header.
  * }}}
  *
  * We always emit a single block (blocksize = nbytes); the decoder accepts
  * any block count/size. Shuffle is applied per block, matching c-blosc.
  */
object Blosc {
  private val Version: Byte = 2
  private val VersionLz: Byte = 1
  private val FlagShuffle = 0x01
  private val FlagMemcpy = 0x02
  private val ZstdFormatId = 4

  final case class Header(flags: Int, typesize: Int, nbytes: Int, blocksize: Int, cbytes: Int)

  private def writeLE(buf: Array[Byte], off: Int, v: Int): Unit = {
    buf(off) = (v & 0xFF).toByte
    buf(off + 1) = ((v >>> 8) & 0xFF).toByte
    buf(off + 2) = ((v >>> 16) & 0xFF).toByte
    buf(off + 3) = ((v >>> 24) & 0xFF).toByte
  }

  private def readLE(buf: Array[Byte], off: Int): Int =
    (buf(off) & 0xFF) | ((buf(off + 1) & 0xFF) << 8) |
      ((buf(off + 2) & 0xFF) << 16) | ((buf(off + 3) & 0xFF) << 24)

  /** Byte-shuffle (transpose element bytes). A trailing remainder of
    * length `n % typesize` is copied through unshuffled, as in c-blosc. */
  def shuffle(src: Array[Byte], typesize: Int): Array[Byte] = {
    val n = src.length
    if (typesize <= 1 || n < typesize) return src.clone()
    val nElems = n / typesize
    val tail = n - nElems * typesize
    val out = new Array[Byte](n)
    var j = 0
    while (j < typesize) {
      var i = 0
      val base = j * nElems
      while (i < nElems) {
        out(base + i) = src(i * typesize + j)
        i += 1
      }
      j += 1
    }
    if (tail > 0) System.arraycopy(src, n - tail, out, n - tail, tail)
    out
  }

  /** Inverse of [[shuffle]]. */
  def unshuffle(src: Array[Byte], typesize: Int): Array[Byte] = {
    val n = src.length
    if (typesize <= 1 || n < typesize) return src.clone()
    val nElems = n / typesize
    val tail = n - nElems * typesize
    val out = new Array[Byte](n)
    var j = 0
    while (j < typesize) {
      var i = 0
      val base = j * nElems
      while (i < nElems) {
        out(i * typesize + j) = src(base + i)
        i += 1
      }
      j += 1
    }
    if (tail > 0) System.arraycopy(src, n - tail, out, n - tail, tail)
    out
  }

  /** Compress `raw` into a Blosc frame. */
  def compress(raw: Array[Byte], typesize: Int = 2, clevel: Int = 3, doShuffle: Boolean = true): Array[Byte] = {
    val nbytes = raw.length
    if (nbytes == 0) {
      val out = new Array[Byte](16)
      out(0) = Version; out(1) = VersionLz
      out(2) = ((ZstdFormatId << 5) | FlagMemcpy).toByte
      out(3) = typesize.toByte
      writeLE(out, 4, 0); writeLE(out, 8, 0); writeLE(out, 12, 16)
      return out
    }
    val shuffled = if (doShuffle) shuffle(raw, typesize) else raw
    val z = Zstd.compress(shuffled, clevel)
    val compressedLen = z.length
    // header(16) + bstarts(4) + blockLen(4) + stream
    if (16 + 4 + 4 + compressedLen >= 16 + nbytes) {
      // compression not worth it: memcpy frame (raw, unshuffled payload)
      val out = new Array[Byte](16 + nbytes)
      out(0) = Version; out(1) = VersionLz
      out(2) = ((ZstdFormatId << 5) | FlagMemcpy).toByte
      out(3) = typesize.toByte
      writeLE(out, 4, nbytes); writeLE(out, 8, nbytes); writeLE(out, 12, 16 + nbytes)
      System.arraycopy(raw, 0, out, 16, nbytes)
      out
    } else {
      val total = 16 + 4 + 4 + compressedLen
      val out = new Array[Byte](total)
      out(0) = Version; out(1) = VersionLz
      out(2) = ((ZstdFormatId << 5) | (if (doShuffle) FlagShuffle else 0)).toByte
      out(3) = typesize.toByte
      writeLE(out, 4, nbytes); writeLE(out, 8, nbytes); writeLE(out, 12, total)
      writeLE(out, 16, 20)            // bstarts[0]: block starts right after
      writeLE(out, 20, compressedLen) // per-block compressed length
      System.arraycopy(z, 0, out, 24, compressedLen)
      out
    }
  }

  private val FlagBitshuffle = 0x04

  def header(frame: Array[Byte]): Header = {
    require(frame.length >= 16, s"blosc frame too short: ${frame.length}")
    val h = Header(frame(2) & 0xFF, frame(3) & 0xFF, readLE(frame, 4), readLE(frame, 8), readLE(frame, 12))
    // refuse frames we cannot decode faithfully rather than producing
    // silently-wrong bytes: bit-shuffle is a different filter, and block
    // payloads from non-zstd codecs are not zstd streams
    if ((h.flags & FlagMemcpy) == 0) {
      if ((h.flags & FlagBitshuffle) != 0)
        throw new UnsupportedOperationException(
          "blosc frame uses bit-shuffle (flag 0x04); only byte-shuffle is supported")
      val compId = h.flags >>> 5
      if (compId != ZstdFormatId)
        throw new UnsupportedOperationException(
          s"blosc frame uses compressor id $compId; only zstd ($ZstdFormatId) is supported")
    }
    h
  }

  /** Decompress a Blosc frame (any block count; zstd payloads). */
  def decompress(frame: Array[Byte]): Array[Byte] = {
    val h = header(frame)
    if (h.nbytes == 0) return Array.emptyByteArray
    if ((h.flags & FlagMemcpy) != 0) {
      val out = new Array[Byte](h.nbytes)
      System.arraycopy(frame, 16, out, 0, h.nbytes)
      return out
    }
    val blocksize = if (h.blocksize > 0) h.blocksize else h.nbytes
    val nblocks = ((h.nbytes.toLong + blocksize - 1) / blocksize).toInt
    val out = new Array[Byte](h.nbytes)
    val doShuffle = (h.flags & FlagShuffle) != 0
    var k = 0
    while (k < nblocks) {
      val neblock = math.min(blocksize, h.nbytes - k * blocksize)
      val bstart = readLE(frame, 16 + 4 * k)
      val csize = readLE(frame, bstart)
      val block =
        if (csize == neblock) java.util.Arrays.copyOfRange(frame, bstart + 4, bstart + 4 + neblock)
        else {
          val dst = new Array[Byte](neblock)
          val n = Zstd.decompressByteArray(dst, 0, neblock, frame, bstart + 4, csize)
          require(n == neblock, s"zstd decoded $n of expected $neblock bytes")
          dst
        }
      val plain = if (doShuffle) unshuffle(block, h.typesize) else block
      System.arraycopy(plain, 0, out, k * blocksize, neblock)
      k += 1
    }
    out
  }
}
