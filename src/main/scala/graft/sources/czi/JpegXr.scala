package graft.sources.czi

import java.nio.{ByteBuffer, ByteOrder}

/** Partial JPEG-XR (ITU-T T.832 / HD Photo) reader: container + codestream
  * header parsing, with a LOUD failure at the entropy-coded image data.
  *
  * Why partial: production Zeiss acquisitions commonly compress CZI
  * subblocks as JPEG-XR (compression id 4), which the reference decodes
  * transparently through czifile -> imagecodecs (`utils.py:231-281`).
  * Decoding the coded payload requires T.832's adaptive-VLC code tables,
  * CBP prediction state machines and the two-level lapped transform —
  * material that is only normative in the T.832 text itself, which is not
  * available in this offline build environment. Reconstructing those
  * tables from memory would produce a codec that *claims* to be JPEG-XR
  * without being verifiable against one (the stage-by-stage analysis,
  * the exact missing normative material, and the unblock plan are in
  * `docs/JPEGXR_FEASIBILITY.md`), so this module deliberately
  * stops at the layer it can implement faithfully:
  *
  *   - the JPEG-XR file container (TIFF-style little-endian IFD,
  *     signature `II 0xBC 0x01`): pixel-format GUID, image dimensions,
  *     codestream offset/length;
  *   - the codestream `IMAGE_HEADER` (§8.3: the `WMPHOTO\0` GDI
  *     signature and the 32-bit flag block — tiling, frequency mode,
  *     overlap mode, short-header, windowing — followed by the sized
  *     width/height fields);
  *   - `IMAGE_PLANE_HEADER` (§8.4) through INTERNAL_CLR_FMT /
  *     SCALED_FLAG / BANDS_PRESENT.
  *
  * Everything parsed is surfaced in the rejection message, so a scan
  * hitting a JPEG-XR subblock reports *what* the stream is (dimensions,
  * internal color format, overlap/tiling configuration) and *exactly
  * which layer* is unsupported, instead of a bare "compression 4".
  * Header field layout follows the published T.832 structure; the flag
  * block totals exactly 32 bits, which the parser asserts by
  * construction.
  */
object JpegXr {

  /** Container-level info: where the codestream lives. */
  final case class Container(codestreamOffset: Long, codestreamLength: Long,
                             pixelFormatLastByte: Int, width: Long, height: Long)

  /** Codestream IMAGE_HEADER + IMAGE_PLANE_HEADER summary. */
  final case class Header(
      widthMinus1: Long, heightMinus1: Long,
      hardTiling: Boolean, tiling: Boolean, frequencyMode: Boolean,
      indexTablePresent: Boolean, overlapMode: Int, shortHeader: Boolean,
      longWord: Boolean, windowing: Boolean, trimFlexbits: Boolean,
      alphaPlane: Boolean, outputClrFmt: Int, outputBitdepth: Int,
      internalClrFmt: Int, scaled: Boolean, bandsPresent: Int) {
    def describe: String =
      s"${widthMinus1 + 1}x${heightMinus1 + 1}, " +
      s"outputClrFmt=$outputClrFmt, outputBitdepth=$outputBitdepth, " +
      s"internalClrFmt=$internalClrFmt, scaled=$scaled, bandsPresent=$bandsPresent, " +
      s"overlapMode=$overlapMode, tiling=$tiling, frequencyMode=$frequencyMode, " +
      s"trimFlexbits=$trimFlexbits, alphaPlane=$alphaPlane"
  }

  // container IFD tags (JPEG-XR file format; TIFF entry layout)
  private val TagPixelFormat = 0xBC01
  private val TagImageWidth = 0xBC80
  private val TagImageHeight = 0xBC81
  private val TagImageOffset = 0xBCC0
  private val TagImageByteCount = 0xBCC1

  /** Parse the TIFF-style container: `II BC 01`, IFD offset, 12-byte
    * entries (tag u16, type u16, count u32, value-or-offset u32). */
  def parseContainer(bytes: Array[Byte]): Container = {
    require(bytes.length >= 8, "truncated JPEG-XR container")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require((bb.get(0) & 0xFF) == 0x49 && (bb.get(1) & 0xFF) == 0x49 &&
            (bb.get(2) & 0xFF) == 0xBC,
      f"not a JPEG-XR container (magic ${bb.get(0)}%02x ${bb.get(1)}%02x ${bb.get(2)}%02x)")
    val ifdOff = bb.getInt(4).toLong & 0xFFFFFFFFL
    require(ifdOff + 2 <= bytes.length, s"IFD offset $ifdOff beyond payload")
    val nEntries = bb.getShort(ifdOff.toInt) & 0xFFFF
    var (off, len, pf, w, h) = (-1L, -1L, -1, -1L, -1L)
    for (i <- 0 until nEntries) {
      val e = ifdOff.toInt + 2 + 12 * i
      require(e + 12 <= bytes.length, "truncated IFD entry")
      val tag = bb.getShort(e) & 0xFFFF
      val value = bb.getInt(e + 8).toLong & 0xFFFFFFFFL
      tag match {
        case TagImageOffset    => off = value
        case TagImageByteCount => len = value
        case TagImageWidth     => w = value
        case TagImageHeight    => h = value
        case TagPixelFormat =>
          // value is the offset of the 16-byte GUID; the variant is its
          // last byte (0x08 = 24bpp RGB, 0x0A/0x0B = 8/16-bit grayscale)
          if (value + 16 <= bytes.length) pf = bb.get(value.toInt + 15) & 0xFF
        case _ => ()
      }
    }
    require(off >= 0 && len > 0, "container has no IMAGE_OFFSET/IMAGE_BYTE_COUNT")
    require(off + len <= bytes.length, s"codestream [$off, ${off + len}) beyond payload")
    Container(off, len, pf, w, h)
  }

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var bit = 0
    def u(n: Int): Long = {
      var v = 0L
      var left = n
      while (left > 0) {
        val b = bytes(pos) & 0xFF
        val avail = 8 - bit
        val take = math.min(avail, left)
        v = (v << take) | ((b >>> (avail - take)) & ((1 << take) - 1))
        bit += take
        if (bit == 8) { bit = 0; pos += 1 }
        left -= take
      }
      v
    }
  }

  /** The `WMPHOTO\0` GDI signature. */
  private val GdiSig = Array[Byte](0x57, 0x4D, 0x50, 0x48, 0x4F, 0x54, 0x4F, 0x00)

  /** Parse IMAGE_HEADER (+ the leading fixed part of IMAGE_PLANE_HEADER)
    * starting at `off` in `bytes`. */
  def parseHeader(bytes: Array[Byte], off: Int): Header = {
    require(off + 8 <= bytes.length &&
      (0 until 8).forall(i => bytes(off + i) == GdiSig(i)),
      "codestream does not start with the WMPHOTO GDI signature")
    val r = new BitReader(bytes, off + 8)
    // the §8.3 flag block — 4+1+3+1+1+3+1+2+1+1+1+1+1+1+1+1+4+4 = 32 bits
    r.u(4)                               // RESERVED_B
    val hardTiling = r.u(1) == 1
    r.u(3)                               // RESERVED_C
    val tiling = r.u(1) == 1
    val frequencyMode = r.u(1) == 1
    r.u(3)                               // SPATIAL_XFRM_SUBORDINATE
    val indexTable = r.u(1) == 1
    val overlapMode = r.u(2).toInt
    val shortHeader = r.u(1) == 1
    val longWord = r.u(1) == 1
    val windowing = r.u(1) == 1
    val trimFlexbits = r.u(1) == 1
    r.u(1)                               // RESERVED_D
    r.u(1)                               // RED_BLUE_NOT_SWAPPED
    r.u(1)                               // PREMULTIPLIED_ALPHA
    val alphaPlane = r.u(1) == 1
    val outputClrFmt = r.u(4).toInt
    val outputBitdepth = r.u(4).toInt
    val dimBits = if (shortHeader) 16 else 32
    val wM1 = r.u(dimBits)
    val hM1 = r.u(dimBits)
    if (tiling) {
      val nVert = r.u(12).toInt
      val nHor = r.u(12).toInt
      val sz = if (shortHeader) 8 else 16
      (0 until nVert).foreach(_ => r.u(sz))
      (0 until nHor).foreach(_ => r.u(sz))
    }
    if (windowing) (0 until 4).foreach(_ => r.u(6))
    // IMAGE_PLANE_HEADER leading byte (§8.4)
    val internalClrFmt = r.u(3).toInt
    val scaled = r.u(1) == 1
    val bandsPresent = r.u(4).toInt
    Header(wM1, hM1, hardTiling, tiling, frequencyMode, indexTable, overlapMode,
      shortHeader, longWord, windowing, trimFlexbits, alphaPlane,
      outputClrFmt, outputBitdepth, internalClrFmt, scaled, bandsPresent)
  }

  /** Describe a JPEG-XR payload (container optional — a bare codestream
    * starting with the GDI signature is accepted too). */
  def describe(bytes: Array[Byte]): String = {
    val isBare = bytes.length >= 8 && (0 until 8).forall(i => bytes(i) == GdiSig(i))
    if (isBare) s"bare codestream: ${parseHeader(bytes, 0).describe}"
    else {
      val c = parseContainer(bytes)
      val h = parseHeader(bytes, c.codestreamOffset.toInt)
      s"container (pixelFormat ..${f"${c.pixelFormatLastByte}%02x"}, " +
        s"codestream ${c.codestreamLength} B): ${h.describe}"
    }
  }

  /** Always throws: the coded payload needs T.832's normative code
    * tables (see class doc). The message carries the full parsed stream
    * configuration so operators know what file hit the gap. */
  def decode(bytes: Array[Byte]): Array[Byte] = {
    val desc =
      try describe(bytes)
      catch {
        // a truncated codestream can also surface as the BitReader or a
        // GUID read running off the array — still "unparseable", never a
        // bare index error escaping the scan
        case e: IllegalArgumentException => s"unparseable (${e.getMessage})"
        case e: IndexOutOfBoundsException => s"unparseable (truncated: ${e.getMessage})"
      }
    throw new UnsupportedOperationException(
      s"JPEG-XR subblock ($desc): entropy decoding is not implemented — " +
      "T.832's adaptive-VLC code tables are unavailable in this offline build; " +
      "supported CZI codecs: raw, zstd0, zstd1. Remediation: losslessly " +
      "transcode with an external tool (e.g. 'czicompress --command " +
      "decompress') to <base>.transcoded.czi next to the original — " +
      "CziSource.resolveInput picks the sidecar up automatically")
  }
}
