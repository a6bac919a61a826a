package graft.sources.czi

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

/** Structure-level fixtures for the partial JPEG-XR reader: a container +
  * IMAGE_HEADER built field-by-field per the published T.832 layout (the
  * entropy payload is deliberately absent — that layer is the documented
  * unsupported remainder). */
class JpegXrSpec extends AnyFunSuite {

  /** Encode the §8.3 IMAGE_HEADER flag block + dimensions + the §8.4
    * plane-header byte for an untiled, no-overlap, short-header,
    * 16-bit grayscale stream. */
  private def codestream(w: Int, h: Int): Array[Byte] = {
    val bits = new StringBuilder
    def u(v: Int, n: Int): Unit = bits.append(
      String.format(s"%${n}s", Integer.toBinaryString(v)).replace(' ', '0'))
    u(0, 4)  // RESERVED_B
    u(0, 1)  // HARD_TILING
    u(0, 3)  // RESERVED_C
    u(0, 1)  // TILING
    u(0, 1)  // FREQUENCY_MODE
    u(0, 3)  // SPATIAL_XFRM_SUBORDINATE
    u(0, 1)  // INDEX_TABLE_PRESENT
    u(0, 2)  // OVERLAP_MODE = none
    u(1, 1)  // SHORT_HEADER
    u(0, 1)  // LONG_WORD
    u(0, 1)  // WINDOWING
    u(0, 1)  // TRIM_FLEXBITS
    u(0, 1)  // RESERVED_D
    u(0, 1)  // RED_BLUE_NOT_SWAPPED
    u(0, 1)  // PREMULTIPLIED_ALPHA
    u(0, 1)  // ALPHA_IMAGE_PLANE
    u(8, 4)  // OUTPUT_CLR_FMT (8 = YONLY per container-free grayscale use)
    u(15, 4) // OUTPUT_BITDEPTH code
    u(w - 1, 16)
    u(h - 1, 16)
    // IMAGE_PLANE_HEADER: INTERNAL_CLR_FMT=0 (YONLY), SCALED=0, BANDS=0 (all)
    u(0, 3); u(0, 1); u(0, 4)
    val s = bits.toString
    val padded = s + "0" * ((8 - s.length % 8) % 8)
    val body = padded.grouped(8).map(b => Integer.parseInt(b, 2).toByte).toArray
    "WMPHOTO".getBytes("US-ASCII") ++ Array[Byte](0) ++ body
  }

  /** Wrap a codestream in the TIFF-style container (`II BC 01` + IFD). */
  private def container(cs: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val guidOff = 8 + 2 + 5 * 12 + 4 // header + count + entries + next-IFD
    val csOff = guidOff + 16
    val bb = ByteBuffer.allocate(csOff + cs.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(0x49.toByte).put(0x49.toByte).put(0xBC.toByte).put(0x01.toByte)
    bb.putInt(8) // IFD offset
    bb.putShort(5)
    def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
      bb.putShort(tag.toShort); bb.putShort(typ.toShort)
      bb.putInt(count); bb.putInt(value)
    }
    entry(0xBC01, 1, 16, guidOff)      // PIXEL_FORMAT -> GUID offset
    entry(0xBC80, 4, 1, w)             // IMAGE_WIDTH
    entry(0xBC81, 4, 1, h)             // IMAGE_HEIGHT
    entry(0xBCC0, 4, 1, csOff)         // IMAGE_OFFSET
    entry(0xBCC1, 4, 1, cs.length)     // IMAGE_BYTE_COUNT
    bb.putInt(0)                       // next IFD
    // 16bppGray pixel-format GUID family: last byte 0x0B
    bb.put(Array.tabulate[Byte](16)(i => if (i == 15) 0x0B else i.toByte))
    bb.put(cs)
    bb.array()
  }

  test("container parse: IFD entries locate the codestream and pixel format") {
    val cs = codestream(640, 480)
    val c = JpegXr.parseContainer(container(cs, 640, 480))
    assert(c.width == 640 && c.height == 480)
    assert(c.codestreamLength == cs.length)
    assert(c.pixelFormatLastByte == 0x0B)
  }

  test("IMAGE_HEADER parse: flags, dimensions, plane header") {
    val h = JpegXr.parseHeader(codestream(1920, 1080), 0)
    assert(h.widthMinus1 == 1919 && h.heightMinus1 == 1079)
    assert(h.shortHeader && !h.tiling && !h.frequencyMode && h.overlapMode == 0)
    assert(h.outputClrFmt == 8 && h.outputBitdepth == 15)
    assert(h.internalClrFmt == 0 && !h.scaled && h.bandsPresent == 0)
  }

  test("decode fails loudly with the parsed stream configuration") {
    val payload = container(codestream(512, 512), 512, 512)
    val e = intercept[UnsupportedOperationException] { JpegXr.decode(payload) }
    assert(e.getMessage.contains("512x512"), e.getMessage)
    assert(e.getMessage.contains("entropy decoding is not implemented"), e.getMessage)
    assert(e.getMessage.contains("zstd"), e.getMessage)
  }

  test("a JPEG-XR CZI subblock surfaces the configuration, not a bare code") {
    val e = CziFormat.SubBlockEntry(0L, CziFormat.PixelGray16, CziFormat.CompressionJpgXr,
      Map("X" -> CziFormat.DimEntry("X", 0, 64, 64), "Y" -> CziFormat.DimEntry("Y", 0, 64, 64)))
    val payload = container(codestream(64, 64), 64, 64)
    val ex = intercept[UnsupportedOperationException] { CziReader.decode(payload, e) }
    assert(ex.getMessage.contains("64x64") && ex.getMessage.contains("JPEG-XR"), ex.getMessage)
  }

  test("garbage payloads are reported as unparseable, still loudly") {
    val ex = intercept[UnsupportedOperationException] {
      JpegXr.decode(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9))
    }
    assert(ex.getMessage.contains("unparseable"), ex.getMessage)
  }
}
