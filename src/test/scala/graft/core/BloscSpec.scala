package graft.core

import org.scalatest.funsuite.AnyFunSuite

class BloscSpec extends AnyFunSuite {

  test("shuffle/unshuffle roundtrip, incl. non-multiple tails") {
    for (n <- Seq(0, 1, 2, 3, 7, 16, 255, 256, 4096, 4097); ts <- Seq(1, 2, 4, 8)) {
      val src = Array.tabulate[Byte](n)(i => (i * 31 + 7).toByte)
      assert(Blosc.unshuffle(Blosc.shuffle(src, ts), ts).sameElements(src),
        s"n=$n ts=$ts")
    }
  }

  test("shuffle groups bytes by significance") {
    // uint16 LE [0x0100, 0x0302]: bytes 00 01 02 03 -> shuffled 00 02 01 03
    val src = Array[Byte](0x00, 0x01, 0x02, 0x03)
    assert(Blosc.shuffle(src, 2).toSeq == Seq[Byte](0x00, 0x02, 0x01, 0x03))
  }

  test("compress/decompress roundtrip on compressible data; header fields") {
    val pixels = Array.tabulate(128 * 128)(i => (i / 64) % 65536)
    val raw = PixelCodec.toBytes(pixels)
    val frame = Blosc.compress(raw, typesize = 2, clevel = 3)
    assert(frame.length < raw.length, "ramp data must compress")
    assert(Blosc.decompress(frame).sameElements(raw))
    val h = Blosc.header(frame)
    assert(h.nbytes == raw.length)
    assert(h.cbytes == frame.length)
    assert(h.typesize == 2)
    assert((h.flags & 0x01) != 0, "shuffle flag")
    assert((h.flags >> 5) == 4, "zstd compressor format id")
    assert(frame(0) == 2, "blosc format version")
  }

  test("incompressible data falls back to memcpy frame") {
    val rnd = new scala.util.Random(42)
    val raw = Array.fill[Byte](4096)(rnd.nextInt().toByte)
    val frame = Blosc.compress(raw, typesize = 2, clevel = 3)
    val h = Blosc.header(frame)
    if ((h.flags & 0x02) != 0) assert(frame.length == raw.length + 16)
    assert(Blosc.decompress(frame).sameElements(raw))
  }

  test("empty input") {
    val frame = Blosc.compress(Array.emptyByteArray)
    assert(Blosc.decompress(frame).isEmpty)
  }

  test("roundtrip over many sizes and contents") {
    for (seed <- 0 until 25) {
      val rnd = new scala.util.Random(seed)
      val n = rnd.nextInt(5000)
      val raw =
        if (seed % 2 == 0) Array.fill[Byte](n)(rnd.nextInt().toByte)            // noise
        else Array.tabulate[Byte](n)(i => ((i / 7) % 251).toByte)               // structured
      assert(Blosc.decompress(Blosc.compress(raw)).sameElements(raw), s"seed=$seed n=$n")
    }
  }

  test("header rejects bit-shuffle and foreign-compressor frames") {
    val frame = Blosc.compress(PixelCodec.toBytes(Array.tabulate(256)(i => i)), 2, 3)
    // flip in the bit-shuffle flag (0x04): produced by other blosc writers,
    // would decode silently wrong if accepted
    val bitShuffled = frame.clone()
    bitShuffled(2) = (bitShuffled(2) | 0x04).toByte
    intercept[UnsupportedOperationException](Blosc.decompress(bitShuffled))
    // lz4 compressor id (1) instead of zstd (4)
    val lz4 = frame.clone()
    lz4(2) = ((lz4(2) & 0x1F) | (1 << 5)).toByte
    intercept[UnsupportedOperationException](Blosc.decompress(lz4))
    // memcpy frames decode regardless of compressor id
    val mem = Blosc.compress(Array.fill[Byte](64)(new scala.util.Random(7).nextInt().toByte))
    assert(Blosc.decompress(mem).length == 64)
  }

  test("uint16 pixel codec roundtrip with unsigned values") {
    val px = Array(0, 1, 32767, 32768, 65535, 65534)
    assert(PixelCodec.toInts(PixelCodec.toBytes(px)).sameElements(px))
  }
}
