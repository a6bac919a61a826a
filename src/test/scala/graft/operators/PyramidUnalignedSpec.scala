package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.Spark
import graft.core.{ChunkGrid, PixelCodec, Volume, ZarrChunk}
import graft.sources.SyntheticStack

/** The unaligned pyramid path: windows spanning chunk boundaries must
  * give the exact same results as a whole-array brute-force reference. */
class PyramidUnalignedSpec extends AnyFunSuite {

  private lazy val spark = Spark.session(master = "local[4]", shufflePartitions = 4,
    appName = "graft-unaligned-test")

  /** brute-force level-1 over the whole array (ceil windows, floor mean) */
  private def brute(shape: Array[Int], f: Int): Array[Int] = {
    val (oz, oy, ox) = ((shape(0) + f - 1) / f, (shape(1) + f - 1) / f, (shape(2) + f - 1) / f)
    val out = new Array[Int](oz * oy * ox)
    for (z <- 0 until oz; y <- 0 until oy; x <- 0 until ox) {
      var sum = 0L; var n = 0
      for (dz <- z * f until math.min(z * f + f, shape(0));
           dy <- y * f until math.min(y * f + f, shape(1));
           dx <- x * f until math.min(x * f + f, shape(2))) {
        sum += SyntheticStack.value(dz, dy, dx); n += 1
      }
      out(z * oy * ox + y * ox + x) = (sum / n).toInt
    }
    out
  }

  test("chunk 5^3 over an 11^3 array, factor 2: spanning windows are exact") {
    val vol = Volume("un", 0, Array(1L, 1L, 11L, 11L, 11L), Array(1, 1, 5, 5, 5))
    val l0 = SyntheticStack.generate(spark, vol)
    val (v1, d1) = Pyramid.downsampleLevel(spark, l0, vol, Array(2, 2, 2))
    assert(v1.shape.toSeq == Seq(1L, 1L, 6L, 6L, 6L))
    val want = brute(Array(11, 11, 11), 2)
    val got = new Array[Int](6 * 6 * 6)
    d1.collect().foreach { ck =>
      val px = ck.pixels
      for (z <- 0 until ck.shape(2); y <- 0 until ck.shape(3); x <- 0 until ck.shape(4))
        got((ck.z * 5 + z) * 36 + (ck.y * 5 + y) * 6 + (ck.x * 5 + x)) =
          px(z * ck.shape(3) * ck.shape(4) + y * ck.shape(4) + x)
    }
    assert(got.sameElements(want))
  }

  test("aligned config: unaligned path equals the fast path chunk-for-chunk") {
    val vol = Volume("eq", 0, Array(1L, 1L, 12L, 12L, 12L), Array(1, 1, 4, 4, 4))
    val l0 = SyntheticStack.generate(spark, vol)
    val fast = Pyramid.downsampleLevel(spark, l0, vol, Array(2, 2, 2))._2.collect()
      .map(c => ((c.z, c.y, c.x), c)).toMap
    val gen = Pyramid.downsampleLevelUnaligned(spark, l0, vol, Array(2, 2, 2))._2.collect()
    assert(gen.length == fast.size)
    gen.foreach { ck =>
      val ref = fast((ck.z, ck.y, ck.x))
      assert(ck.shape.toSeq == ref.shape.toSeq)
      assert(ck.data.sameElements(ref.data), s"chunk ${ck.z},${ck.y},${ck.x}")
    }
  }

  test("factor 3 with non-multiple chunk: still exact") {
    val vol = Volume("f3", 0, Array(1L, 1L, 10L, 10L, 10L), Array(1, 1, 4, 4, 4))
    val l0 = SyntheticStack.generate(spark, vol)
    val (v1, d1) = Pyramid.downsampleLevel(spark, l0, vol, Array(3, 3, 3))
    assert(v1.shape.toSeq == Seq(1L, 1L, 4L, 4L, 4L))
    val want = brute(Array(10, 10, 10), 3)
    val got = new Array[Int](64)
    d1.collect().foreach { ck =>
      val px = ck.pixels
      for (z <- 0 until ck.shape(2); y <- 0 until ck.shape(3); x <- 0 until ck.shape(4))
        got((ck.z * 4 + z) * 16 + (ck.y * 4 + y) * 4 + (ck.x * 4 + x)) =
          px(z * ck.shape(3) * ck.shape(4) + y * ck.shape(4) + x)
    }
    assert(got.sameElements(want))
  }
}
