package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{Spark, Tables}

class MediaOpsSpec extends AnyFunSuite {

  private lazy val spark = Spark.session(master = "local[4]", shufflePartitions = 4,
    appName = "graft-media-test")

  test("binary wrap -> per-kind codec -> features is deterministic and complete") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val media = MediaOps.asMediaReal(docs)
    val feats = MediaOps.extractFeaturesReal(media).collect()
    assert(feats.length == docs.count())
    feats.foreach { f =>
      assert(Set("image", "audio", "video")(f.kind))
      assert(f.n_bytes > 0)
      f.kind match {
        case "image" =>
          // REAL javax.imageio decode of the gradient PNG: dims keyed by
          // media_id, n_bytes = decoded size
          val (w, h) = (16 + (f.media_id % 16).toInt, 12 + (f.media_id % 8).toInt)
          assert(f.n_frames == 1 && f.width == w && f.height == h)
          assert(f.n_bytes == w.toLong * h)
          val expected = (for (y <- 0 until h; x <- 0 until w)
            yield ((3 * x + 7 * y + f.media_id) % 256)).sum
          assert(f.checksum == expected)
        case "audio" => assert(f.width == 1 && f.height == 1 && f.n_frames >= 1)
        case _       => assert(f.width == 320 && f.height == 240 && f.n_frames >= 1)
      }
      assert(f.checksum > 0)
    }
    // kind assignment is by media_id mod 3
    assert(feats.forall(f => f.kind == Seq("image", "audio", "video")((f.media_id % 3).toInt)))
  }

  /** A real PNG: TYPE_BYTE_GRAY gradient v(x,y) = (7x + 13y) mod 256,
    * encoded through javax.imageio — so expected luminance equals the
    * source gray value exactly (gray g maps to rgb (g,g,g); the 601
    * weights sum to 1000). */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (7 * x + 13 * y) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Color variant exercising the RGB->luma path: rgb (g,g,g) has luma
    * exactly g (the 601 weights sum to 1000). */
  private def colorPngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = (7 * x + 13 * y) % 256
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("REAL codec: PNG decodes through the same mapPartitions plumbing") {
    import spark.implicits._
    val media = Seq(
      MediaOps.MediaRecord(0L, "image", pngBytes(20, 10)),
      MediaOps.MediaRecord(1L, "image", pngBytes(33, 7)),
      MediaOps.MediaRecord(2L, "image", colorPngBytes(20, 10))).toDS()
    val feats = MediaOps.extractFeaturesImageIo(media).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats(0L).width == 20 && feats(0L).height == 10 && feats(0L).n_frames == 1)
    assert(feats(1L).width == 33 && feats(1L).height == 7)
    // checksum is the sum of DECODED luminance, not of payload bytes
    val expected0 = (for (y <- 0 until 10; x <- 0 until 20)
      yield ((7 * x + 13 * y) % 256).toLong).sum
    assert(feats(0L).checksum == expected0,
      s"decoded-pixel checksum ${feats(0L).checksum} != $expected0")
    assert(feats(0L).n_bytes == pngBytes(20, 10).length.toLong) // container size, not w*h
    // the color image carries the same pattern in (g,g,g) — identical luma
    assert(feats(2L).checksum == expected0,
      s"color-path checksum ${feats(2L).checksum} != $expected0")
  }

  test("REAL codec: nearest-neighbor resize over decoded pixels") {
    import spark.implicits._
    val media = Seq(MediaOps.MediaRecord(5L, "image", pngBytes(16, 16))).toDS()
    val r = MediaOps.resizeImagesImageIo(media, 8, 4).collect().head
    assert(r.out_w == 8 && r.out_h == 4 && r.pixels.length == 32)
    for (j <- 0 until 4; i <- 0 until 8) {
      val (sx, sy) = (i * 16 / 8, j * 16 / 4)
      val expect = ((7 * sx + 13 * sy) % 256).toByte
      assert(r.pixels(j * 8 + i) == expect, s"pixel ($i,$j)")
    }
  }

  test("REAL codec: undecodable payload fails loudly, never zero-fills") {
    import spark.implicits._
    val media = Seq(MediaOps.MediaRecord(9L, "image", Array[Byte](1, 2, 3))).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      MediaOps.extractFeaturesImageIo(media).collect()
    }
    assert(e.getMessage.contains("not a decodable image") ||
      Option(e.getCause).exists(_.getMessage.contains("not a decodable image")))
  }

  test("frame sampling emits stride-spaced frame metadata only for videos") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val frames = MediaOps.sampleFrames(MediaOps.asMedia(docs), stride = 10).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 10 == 0))
    assert(frames.forall(f => f.media_id % 3 == 2))
    assert(frames.forall(f => f.frame_off == f.frame_idx.toLong * 50))
  }
}
