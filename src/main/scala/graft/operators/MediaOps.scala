package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque BINARY columns
  * with typed metadata, decoded/feature-extracted in batched
  * `mapPartitions` passes.
  *
  * The codec boundary is per KIND: image rows decode through the REAL
  * JDK codec (`ImageIoCodec`, javax.imageio — ships in every JRE), from
  * container bytes to pixels. `StubCodec`'s remit is ONLY audio/video —
  * this container ships no codec for those — deriving deterministic
  * "decoded" properties from the payload bytes so the plumbing (schema,
  * partition-level batch iteration, feature struct output) still runs
  * and gates end-to-end. Swapping in a real audio/video decoder changes
  * one function, not the pipeline.
  *
  * Scale design: decode runs as one narrow `mapPartitions` over the media
  * Dataset — no shuffle, no driver involvement, memory bounded by one
  * record at a time (payloads stream through; features are tiny). Frame
  * sampling explodes only sampled frame indices (metadata rows), never
  * decoded frame payloads.
  */
object MediaOps {

  final case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, checksum: Long)

  final case class FrameSample(media_id: Long, frame_idx: Int, frame_off: Long)

  /** STUB codec — deterministic stand-in for AUDIO/VIDEO decode only
    * (image rows always take [[ImageIoCodec]]); a real implementation
    * would parse the container format here. */
  object StubCodec {
    /** "Decode" dimensions from payload size: fake but deterministic and
      * recomputable by the DuckDB oracle from octet_length. */
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int) = {
      val n = payload.length
      kind match {
        case "audio" => (1, 1, n / 100 + 1)          // "samples/100" frames
        case _       => (320, 240, n / 50 + 1)        // "video": frame per 50 bytes
      }
    }

    /** Byte-sum checksum (the stand-in for pixel statistics). */
    def checksum(payload: Array[Byte]): Long = {
      var s = 0L
      var i = 0
      while (i < payload.length) { s += payload(i) & 0xFF; i += 1 }
      s
    }
  }

  /** REAL image codec over JDK `javax.imageio` — PNG/BMP/GIF readers ship
    * in every JRE, no external libraries. The codec boundary is per KIND,
    * not per query: EVERY image row — m1's features, m3's resize, m4's
    * aHash, and the m5-m8 gates — decodes real PNG container bytes
    * through this codec (`MediaQueries` routes them via
    * `extractFeaturesReal` / `resizeImagesImageIo`). The oracles stay
    * value-level because the payloads are deterministic synthetic
    * gradients (`syntheticGrayPng`) whose decoded pixel statistics have
    * a closed form DuckDB can recompute. [[StubCodec]] serves ONLY the
    * audio/video rows (m1's non-image kinds, m2's frame sampling),
    * whose oracle features are payload-length-derived. */
  object ImageIoCodec {
    /** Decode to 8-bit luminance (ITU-R 601 integer weights); loud
      * failure on undecodable payloads — a corrupt image in a 100 TB
      * corpus should surface, not silently zero-fill. */
    def decodeLuma(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
      // a bare InputStream gets wrapped in a FileCacheImageInputStream —
      // a temp FILE per decoded image (measured as bench spread on the
      // 400-image gate). The payload is already in memory: wrap it in a
      // memory-cached stream locally instead of flipping the
      // process-global ImageIO.setUseCache default under other users
      // ImageIO.read(ImageInputStream) closes the stream itself (a
      // second close() throws "closed"), so no finally here
      val img = javax.imageio.ImageIO.read(
        new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(payload)))
      require(img != null, s"payload of ${payload.length} bytes is not a decodable image")
      val (w, h) = (img.getWidth, img.getHeight)
      val out = new Array[Byte](w * h)
      val raster = img.getRaster
      val grayBand = raster.getNumBands == 1
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val luma =
            if (grayBand)
              // single-band (grayscale) images: the raw sample value —
              // getRGB would run the linear-gray -> sRGB conversion and
              // silently gamma-shift every pixel
              raster.getSample(x, y, 0)
            else {
              val rgb = img.getRGB(x, y)
              (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
                (rgb & 0xFF) * 114) / 1000
            }
          out(y * w + x) = luma.toByte
          x += 1
        }
        y += 1
      }
      (w, h, out)
    }
  }

  /** Image-only feature extraction with the REAL codec: width/height
    * from the decoded image, checksum over decoded luminance (actual
    * pixel statistics). Same narrow no-shuffle partition pass as
    * [[extractFeaturesReal]], without the per-kind dispatch. */
  def extractFeaturesImageIo(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (w, h, px) = ImageIoCodec.decodeLuma(m.payload)
        MediaFeatures(m.media_id, m.kind, m.payload.length.toLong, w, h, 1,
          StubCodec.checksum(px))
      }
    }
  }

  /** Nearest-neighbor resize with the REAL codec: decoded pixels in, a
    * REAL binary thumbnail column out, built row-local inside
    * mapPartitions (no shuffle, memory bounded by one output image). */
  def resizeImagesImageIo(media: Dataset[MediaRecord], outW: Int, outH: Int): Dataset[ResizedImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (w, h, px) = ImageIoCodec.decodeLuma(m.payload)
        val out = new Array[Byte](outW * outH)
        var j = 0
        while (j < outH) {
          val sy = j * h / outH
          var i = 0
          while (i < outW) {
            val sx = i * w / outW
            out(j * outW + i) = px(sy * w + sx)
            i += 1
          }
          j += 1
        }
        ResizedImage(m.media_id, outW, outH, out)
      }
    }
  }

  /** Deterministic synthetic grayscale PNG: luma(x, y) = (3x + 7y + seed)
    * mod 256, encoded through the JDK's own PNG writer. Gray PNG is
    * lossless, so `ImageIoCodec.decodeLuma` recovers exactly these
    * values — which a SQL oracle can recompute from the closed form
    * WITHOUT being able to parse PNG. This is what lets the m5/m6 gates
    * exercise the REAL codec end-to-end (encode → container bytes →
    * `javax.imageio` decode → pixel statistics) under a value-level
    * cross-engine check. */
  def syntheticGrayPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val buf = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { buf(y * w + x) = ((3 * x + 7 * y + seed) % 256).toByte; x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "png", bos), "JDK PNG writer missing")
    bos.toByteArray
  }

  /** [[asMedia]] with REAL image payloads: every image row carries an
    * actual PNG container (the deterministic gradient of m5-m7, dims
    * keyed by media_id), so the image path runs `javax.imageio` from
    * container bytes up; audio/video rows keep their UTF-8 payloads —
    * the codec boundary is per KIND, and [[StubCodec]]'s remit is ONLY
    * the non-image media this container ships no codec for. */
  def asMediaReal(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    asMedia(docs).mapPartitions(_.map { m =>
      if (m.kind == "image")
        m.copy(payload = syntheticGrayPng(m.media_id,
          16 + (m.media_id % 16).toInt, 12 + (m.media_id % 8).toInt))
      else m
    })
  }

  /** Feature extraction with the per-kind codec boundary: image rows
    * decode through [[ImageIoCodec]] (real width/height, checksum over
    * decoded luminance, n_bytes = DECODED size w*h — the PNG container
    * length is a storage artifact of filter/zlib choices, not a decode
    * property, and no relational oracle can re-derive it); audio/video
    * rows fall back to [[StubCodec]]. Same narrow no-shuffle pass. */
  def extractFeaturesReal(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      if (m.kind == "image") {
        val (w, h, px) = ImageIoCodec.decodeLuma(m.payload)
        MediaFeatures(m.media_id, m.kind, (w * h).toLong, w, h, 1,
          StubCodec.checksum(px))
      } else {
        val (w, h, f) = StubCodec.decode(m.kind, m.payload)
        MediaFeatures(m.media_id, m.kind, m.payload.length.toLong, w, h, f,
          StubCodec.checksum(m.payload))
      }
    })
  }

  /** Wrap the documents table as a media corpus: payload = UTF-8 bytes,
    * kind assigned round-robin — a deterministic fake corpus with real
    * BINARY columns. */
  def asMedia(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("payload"))
      .as[MediaRecord]
  }

  final case class ResizedImage(media_id: Long, out_w: Int, out_h: Int, pixels: Array[Byte])

  /** Sample every `stride`-th frame of video records — emits frame
    * metadata (index + byte offset), not decoded frames. */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int = 10): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions { it =>
      it.flatMap { m =>
        val (_, _, nFrames) = StubCodec.decode(m.kind, m.payload)
        (0 until nFrames by stride).iterator.map { i =>
          FrameSample(m.media_id, i, i.toLong * 50)
        }
      }
    }
  }
}
