package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.MediaOps

/** Multimodal-column queries: the documents table wrapped as a BINARY
  * media corpus, decoded inside `mapPartitions`.
  *
  * EVERY image row runs the REAL `javax.imageio` codec over actual PNG
  * container bytes (deterministic synthetic gradients,
  * `MediaOps.syntheticGrayPng`): m1's features, m3's resize, m4's aHash
  * and m5-m8 all decode real containers, and each oracle recomputes the
  * decoded pixel statistics from the gradient's closed form — a
  * value-level gate on actual image decode. The STUB codec's remit is
  * ONLY the audio/video rows (m1's non-image kinds, m2's frame
  * sampling): no audio/video library ships in this container, so those
  * rows gate the plumbing with payload-derived deterministic decode. */
object MediaQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // per-kind aggregate over decoded features; image rows decode REAL
    // PNGs through javax.imageio, audio/video rows take the stub
    "m1_media_features" -> ((s, dir) => {
      val media = MediaOps.asMediaReal(Tables.load(s, dir, "documents"))
      MediaOps.extractFeaturesReal(media).toDF()
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_bytes")).cast("long").as("total_bytes"),
          sum(col("width")).cast("long").as("sum_w"),
          sum(col("height")).cast("long").as("sum_h"),
          sum(col("n_frames")).cast("long").as("sum_frames"),
          sum(col("checksum")).cast("long").as("sum_checksum"))
        .orderBy(col("kind"))
    }),

    // nearest-neighbor resize to 16x12 from REAL decoded pixels; the
    // resized payload is a real binary column and the gate checks its
    // byte-sum per image
    "m3_resize" -> ((s, dir) => {
      import s.implicits._
      val media = MediaOps.asMediaReal(
        Tables.load(s, dir, "documents").filter(col("doc_id") < 300))
        .filter(_.kind == "image")
      MediaOps.resizeImagesImageIo(media, 16, 12)
        .map(r => (r.media_id, r.out_w, r.out_h,
          r.pixels.foldLeft(0L)((a, b) => a + (b & 0xFF))))
        .toDF("media_id", "out_w", "out_h", "res_checksum")
        .orderBy(col("media_id"))
    }),

    // frame sampling: per-media sampled frame count for first videos
    "m2_frame_sample" -> ((s, dir) => {
      val media = MediaOps.asMedia(
        Tables.load(s, dir, "documents").filter(col("doc_id") < 100))
      MediaOps.sampleFrames(media, stride = 10).toDF()
        .groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_sampled"), max(col("frame_off")).as("last_off"))
        .orderBy(col("media_id"))
    }),

    // average-hash (aHash) image near-dup groups: thumbnail to 8x8
    // through the SAME resize plumbing m3 gates, threshold each pixel
    // against the thumbnail mean (compared integer-exactly as px*64 vs
    // sum), group identical 64-bit signatures. The image-side twin of
    // d1's content-hash dedup: at 100 TB the signature is 8 bytes per
    // image, the groupBy key is uniform, and no pair generation ever
    // happens — identical signatures collide in one hash aggregate.
    "m4_ahash_dups" -> ((s, dir) => {
      import s.implicits._
      val media = MediaOps.asMediaReal(
        Tables.load(s, dir, "documents").filter(col("doc_id") < 300))
        .filter(_.kind == "image")
      val sigs = MediaOps.resizeImagesImageIo(media, 8, 8)
        .map { r =>
          val px = r.pixels.map(_ & 0xFF)
          val total = px.sum
          (r.media_id, new String(px.map(p => if (p * 64 > total) '1' else '0')))
        }
        .toDF("media_id", "bitsig")
      sigs.select(col("media_id"),
          expr("md5_bits(bitsig, 15)").as("ahash"))
        .groupBy(col("ahash"))
        .agg(count(lit(1)).as("n_dups"), min(col("media_id")).as("keeper"))
        .filter(col("n_dups") > 1)
        .orderBy(col("ahash"))
    }),

    // REAL-codec decode gate: per-doc synthetic gradient PNG -> JDK PNG
    // encode -> javax.imageio decode -> luminance features. Narrow
    // map-only plan (encode+decode fused in one partition pass, no
    // shuffle before the final sort); payloads never leave the executor.
    "m5_imageio_decode" -> ((s, dir) => {
      import s.implicits._
      val media = Tables.load(s, dir, "documents")
        .filter(col("doc_id") < 400).select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          MediaOps.MediaRecord(id, "image",
            MediaOps.syntheticGrayPng(id, 16 + (id % 16).toInt, 12 + (id % 8).toInt))
        })
      MediaOps.extractFeaturesImageIo(media).toDF()
        .select(col("media_id"), col("width"), col("height"),
          col("checksum").as("lum_sum"))
        .orderBy(col("media_id"))
    }),

    // REAL-codec resize gate: same PNG corpus, decoded by javax.imageio
    // and nearest-neighbor resampled from the ACTUAL decoded pixels; the
    // oracle evaluates the gradient at the sampled source coordinates.
    "m6_imageio_resize" -> ((s, dir) => {
      import s.implicits._
      val media = Tables.load(s, dir, "documents")
        .filter(col("doc_id") < 300).select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          MediaOps.MediaRecord(id, "image",
            MediaOps.syntheticGrayPng(id, 16 + (id % 16).toInt, 12 + (id % 8).toInt))
        })
      MediaOps.resizeImagesImageIo(media, 8, 6)
        .map(r => (r.media_id, r.out_w, r.out_h,
          r.pixels.foldLeft(0L)((a, b) => a + (b & 0xFF))))
        .toDF("media_id", "out_w", "out_h", "res_checksum")
        .orderBy(col("media_id"))
    }),

    // dHash (difference hash) through the REAL codec: decode, 9x8
    // nearest-neighbor thumbnail from actual pixels, then the 64-bit
    // gradient signature bit(y*8+x) = [p(x+1,y) > p(x,y)] — the
    // perceptual near-dup hash that survives brightness shifts where
    // m4's mean-threshold aHash doesn't (row-constant offsets cancel in
    // the horizontal difference). Same narrow map-only plan as m5/m6;
    // the oracle recomputes every bit from the closed-form gradient at
    // the sampled coordinates, so all 64 comparator outcomes are
    // value-checked, not just the popcount. ---
    "m7_imageio_dhash" -> ((s, dir) => {
      import s.implicits._
      val media = Tables.load(s, dir, "documents")
        .filter(col("doc_id") < 300).select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          MediaOps.MediaRecord(id, "image",
            MediaOps.syntheticGrayPng(id, 16 + (id % 16).toInt, 12 + (id % 8).toInt))
        })
      MediaOps.resizeImagesImageIo(media, 9, 8)
        .map { r =>
          // two 32-bit words (v10's packing): bit 63 of one BIGINT would
          // be the sign bit and DuckDB range-checks 1<<63
          var lo = 0L
          var hi = 0L
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              val a = r.pixels(y * 9 + x) & 0xFF
              val b = r.pixels(y * 9 + x + 1) & 0xFF
              if (b > a) {
                val bit = y * 8 + x
                if (bit < 32) lo |= 1L << bit else hi |= 1L << (bit - 32)
              }
              x += 1
            }
            y += 1
          }
          (r.media_id, lo, hi,
            (java.lang.Long.bitCount(lo) + java.lang.Long.bitCount(hi)).toLong)
        }
        .toDF("media_id", "dhash_lo", "dhash_hi", "n_bits")
        .orderBy(col("media_id"))
    }),

    // --- perceptual near-duplicate DEGREE over m7's 64-bit dHash: which
    //     images are templates — over-represented to within Hamming
    //     distance 2 (the LAION-style curation question; m4's aHash
    //     groups catch only exact signature collisions). Pair generation
    //     is EXACT banded bucketing, never an image self-join: 64 bits
    //     split into 3 disjoint bands (21+21+22), and a pair differing
    //     in <= 2 bits can touch at most 2 bands, so it collides
    //     unchanged in at least one (pigeonhole — d6's SimHash argument
    //     applied to the image hash). bit_count confirmation runs on the
    //     bucket survivors, then the per-image rollup + top-20 is a
    //     TakeOrderedAndProject. At 100 TB the work is sum(band-bucket
    //     freq^2) with the d7-style cap as the skew lever (this demo
    //     corpus is maximally degenerate — monotone gradients put every
    //     image within 12 bits of every other, so the cap lever, not
    //     the banding, is what bounds it) and 8 bytes of state per
    //     image. ---
    "m8_dhash_neardup" -> ((s, dir) => {
      // eager checkpoint (d18's pattern): h fans out to the band explode
      // plus BOTH confirmation joins — without it the full ImageIO
      // decode + resize + dHash pipeline re-runs up to three times
      val h = queries("m7_imageio_dhash")(s, dir)
        .select(col("media_id"), col("dhash_lo"), col("dhash_hi"))
        .localCheckpoint(true)
      // recombined 64-bit key only for band extraction (bit 63 rides the
      // sign — harmless under mask); widths 21+21+22 cover all 64 bits
      val full = col("dhash_lo").bitwiseOR(shiftleft(col("dhash_hi"), 32))
      val bandArr = expr("array(" +
        Seq((0, 21), (21, 21), (42, 22)).zipWithIndex.map { case ((off, w), b) =>
          s"concat('$b,', shiftright(fullk, $off) & ${(1L << w) - 1})"
        }.mkString(",") + ")")
      val cand = h.withColumn("fullk", full)
        .select(col("media_id"), explode(bandArr).as("s"))
        .groupBy(col("s")).agg(sort_array(collect_set(col("media_id"))).as("ids"))
        .filter(size(col("ids")) > 1)
        .select(explode(graft.functions.id_pairs(col("ids"))).as("p"))
        .select(col("p.d1").as("d1"), col("p.d2").as("d2")).distinct()
      // merge, never broadcast (r18 100x purge): the banded candidate
      // relation is media-corpus-proportional (a dup-heavy corpus
      // yields at least result-many pairs) and generate-fed, so the
      // planner's blind estimate would pin it under the broadcast
      // threshold at any size; SMJ's sorts spill
      val conf = cand.hint("merge")
        .join(h.select(col("media_id").as("d1"), col("dhash_lo").as("l1"),
          col("dhash_hi").as("h1")), Seq("d1"))
        .join(h.select(col("media_id").as("d2"), col("dhash_lo").as("l2"),
          col("dhash_hi").as("h2")), Seq("d2"))
        .select(col("d1"), col("d2"),
          expr("CAST(bit_count(l1 ^ l2) + bit_count(h1 ^ h2) AS BIGINT)").as("hamming"))
        .filter(col("hamming") <= 2)
      conf.select(col("d1").as("media_id"), col("hamming"))
        .unionByName(conf.select(col("d2").as("media_id"), col("hamming")))
        .groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_neardup"), min(col("hamming")).as("closest"))
        .orderBy(col("n_neardup").desc, col("media_id"))
        .limit(20)
    })
  )

  val oracles: Map[String, String] = Map(
    // kind: doc_id % 3 -> 0=image, 1=audio, 2=video. Image rows are REAL
    // decoded PNGs: dims/luminance from the m5-m7 gradient closed form,
    // n_bytes = decoded size w*h. Audio/video dims per StubCodec.
    "m1_media_features" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |    strlen(text) AS n,
        |    16 + doc_id % 16 AS iw, 12 + doc_id % 8 AS ih,
        |    text
        |  FROM documents),
        |lum AS (
        |  SELECT doc_id, CAST(sum((3 * i.x + 7 * j.y + doc_id) % 256) AS BIGINT) AS lsum
        |  FROM m, (SELECT unnest(generate_series(0, 30)) AS x) i,
        |       (SELECT unnest(generate_series(0, 18)) AS y) j
        |  WHERE kind = 'image' AND i.x < iw AND j.y < ih
        |  GROUP BY doc_id),
        |f AS (
        |  SELECT kind,
        |    CASE kind WHEN 'image' THEN iw * ih ELSE n END AS n,
        |    CASE kind WHEN 'image' THEN iw
        |              WHEN 'audio' THEN 1 ELSE 320 END AS width,
        |    CASE kind WHEN 'image' THEN ih
        |              WHEN 'audio' THEN 1 ELSE 240 END AS height,
        |    CASE kind WHEN 'image' THEN 1
        |              WHEN 'audio' THEN n // 100 + 1 ELSE n // 50 + 1 END AS n_frames,
        |    CASE kind WHEN 'image' THEN lum.lsum
        |         ELSE (SELECT sum(CAST(unicode(c) AS BIGINT))
        |               FROM unnest(string_split_regex(text, '')) AS t(c)
        |               WHERE c != '') END AS checksum
        |  FROM m LEFT JOIN lum USING (doc_id))
        |SELECT kind, count(*) AS n, CAST(sum(n) AS BIGINT) AS total_bytes,
        |  CAST(sum(width) AS BIGINT) AS sum_w, CAST(sum(height) AS BIGINT) AS sum_h,
        |  CAST(sum(n_frames) AS BIGINT) AS sum_frames,
        |  CAST(sum(checksum) AS BIGINT) AS sum_checksum
        |FROM f GROUP BY kind ORDER BY kind""".stripMargin,

    // nearest-neighbor sample of the REAL decoded gradient at source
    // coordinates (x*w//16, y*h//12) — the m6 oracle at 16x12
    "m3_resize" ->
      """WITH img AS (
        |  SELECT doc_id AS media_id,
        |    16 + doc_id % 16 AS w, 12 + doc_id % 8 AS h
        |  FROM documents WHERE doc_id < 300 AND doc_id % 3 = 0),
        |px AS (
        |  SELECT media_id,
        |    (3 * ((i.x * w) // 16) + 7 * ((j.y * h) // 12) + media_id) % 256 AS p
        |  FROM img,
        |       (SELECT unnest(generate_series(0, 15)) AS x) i,
        |       (SELECT unnest(generate_series(0, 11)) AS y) j)
        |SELECT media_id, 16 AS out_w, 12 AS out_h, CAST(sum(p) AS BIGINT) AS res_checksum
        |FROM px GROUP BY media_id ORDER BY media_id""".stripMargin,

    "m2_frame_sample" ->
      """WITH v AS (
        |  SELECT doc_id AS media_id, strlen(text) // 50 + 1 AS n_frames
        |  FROM documents WHERE doc_id < 100 AND doc_id % 3 = 2)
        |SELECT media_id,
        |  CAST((n_frames + 9) // 10 AS BIGINT) AS n_sampled,
        |  CAST(((n_frames - 1) // 10) * 10 * 50 AS BIGINT) AS last_off
        |FROM v ORDER BY media_id""".stripMargin,

    // 8x8 thumbnail of the REAL decoded gradient, mean-thresholded
    "m4_ahash_dups" ->
      """WITH img AS (
        |  SELECT doc_id AS media_id,
        |    16 + doc_id % 16 AS w, 12 + doc_id % 8 AS h
        |  FROM documents WHERE doc_id < 300 AND doc_id % 3 = 0),
        |px AS (
        |  SELECT media_id, j.y * 8 + i.x AS idx,
        |    (3 * ((i.x * w) // 8) + 7 * ((j.y * h) // 8) + media_id) % 256 AS p
        |  FROM img, (SELECT unnest(generate_series(0, 7)) AS x) i,
        |       (SELECT unnest(generate_series(0, 7)) AS y) j),
        |tot AS (SELECT media_id, CAST(sum(p) AS BIGINT) AS total FROM px GROUP BY media_id),
        |sig AS (
        |  SELECT px.media_id,
        |    string_agg(CASE WHEN p * 64 > total THEN '1' ELSE '0' END, '' ORDER BY idx) AS bitsig
        |  FROM px JOIN tot USING (media_id) GROUP BY px.media_id),
        |hh AS (SELECT media_id, ('0x' || substr(md5(bitsig), 1, 15))::BIGINT AS ahash FROM sig)
        |SELECT ahash, count(*) AS n_dups, min(media_id) AS keeper
        |FROM hh GROUP BY ahash HAVING count(*) > 1 ORDER BY ahash""".stripMargin,

    // m5: decoded luminance of the gradient PNG — luma(x,y) =
    // (3x + 7y + doc_id) % 256 over w = 16 + id%16, h = 12 + id%8
    "m5_imageio_decode" ->
      """WITH img AS (
        |  SELECT doc_id AS media_id,
        |    16 + doc_id % 16 AS w, 12 + doc_id % 8 AS h
        |  FROM documents WHERE doc_id < 400),
        |px AS (
        |  SELECT media_id, w, h, (3 * i.x + 7 * j.y + media_id) % 256 AS p
        |  FROM img, (SELECT unnest(generate_series(0, 30)) AS x) i,
        |       (SELECT unnest(generate_series(0, 18)) AS y) j
        |  WHERE i.x < w AND j.y < h)
        |SELECT media_id, CAST(min(w) AS INTEGER) AS width,
        |  CAST(min(h) AS INTEGER) AS height, CAST(sum(p) AS BIGINT) AS lum_sum
        |FROM px GROUP BY media_id ORDER BY media_id""".stripMargin,

    // m6: nearest-neighbor sample of the decoded gradient at source
    // coordinates (x*w//8, y*h//6)
    "m6_imageio_resize" ->
      """WITH img AS (
        |  SELECT doc_id AS media_id,
        |    16 + doc_id % 16 AS w, 12 + doc_id % 8 AS h
        |  FROM documents WHERE doc_id < 300),
        |px AS (
        |  SELECT media_id,
        |    (3 * ((i.x * w) // 8) + 7 * ((j.y * h) // 6) + media_id) % 256 AS p
        |  FROM img, (SELECT unnest(generate_series(0, 7)) AS x) i,
        |       (SELECT unnest(generate_series(0, 5)) AS y) j)
        |SELECT media_id, 8 AS out_w, 6 AS out_h,
        |  CAST(sum(p) AS BIGINT) AS res_checksum
        |FROM px GROUP BY media_id ORDER BY media_id""".stripMargin,

    // every dhash bit recomputed from the gradient at the 9x8
    // nearest-neighbor sample coordinates
    "m7_imageio_dhash" ->
      """WITH img AS (
        |  SELECT doc_id AS media_id,
        |    16 + doc_id % 16 AS w, 12 + doc_id % 8 AS h
        |  FROM documents WHERE doc_id < 300),
        |bits AS (
        |  SELECT media_id, j.y * 8 + i.x AS bit,
        |    CASE WHEN (3 * (((i.x + 1) * w) // 9) + 7 * ((j.y * h) // 8) + media_id) % 256
        |            > (3 * ((i.x * w) // 9) + 7 * ((j.y * h) // 8) + media_id) % 256
        |         THEN 1 ELSE 0 END AS b
        |  FROM img, (SELECT unnest(generate_series(0, 7)) AS x) i,
        |       (SELECT unnest(generate_series(0, 7)) AS y) j)
        |SELECT media_id,
        |  CAST(sum(CASE WHEN bit < 32 THEN b * (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS dhash_lo,
        |  CAST(sum(CASE WHEN bit >= 32 THEN b * (CAST(1 AS BIGINT) << (bit - 32)) ELSE 0 END) AS BIGINT) AS dhash_hi,
        |  CAST(sum(b) AS BIGINT) AS n_bits
        |FROM bits GROUP BY media_id ORDER BY media_id""".stripMargin,

    // m8: all-pairs Hamming over the m7 bit set (the oracle may brute-
    // force; the engine's banded bucketing is exact by pigeonhole)
    "m8_dhash_neardup" ->
      """WITH img AS (
        |  SELECT doc_id AS media_id,
        |    16 + doc_id % 16 AS w, 12 + doc_id % 8 AS h
        |  FROM documents WHERE doc_id < 300),
        |bits AS (
        |  SELECT media_id, j.y * 8 + i.x AS bit,
        |    CASE WHEN (3 * (((i.x + 1) * w) // 9) + 7 * ((j.y * h) // 8) + media_id) % 256
        |            > (3 * ((i.x * w) // 9) + 7 * ((j.y * h) // 8) + media_id) % 256
        |         THEN 1 ELSE 0 END AS b
        |  FROM img, (SELECT unnest(generate_series(0, 7)) AS x) i,
        |       (SELECT unnest(generate_series(0, 7)) AS y) j),
        |pairs AS (
        |  SELECT b1.media_id AS d1, b2.media_id AS d2,
        |    CAST(sum(CASE WHEN b1.b <> b2.b THEN 1 ELSE 0 END) AS BIGINT) AS hamming
        |  FROM bits b1 JOIN bits b2 ON b1.bit = b2.bit AND b1.media_id < b2.media_id
        |  GROUP BY 1, 2 HAVING hamming <= 2),
        |ends AS (
        |  SELECT d1 AS media_id, hamming FROM pairs
        |  UNION ALL SELECT d2, hamming FROM pairs)
        |SELECT media_id, count(*) AS n_neardup,
        |  CAST(min(hamming) AS BIGINT) AS closest
        |FROM ends GROUP BY media_id
        |ORDER BY n_neardup DESC, media_id LIMIT 20""".stripMargin
  )
}
