package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{Spark, Tables}

class MediaOpsSpec extends AnyFunSuite {

  private lazy val spark = Spark.session(master = "local[4]", shufflePartitions = 4,
    appName = "graft-media-test")

  test("binary wrap -> decode stub -> features is deterministic and complete") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val media = MediaOps.asMedia(docs)
    val feats = MediaOps.extractFeatures(media).collect()
    assert(feats.length == docs.count())
    feats.foreach { f =>
      assert(Set("image", "audio", "video")(f.kind))
      assert(f.n_bytes > 0)
      f.kind match {
        case "image" => assert(f.n_frames == 1 && f.width >= 64 && f.height >= 64)
        case "audio" => assert(f.width == 1 && f.height == 1 && f.n_frames >= 1)
        case _       => assert(f.width == 320 && f.height == 240 && f.n_frames >= 1)
      }
      // checksum equals byte sum of the payload
      assert(f.checksum > 0)
    }
    // kind assignment is by media_id mod 3
    assert(feats.forall(f => f.kind == Seq("image", "audio", "video")((f.media_id % 3).toInt)))
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
