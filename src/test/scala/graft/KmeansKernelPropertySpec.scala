package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized equivalence gate for the shared integer-exact Lloyd
  * pipeline (c1/c3/c4/c5's engine): random embeddings written as a
  * synthetic `embeddings.parquet`, the UNMODIFIED c1 gate query run
  * against them, and the result must equal a direct single-threaded
  * simulation of the contract — 1e6 quantization, md5-smallest seeds,
  * integer squared distances with smallest-cid tie-break, and the
  * floor(sum/count + 0.5) centroid update with empty clusters keeping
  * their previous centroid. */
class KmeansKernelPropertySpec extends AnyFunSuite {

  private lazy val spark = Spark.session(master = "local[4]",
    shufflePartitions = 4, appName = "graft-kmeans-prop")

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("c1 k-means equals a direct integer-exact Lloyd simulation") {
    import spark.implicits._
    for (seed <- Seq(81L, 82L)) {
      val rnd = new scala.util.Random(seed)
      val vecs: Seq[(Long, Array[Float], String)] = (0 until 120).map { i =>
        (i.toLong, Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat),
          s"l${i % 4}")
      }
      val dir = java.nio.file.Files.createTempDirectory("kmeans-prop").toString
      vecs.toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val got = SparkEntry.queries("c1_kmeans")(spark, dir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq

      // direct simulation
      val q: Map[Long, Array[Long]] = vecs.map { case (id, e, _) =>
        id -> e.map(x => math.floor(x.toDouble * 1000000 + 0.5).toLong)
      }.toMap
      var cent: Map[Long, Array[Long]] = vecs
        .map { case (id, _, _) => (md5hex(id.toString), id) }
        .sorted.take(8).zipWithIndex
        .map { case ((_, id), cid) => cid.toLong -> q(id) }.toMap
      def assign(): Map[Long, (Long, Long)] = q.view.mapValues { v =>
        cent.toSeq.map { case (cid, cv) =>
          val d = (0 until 64).map(k => (v(k) - cv(k)) * (v(k) - cv(k))).sum
          (d, cid)
        }.min // smallest dist, tie -> smallest cid
      }.toMap.view.mapValues { case (d, cid) => (cid, d) }.toMap
      for (_ <- 1 to 3) {
        val a = assign()
        val upd = a.toSeq.groupBy(_._2._1).map { case (cid, members) =>
          val ids = members.map(_._1)
          cid -> Array.tabulate(64) { k =>
            val s = ids.map(id => q(id)(k)).sum
            math.floor(s.toDouble / ids.size + 0.5).toLong
          }
        }
        cent = cent.map { case (cid, cv) => cid -> upd.getOrElse(cid, cv) }
      }
      val fin = assign()
      val want = cent.toSeq.sortBy(_._1).map { case (cid, cv) =>
        val members = fin.filter(_._2._1 == cid)
        (cid, members.size.toLong, cv(0), cv.sum, members.values.map(_._2).sum)
      }
      assert(got == want, s"seed=$seed:\n got=${got.take(3)}\n want=${want.take(3)}")
      assert(want.count(_._2 > 0) >= 4, s"seed=$seed degenerate clustering")
    }
  }
}
