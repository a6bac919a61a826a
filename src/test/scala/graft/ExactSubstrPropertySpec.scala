package graft

import org.scalatest.funsuite.AnyFunSuite

/** Randomized equivalence gate for d21's exact-substring dedup: on
  * random corpora with planted duplicated spans, `DedupOps.exactSubstr`
  * must match a direct Scala computation — window occurrences keyed by
  * the literal 40-char STRING (the pipeline keys by the 60-bit hash;
  * equality holds absent an md5 collision), global-first survivor by
  * min (doc_id, pos), and removed-chars computed as a TRUE interval
  * union (independently validating the lag-walk formula
  * sum min(L, pos - prev)). */
class ExactSubstrPropertySpec extends AnyFunSuite {

  private lazy val spark = Spark.session(master = "local[4]",
    shufflePartitions = 4, appName = "graft-substr-prop")

  private val L = 40

  private def corpus(seed: Long, nDocs: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    def randText(len: Int): String =
      Seq.fill(len)(('a' + rnd.nextInt(6)).toChar).mkString // tiny alphabet → natural repeats
    val base = (0 until nDocs).map(i => (i.toLong, randText(30 + rnd.nextInt(170))))
    // plant verbatim spans copied between docs (the thing ExactSubstr cuts)
    val planted = base.map { case (id, t) =>
      if (id % 3 == 0 && t.length > 60) {
        val (src, _) = (base(rnd.nextInt(base.size))._2, ())
        val span = src.substring(0, math.min(src.length, 50 + rnd.nextInt(30)))
        val at = rnd.nextInt(t.length - 1)
        (id, t.substring(0, at) + span + t.substring(at))
      } else (id, t)
    }
    planted
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("exactSubstr == direct window/survivor/interval-union computation") {
    import spark.implicits._
    for (seed <- Seq(11L, 12L, 13L)) {
      val docs = corpus(seed, nDocs = 40)
      val got = graft.queries.DedupOps.exactSubstr(docs.toDF("doc_id", "text"))
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
        .toMap
      // direct computation on strings
      val wins = for {
        (id, t) <- docs if t.length >= L
        p <- 0 to t.length - L
      } yield (t.substring(p, p + L), id, p)
      val byWin = wins.groupBy(_._1)
      val removed = byWin.values.filter(_.size >= 2).flatMap { occ =>
        val first = occ.map(o => (o._2, o._3)).min
        occ.map(o => (o._2, o._3)).filter(_ != first)
      }.toSeq
      val want = docs.filter(_._2.length >= L).map { case (id, t) =>
        val ps = removed.filter(_._1 == id).map(_._2).sorted
        // TRUE interval union of [p, p+L) via a left-to-right sweep —
        // independent of the pipeline's lag-walk formula
        var cov = 0L; var hi = Int.MinValue
        ps.foreach { p =>
          cov += math.max(0, (p + L) - math.max(p, hi))
          hi = math.max(hi, p + L)
        }
        val md5v = if (ps.isEmpty) "none"
          else md5hex(ps.mkString(","))
        (id, ((t.length - L + 1).toLong, ps.size.toLong, cov, md5v))
      }.toMap
      assert(got == want, {
        val diff = (got.keySet ++ want.keySet)
          .filter(k => got.get(k) != want.get(k)).toSeq.sorted.take(3)
        s"seed=$seed mismatch: ${diff.map(k => s"$k: got=${got.get(k)} want=${want.get(k)}")}"
      })
      assert(want.values.exists(_._2 > 0), s"seed=$seed planted no removals — weak test")
    }
  }
}
