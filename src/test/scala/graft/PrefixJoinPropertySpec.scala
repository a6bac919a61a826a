package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized equivalence gate for the d19/d20 prefix join: on random
  * small corpora (deterministic seeds), `DedupOps.prefixJoin` — prefix
  * candidate generation, the PPJoin positional filter, packed-array
  * two-pointer verification, dedup-after — must return EXACTLY the
  * brute-force all-pairs Jaccard >= 0.5 set. The oracle gate proves
  * this on two fixed corpora; this spec probes the filter's safety
  * argument (an occurrence failing the suffix bound cannot be a pair's
  * smallest shared token) across corpora with heavy duplication,
  * near-misses at the threshold, and single-token docs.
  */
class PrefixJoinPropertySpec extends AnyFunSuite {

  private lazy val spark = Spark.session(master = "local[4]",
    shufflePartitions = 4, appName = "graft-prefix-prop")

  /** A random corpus: `nDocs` docs over a `vocab`-word vocabulary, doc
    * lengths 3-40 words, plus mutated near-copies of earlier docs so
    * pairs cluster around the 0.5 threshold. */
  private def corpus(seed: Long, nDocs: Int, vocab: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val base = (0 until nDocs).map { i =>
      val len = 3 + rnd.nextInt(38)
      (i.toLong, Seq.fill(len)(s"w${rnd.nextInt(vocab)}").mkString(" "))
    }
    val mutants = (0 until nDocs / 2).map { j =>
      val (_, src) = base(rnd.nextInt(base.size))
      val toks = src.split(" ").toBuffer
      // drop/replace a random ~quarter of tokens: jaccard lands near 0.5
      val nMut = math.max(1, toks.size / 4)
      for (_ <- 0 until nMut) {
        val k = rnd.nextInt(toks.size)
        if (rnd.nextBoolean() && toks.size > 3) toks.remove(k)
        else toks(k) = s"w${rnd.nextInt(vocab)}"
      }
      ((nDocs + j).toLong, toks.mkString(" "))
    }
    base ++ mutants
  }

  test("prefixJoin == brute-force all-pairs Jaccard on random corpora") {
    import spark.implicits._
    for (seed <- Seq(1L, 2L, 3L)) {
      val docs = corpus(seed, nDocs = 60, vocab = 40)
        .toDF("doc_id", "text")
      val sh = graft.queries.DedupOps.shinglesRaw(docs)
      val got = graft.queries.DedupOps.prefixJoin(sh)
        .select("d1", "d2", "jaccard").as[(Long, Long, Double)]
        .collect().toSet
      // brute force: distinct shingle sets, all doc pairs, exact jaccard
      val sets = sh.distinct().as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val want = (for {
        (d1, s1) <- sets; (d2, s2) <- sets if d1 < d2
        m = (s1 & s2).size
        j = m.toDouble / (s1.size + s2.size - m)
        if j >= 0.5
        // Spark's round() is BigDecimal HALF_UP — replicate exactly
        jr = BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      } yield (d1, d2, jr)).toSet
      assert(got == want,
        s"seed=$seed: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
      assert(want.nonEmpty, s"seed=$seed produced no qualifying pairs — weak test")
    }
  }
}
