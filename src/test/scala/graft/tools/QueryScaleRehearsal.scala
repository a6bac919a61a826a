package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Spark, Tables}

/** Query-side scale rehearsal: the d4 MinHash-LSH dedup shape (shingle →
  * signature → banded buckets → in-bucket candidate pairs → exact
  * confirmation) run at 1x and Kx corpus size, measuring whether the
  * bucketed pair generation scales LINEARLY with the corpus — the claim
  * the 100 TB design rests on (work bounded by sum(freq^2) per bucket,
  * buckets never crossing independent corpus slices).
  *
  * The Kx corpus is K perturbed copies: every token gets a per-copy
  * suffix, so shingles never collide ACROSS copies and the duplicate
  * density (the thing that drives pair work) is identical per copy —
  * i.e. K independent corpora, the honest composition of "10x more data
  * of the same shape". Naive replication (identical text) would
  * multiply every bucket's frequency by K and the pair work by K^2 BY
  * CONSTRUCTION of the data, measuring the corpus, not the algorithm.
  *
  * Usage: Test/runMain graft.tools.QueryScaleRehearsal [sfDir] [K]
  */
object QueryScaleRehearsal {

  /** The d4 pipeline over an arbitrary documents frame (same operators
    * and constants as the gated query; reproduced here because the gate
    * reads from parquet and this rehearsal feeds synthetic frames). */
  private def lshPairs(d: DataFrame): DataFrame = {
    val P = 2147483647L
    val sh = d.select(col("doc_id"),
        explode(expr("word_shingle_hashes(text, 3)")).as("h"))
      .distinct()
    val fp = expr("CAST(shiftright(h, 28) AS BIGINT)")
    val aggs = (0 to 7).map(i =>
      min((lit(2 * i + 1) * col("f") + lit(7919L * i)) % P).as(s"mh$i"))
    val mh = sh.select(col("doc_id"), fp.as("f"))
      .groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
    val bands = mh.select(col("doc_id"), explode(expr(
      "array(" + (0 to 3).map(b =>
        s"concat('$b,', mh${2 * b}, ',', mh${2 * b + 1})").mkString(",") + ")"))
      .as("s"))
    val cand = bands.groupBy(col("s"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(graft.functions.id_pairs(col("ids"))).as("p"))
      .select(col("p.d1").as("d1"), col("p.d2").as("d2")).distinct()
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    broadcast(cand).join(sh.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sh.as("s2"), col("d2") === col("s2.doc_id") && col("s1.h") === col("s2.h"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("m"))
      .join(cnt.as("c1"), col("d1") === col("c1.doc_id"))
      .join(cnt.as("c2"), col("d2") === col("c2.doc_id"))
      .filter(col("m") / (col("c1.n") + col("c2.n") - col("m")) >= 0.5)
      .select(col("d1"), col("d2"))
  }

  /** The t16 pipeline (BPE learn-and-apply) over an arbitrary documents
    * frame: distributed word count -> ONE-task merge-learning kernel
    * over the vocabulary -> broadcast segmentation join. The rehearsal
    * question: the perturbed K-copy corpus multiplies the VOCABULARY by
    * K (every token carries a copy suffix) — does the single-task
    * kernel placement survive a Kx vocabulary, or does it become the
    * bottleneck the distributed rounds were dropped for? */
  private def bpeApply(d: DataFrame): DataFrame = {
    import d.sparkSession.implicits._
    val words = d
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("word"))
    val vocab = words.groupBy(col("word")).agg(count(lit(1)).as("freq"))
    val toks = vocab.select(col("word"),
        concat(lit("  "), regexp_replace(col("word"), "(.)", "$1  ")).as("sym"),
        col("freq"))
      .as[(String, String, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        val arr = it.toArray
        val finalSyms = graft.queries.TextOps.bpeLearnKernel(
          arr.map(_._2), arr.map(_._3), 5)._2
        arr.iterator.zip(finalSyms.iterator).map { case ((w, _, _), fs) =>
          (w, fs.split("  ").count(_.nonEmpty).toLong)
        }
      }
      .toDF("word", "n_sym")
    words.join(broadcast(toks), Seq("word"))
      .groupBy(col("doc_id")).agg(sum(col("n_sym")).as("n_bpe"))
  }

  private def timed(df: DataFrame): (Long, Double) = {
    val t0 = System.nanoTime()
    val n = df.count()
    (n, (System.nanoTime() - t0) / 1e9)
  }

  /** d2's full-bucket exact Jaccard over an arbitrary documents frame
    * (same operators/constants as the gated query). */
  private def fullJaccardPairs(d: DataFrame): DataFrame = {
    val sh = d.select(col("doc_id"),
        explode(expr("word_shingle_hashes(text, 3)")).as("h"))
      .distinct()
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val pairs = sh.groupBy(col("h"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(graft.functions.id_pairs(col("ids"))).as("p"))
      .groupBy(col("p.d1").as("d1"), col("p.d2").as("d2"))
      .agg(count(lit(1)).as("m"))
    pairs.join(cnt.as("c1"), col("d1") === col("c1.doc_id"))
      .join(cnt.as("c2"), col("d2") === col("c2.doc_id"))
      .filter(col("m") / (col("c1.n") + col("c2.n") - col("m")) >= 0.5)
      .select(col("d1"), col("d2"))
  }

  /** d19's prefix-filtered exact Jaccard — the REAL gated code path
    * (packed arrays + two-pointer merge verification), so the rehearsal
    * measures what ships. */
  private def prefixJaccardPairs(d: DataFrame): DataFrame =
    graft.queries.DedupOps.prefixJoin(graft.queries.DedupOps.shinglesRaw(d))
      .select(col("d1"), col("d2"))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = if (args.length > 1) args(1).toInt else 8
    val spark: SparkSession = Spark.session(appName = "graft-query-scale")
    val base = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .localCheckpoint(true)
    val nBase = base.count()
    // K perturbed copies: doc_id remapped into disjoint ranges, every
    // token suffixed with the copy index (shingles disjoint across copies)
    val scaled = base
      .withColumn("cp", explode(expr(s"sequence(0, ${k - 1})")))
      .select((col("doc_id") * k + col("cp")).as("doc_id"),
        expr("regexp_replace(text, '(\\\\S+)', concat('$1#', CAST(cp AS STRING)))")
          .as("text"))
      .localCheckpoint(true)
    val nScaled = scaled.count()

    val family = if (args.length > 2) args(2) else "lsh"
    family match {
      case "ivf" =>
        // The v16 kNN-graph pipeline (shared code: SimilarityOps
        // .knnGraphOf) at 1x and Kx corpus. Since round 10 the GATED
        // query derives K from corpus size (ceil(n/64) md5-rank
        // exemplars), so the primary arm simply runs the gated plan at
        // both scales — the K formula is exercised by the rehearsal
        // itself, not a side-channel re-seed. Copies nudge each vector
        // by a small per-copy, per-position offset so the embedding
        // space stays clustered-realistic.
        val ebase = Tables.load(spark, sfDir, "embeddings")
          .select(col("vec_id"), col("embedding"), col("label"))
          .localCheckpoint(true)
        val nE = ebase.count()
        val escaled = ebase
          .withColumn("cp", explode(expr(s"sequence(0, ${k - 1})")))
          .select((col("vec_id") * k + col("cp")).as("vec_id"),
            expr("transform(embedding, (x, i) -> x + CAST(cp AS FLOAT) * 0.001F * CAST(i % 7 AS FLOAT))")
              .as("embedding"),
            col("label"))
          .localCheckpoint(true)
        val nEk = escaled.count()
        def kOf(n: Long): Int = math.max(1, math.ceil(
          n.toDouble / graft.queries.SimilarityOps.KnnCellTarget).toInt)
        def skew(e: org.apache.spark.sql.DataFrame, kk: Int): (Long, Double, Double) = {
          val h = graft.queries.SimilarityOps.knnCellHistogram(e, kk)
            .select(col("n")).collect().map(_.getLong(0))
          val mx = h.max
          val pairWork = h.map(c => c.toDouble * c).sum
          (mx, mx.toDouble / (h.sum.toDouble / h.length),
            mx.toDouble * mx / pairWork)
        }
        graft.queries.SimilarityOps.knnGraphOf(ebase).count() // warmup
        val (g1, s1) = timed(graft.queries.SimilarityOps.knnGraphOf(ebase))
        val (gk, sk) = timed(graft.queries.SimilarityOps.knnGraphOf(escaled))
        val (mx1, sk1, sh1) = skew(ebase, kOf(nE))
        val (mxK, skK, shK) = skew(escaled, kOf(nEk))
        println(f"""{"rehearsal":"ivf-knn-gated-autoK","k":$k,"base_vecs":$nE,""" +
          f""""base_cells":${kOf(nE)},"scaled_cells":${kOf(nEk)},""" +
          f""""scaled_vecs":$nEk,"base_edges":$g1,"scaled_edges":$gk,""" +
          f""""base_sec":$s1%.2f,"scaled_sec":$sk%.2f,""" +
          f""""time_ratio":${sk / s1}%.2f,"per_copy":${sk / s1 / k}%.3f,""" +
          f""""base_max_cell":$mx1,"base_skew":$sk1%.2f,"base_max_pair_share":$sh1%.3f,""" +
          f""""scaled_max_cell":$mxK,"scaled_skew":$skK%.2f,"scaled_max_pair_share":$shK%.3f}""")
        // CONTRAST arm — the fixed-K failure mode the formula exists to
        // prevent: run the Kx corpus with the BASE corpus's cell count,
        // so every cell grows K-fold and pair work K^2-fold.
        val (gf, sf) = timed(
          graft.queries.SimilarityOps.knnGraphOfK(escaled, kOf(nE)))
        val (mxF, skF, shF) = skew(escaled, kOf(nE))
        println(f"""{"rehearsal":"ivf-knn-fixed-K-contrast","k":$k,"cells":${kOf(nE)},""" +
          f""""scaled_vecs":$nEk,"scaled_edges":$gf,"scaled_sec":$sf%.2f,""" +
          f""""time_ratio_vs_base":${sf / s1}%.2f,"per_copy":${sf / s1 / k}%.3f,""" +
          f""""max_cell":$mxF,"skew":$skF%.2f,"max_pair_share":$shF%.3f}""")
      case "bpe" =>
        // warmup, then timed passes; also report the kernel's input size
        bpeApply(base).count()
        val vb = base.select(explode(split(trim(col("text")), "\\s+")).as("w"))
          .select(countDistinct(col("w"))).collect()(0).getLong(0)
        val vk = scaled.select(explode(split(trim(col("text")), "\\s+")).as("w"))
          .select(countDistinct(col("w"))).collect()(0).getLong(0)
        val (docs1, sec1) = timed(bpeApply(base))
        val (docsK, secK) = timed(bpeApply(scaled))
        println(f"""{"rehearsal":"bpe-apply-scaling","k":$k,"base_docs":$docs1,""" +
          f""""scaled_docs":$docsK,"base_vocab":$vb,"scaled_vocab":$vk,""" +
          f""""base_sec":$sec1%.2f,"scaled_sec":$secK%.2f,""" +
          f""""time_ratio":${secK / sec1}%.2f,"per_copy":${secK / sec1 / k}%.3f}""")
        // kernel-only stress at realistic vocabulary sizes: the corpus
        // above only has a few hundred word types, so ALSO time the
        // single-task learn kernel against synthetic Zipf vocabularies
        // (deterministic LCG words) at 1e5 and 1e6 types — the scale at
        // which the "one task learns the merges" placement must hold
        // (beyond ~1e8 types, cap the vocabulary by min-frequency, the
        // standard trainer move)
        for (v <- Seq(100000, 1000000)) {
          var st = 42L
          def nxt(): Long = { st = st * 6364136223846793005L + 1442695040888963407L; st }
          val syms = Array.tabulate(v) { _ =>
            val len = 3 + (math.abs(nxt()) % 8).toInt
            val w = (0 until len).map(_ => ('a' + math.abs(nxt()) % 26).toChar).mkString
            "  " + w.map(c => s"$c  ").mkString.stripSuffix(" ")
          }
          val freqs = Array.tabulate(v)(i => (v.toLong / (i + 1)).max(1L))
          val t0 = System.nanoTime()
          val (merges, _) = graft.queries.TextOps.bpeLearnKernel(syms, freqs, 5)
          println(f"""{"rehearsal":"bpe-kernel-stress","vocab":$v,""" +
            f""""merges":${merges.length},"sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
        }
      case "prefix" =>
        // d2 (full bucket join) vs d19 (prefix filtering) — result-
        // identical exact Jaccard joins whose cost order FLIPS with
        // shingle skew. Clean regime: the synthetic corpus has no hot
        // shingles, so d19's extra exchanges (df build/attach, per-doc
        // prefix sort, candidate verify) are pure overhead. Skewed
        // regime: half the docs share an injected boilerplate suffix —
        // d2's hot buckets each explode as (n/2 choose 2) pairs, while
        // d19 never opens them (a doc's prefix is its RAREST tokens;
        // boilerplate shingles are by construction the most frequent,
        // so they cannot enter a prefix unless a doc has nothing else).
        val boiler = " shared boilerplate footer tokens appear verbatim" +
          " across half the corpus exactly"
        val skewed = base.select(col("doc_id"),
            when(col("doc_id") % 2 === 0, concat(col("text"), lit(boiler)))
              .otherwise(col("text")).as("text"))
          .localCheckpoint(true)
        skewed.count()
        // warm up BOTH pipelines: each has operators the other lacks
        // (id_pairs explode vs df join + struct sort + slice), and a
        // cold first pass would bill one algorithm for JIT/codegen
        fullJaccardPairs(base).count()
        prefixJaccardPairs(base).count()
        val (fc, fs) = timed(fullJaccardPairs(base))
        val (pc, ps) = timed(prefixJaccardPairs(base))
        val (fcS, fsS) = timed(fullJaccardPairs(skewed))
        val (pcS, psS) = timed(prefixJaccardPairs(skewed))
        require(fc == pc && fcS == pcS,
          s"result mismatch: clean $fc vs $pc, skewed $fcS vs $pcS")
        println(f"""{"rehearsal":"prefix-vs-bucket-jaccard","docs":$nBase,""" +
          f""""clean_pairs":$fc,"clean_full_sec":$fs%.2f,"clean_prefix_sec":$ps%.2f,""" +
          f""""skewed_pairs":$fcS,"skewed_full_sec":$fsS%.2f,"skewed_prefix_sec":$psS%.2f}""")
      case "stream" =>
        // Ingest-path throughput at 1x and Kx: the streaming incremental
        // dedup classifier (CorpusStream.incrementalDedup) drains a
        // file-source backlog of arriving docs against a fixed standing
        // corpus. Arriving work is row-local signing + a bucket-bounded
        // stream-static join, so drain wall must scale ~linearly with
        // the arrival count — the property that lets a 1000-executor
        // intake keep up with a crawl. Same honest composition as the
        // batch families: per-copy token suffixes keep cross-copy
        // shingles disjoint.
        // both sides scale together (Kx corpus, Kx arrivals): per-copy
        // match density is identical and cross-copy shingles disjoint,
        // so a linear drain proves the whole ingest path — row-local
        // signing + bucket-bounded join + per-doc state — carries Kx
        // data for ~Kx wall
        def drain(docsK: DataFrame, tag: String): (Long, Double) = {
          val corpus = docsK.filter(col("doc_id") % 7 =!= 3).localCheckpoint(true)
          corpus.count()
          val dir = java.nio.file.Files.createTempDirectory(s"stream-rehearsal-$tag")
          docsK.filter(col("doc_id") % 7 === 3)
            .write.mode("overwrite").parquet(dir.toString)
          val t0 = System.nanoTime()
          val q = graft.streaming.CorpusStream.incrementalDedup(
              graft.streaming.CorpusStream.read(spark, dir.toString), corpus)
            .writeStream.format("memory").queryName(s"rehearsal_$tag")
            .outputMode("update")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
          q.processAllAvailable(); q.stop()
          val n = spark.table(s"rehearsal_$tag").count()
          (n, (System.nanoTime() - t0) / 1e9)
        }
        drain(base, "warm") // warm codegen + file-source machinery
        val (n1, s1) = drain(base, "base")
        val (nK, sK) = drain(scaled, "scaled")
        println(f"""{"rehearsal":"stream-ingest-dedup-scaling","k":$k,""" +
          f""""base_arrivals":$n1,"scaled_arrivals":$nK,""" +
          f""""base_sec":$s1%.2f,"scaled_sec":$sK%.2f,""" +
          f""""time_ratio":${sK / s1}%.2f,"per_copy":${sK / s1 / k}%.3f}""")
      case "substr" =>
        // d21's exact-substring dedup at 1x and Kx: the corpus-sized
        // work is ONE window-hash aggregate (no pairs, no corpus-wide
        // window), so wall must scale ~linearly with the window count.
        // Honest composition: the per-copy token suffix lands inside
        // (nearly) every 40-char window, so cross-copy window hashes
        // stay disjoint and the duplicated-span density per copy is
        // unchanged — Kx data of the same shape, not a K^2 hash pileup.
        graft.queries.DedupOps.exactSubstr(base).count() // warm
        val (nb1, sb) = timed(graft.queries.DedupOps.exactSubstr(base))
        val (nsK, ss) = timed(graft.queries.DedupOps.exactSubstr(scaled))
        println(f"""{"rehearsal":"substr-dedup-scaling","k":$k,""" +
          f""""base_docs":$nBase,"scaled_docs":$nScaled,""" +
          f""""base_rows":$nb1,"scaled_rows":$nsK,""" +
          f""""base_sec":$sb%.2f,"scaled_sec":$ss%.2f,""" +
          f""""time_ratio":${ss / sb}%.2f,"per_copy":${ss / sb / k}%.3f}""")
      case "graph" =>
        // The iterative-graph floor claim, measured instead of argued:
        // the g-census (PERF_NOTES §graph) shows the family's sf0.1
        // ratios are per-round scheduling floor (2-9 MB of real traffic
        // under 1-3 s of wall). If that is true, K x the edges must
        // cost FAR less than K x the wall — each round's constant
        // job/stage cost is paid once regardless of data volume. The
        // K x graph is K disjoint isomorphic copies (node ids offset
        // into disjoint ranges): per-round join/aggregate work grows
        // exactly K-fold, rounds stay 5 by construction.
        val ps = Tables.load(spark, sfDir, "lineitem")
          .select(col("l_partkey").as("p"), col("l_suppkey").as("sk"))
          .distinct()
        val edges1 = ps.as("a").join(ps.as("b"),
            col("a.p") === col("b.p") && col("a.sk") < col("b.sk"))
          .select(col("a.sk").as("d1"), col("b.sk").as("d2"))
          .distinct()
          .localCheckpoint(true)
        val off = edges1.agg(max(greatest(col("d1"), col("d2"))))
          .collect()(0).getLong(0) + 1
        val edgesK = edges1
          .withColumn("cp", explode(expr(s"sequence(0, ${k - 1})")))
          .select((col("d1") + col("cp") * off).as("d1"),
            (col("d2") + col("cp") * off).as("d2"))
          .localCheckpoint(true)
        val (e1, eK) = (edges1.count(), edgesK.count())
        graft.queries.GraphOps.pagerankOf(edges1).count() // warmup
        val (n1, s1) = timed(graft.queries.GraphOps.pagerankOf(edges1))
        val (nK, sK) = timed(graft.queries.GraphOps.pagerankOf(edgesK))
        println(f"""{"rehearsal":"graph-pagerank-scaling","k":$k,""" +
          f""""base_edges":$e1,"scaled_edges":$eK,"base_nodes":$n1,""" +
          f""""scaled_nodes":$nK,"base_sec":$s1%.2f,"scaled_sec":$sK%.2f,""" +
          f""""time_ratio":${sK / s1}%.2f,"per_copy":${sK / s1 / k}%.3f}""")
        // triangle counting (the g3/g10 machinery) on the SAME disjoint
        // copies, renamed to its (p1, p2) contract: degree orientation
        // must hold the wedge join near m^1.5 — K disjoint copies give
        // exactly K x the wedges, so wall ~ K x amortized by the floor
        val te1 = edges1.select(col("d1").as("p1"), col("d2").as("p2"))
          .localCheckpoint(true)
        val teK = edgesK.select(col("d1").as("p1"), col("d2").as("p2"))
          .localCheckpoint(true)
        graft.queries.GraphOps.triangleCounts(te1).count() // warmup
        val (tn1, ts1) = timed(graft.queries.GraphOps.triangleCounts(te1))
        val (tnK, tsK) = timed(graft.queries.GraphOps.triangleCounts(teK))
        println(f"""{"rehearsal":"graph-triangles-scaling","k":$k,""" +
          f""""base_edges":$e1,"scaled_edges":$eK,"base_nodes":$tn1,""" +
          f""""scaled_nodes":$tnK,"base_sec":$ts1%.2f,"scaled_sec":$tsK%.2f,""" +
          f""""time_ratio":${tsK / ts1}%.2f,"per_copy":${tsK / ts1 / k}%.3f}""")
      case _ =>
        // warmup (codegen, broadcast machinery), then timed passes
        lshPairs(base).count()
        val (pairs1, sec1) = timed(lshPairs(base))
        val (pairsK, secK) = timed(lshPairs(scaled))

        println(f"""{"rehearsal":"lsh-dedup-scaling","k":$k,"base_docs":$nBase,""" +
          f""""scaled_docs":$nScaled,"base_pairs":$pairs1,"scaled_pairs":$pairsK,""" +
          f""""base_sec":$sec1%.2f,"scaled_sec":$secK%.2f,""" +
          f""""time_ratio":${secK / sec1}%.2f,"per_copy":${secK / sec1 / k}%.3f}""")
    }
    spark.stop()
  }
}
