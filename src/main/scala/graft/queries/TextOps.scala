package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis operators over the `documents` table — the LLM-pipeline
  * surface (language-ID heuristic, quality scoring, token counting,
  * fingerprinting). All pure `org.apache.spark.sql.functions` /
  * whole-stage-codegen expressions: no UDFs anywhere, so the hot path
  * stays inside codegen at 100 TB.
  *
  * Engine-parity notes (Spark vs DuckDB oracle):
  *   - token split is regex `\s+` on trimmed text in both engines
  *     (plain-space split disagrees on runs of whitespace);
  *   - marker-word counts use the replace-length trick — identical
  *     non-overlapping left-to-right replace semantics in both;
  *   - Spark regexp_replace is global by default, DuckDB needs the 'g'
  *     flag — every oracle regexp_replace carries 'g'.
  */
object TextOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.fanout(Tables.load(s, dir, "documents"))

  /** The corpus bigram TYPE table (w1, w2, c12), materialized once per
    * corpus ([[Materialized]], r15): t11's c12/c1 model and t23's
    * margins both derive from it. t21 is deliberately not a consumer —
    * its one corpus exchange is the doc x type scoring relation, which
    * AQE already reuses for its model side. */
  /** The corpus bigram model artifacts (r15): the (w1, w2, c12) type
    * table shared by t11/t21/t23, and the 1-row distinct-token vocab
    * scalar shared by t11/t21 — both from one materialized build family,
    * so neither query pays a separate full-corpus pass for the model
    * side. The vocab build deliberately has NO size >= 2 filter: the
    * smoothing denominator counts every distinct token, including
    * single-token docs' (matching the live aggregates it replaces). */
  private def bigramRels(s: SparkSession, dir: String): Seq[DataFrame] =
    Materialized.rels(s, s"bigrams-${Materialized.dirTag(s, dir)}",
      Seq("c12", "vocab")) {
      val toks = docs(s, dir)
        .select(split(trim(col("text")), "\\s+").as("ts"))
      val c12 = toks
        .filter(size(col("ts")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(ts) - 2), i -> struct(ts[i] AS w1, ts[i+1] AS w2))")).as("b"))
        .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
        .agg(count(lit(1)).as("c12"))
      val vocab = toks.select(explode(col("ts")).as("tok"))
        .agg(countDistinct(col("tok")).as("v"))
      Seq(c12, vocab)
    }

  private def bigramTypes(s: SparkSession, dir: String): DataFrame =
    bigramRels(s, dir).head

  private def bigramVocab(s: SparkSession, dir: String): DataFrame =
    bigramRels(s, dir)(1)

  /** #occurrences of word w (space-padded match) via replace-length.
    * Literal (non-regex) `replace`, like the oracle's `replace` — same
    * non-overlapping left-to-right semantics, and an order of magnitude
    * cheaper than a regexp pass per marker word over the full corpus. */
  private def wordCount(c: org.apache.spark.sql.Column, w: String): org.apache.spark.sql.Column = {
    val pad = s" $w "
    floor((length(c) - length(replace(c, lit(pad), lit("")))) / lit(pad.length))
  }

  // padded text: ' '||text||' ' so boundary words match
  private def padded(df: DataFrame) =
    concat(lit(" "), col("text"), lit(" "))

  /** t3's marker-word language heuristic as a (lang, pred_lang, n)
    * confusion matrix — shared by t3 (raw matrix) and t26 (metrics) so
    * the classifier under evaluation cannot drift from the evaluated. */
  private def langConfusion(d: DataFrame): DataFrame = {
    val p = padded(d)
    val en = wordCount(p, "the") + wordCount(p, "fast") + wordCount(p, "table")
    val de = wordCount(p, "der") + wordCount(p, "und") + wordCount(p, "die")
    val es = wordCount(p, "el") + wordCount(p, "la") + wordCount(p, "los")
    val pred = when(en >= de && en >= es, "en")
      .when(de >= es, "de")
      .otherwise("es")
    d.select(col("lang"), pred.as("pred_lang"))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
  }

  /** t15's engineered-integer-feature linear scorer: (lang, n_chars,
    * logit) per doc, entirely row-local codegen — shared by t15
    * (inference rollup) and t25 (evaluation) so the model cannot drift
    * between the filter and its eval. */
  private def qualityLogit(d: DataFrame): DataFrame = {
    val p = padded(d)
    val nTok = graft.functions.token_count(col("text")).cast("long")
    val alpha = length(regexp_replace(lower(col("text")), "[^a-z]", "")).cast("long")
    val stops = (wordCount(p, "the") + wordCount(p, "a") + wordCount(p, "of")).cast("long")
    d.select(col("lang"), col("n_chars"),
        nTok.as("n_tok"), alpha.as("alpha"), stops.as("stops"))
      .select(col("lang"), col("n_chars"),
        (lit(3L) * expr("(stops * 1000) div n_tok") +
          lit(2L) * expr("(alpha * 1000) div n_chars") -
          lit(5L) * abs(col("n_tok") - 60) - 1700).as("logit"))
  }

  /** Imperative BPE merge-learning kernel, run as ONE task over the
    * (sym, freq) vocabulary (see t14/t16 below for why that placement is
    * the scale-correct one). Semantics are bit-for-bit the oracle CTE's:
    * symbols are the double-space-separated `sym` string's nonempty
    * `"  "`-split tokens; a round counts freq-weighted adjacent pairs,
    * picks the (cnt desc, a asc, b asc) argmax with UTF-8-binary string
    * order (what both engines' ORDER BY uses — Java compareTo is UTF-16
    * order and disagrees above U+FFFF), and applies the merge with the
    * same literal left-to-right non-overlapping replace
    * `' a  b ' -> ' ab '` (java.lang.String.replace == Spark `replace`
    * == DuckDB `replace` semantics). Returns the merge table and the
    * final segmentation.
    */
  private[graft] def bpeLearnKernel(syms: Array[String], freqs: Array[Long],
      rounds: Int): (Array[(Int, String, String, Long)], Array[String]) = {
    def utf8Less(x: String, y: String): Boolean = {
      val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val d = (a(i) & 0xff) - (b(i) & 0xff)
        if (d != 0) return d < 0
        i += 1
      }
      a.length < b.length
    }
    val cur = syms.clone()
    val merges = Array.newBuilder[(Int, String, String, Long)]
    var k = 1
    var done = false
    while (k <= rounds && !done) {
      val counts = new java.util.HashMap[(String, String), Long]()
      var i = 0
      while (i < cur.length) {
        val parts = cur(i).split("  ").filter(_.nonEmpty)
        var j = 0
        while (j < parts.length - 1) {
          counts.merge((parts(j), parts(j + 1)), freqs(i), _ + _)
          j += 1
        }
        i += 1
      }
      var bestPair: (String, String) = null
      var bestCnt = 0L
      counts.forEach { (p, c) =>
        if (bestPair == null || c > bestCnt ||
            (c == bestCnt && (utf8Less(p._1, bestPair._1) ||
              (p._1 == bestPair._1 && utf8Less(p._2, bestPair._2)))))
          { bestPair = p; bestCnt = c }
      }
      if (bestPair == null) done = true // no multi-symbol words left
      else {
        merges += ((k, bestPair._1, bestPair._2, bestCnt))
        val pat = " " + bestPair._1 + "  " + bestPair._2 + " "
        val rep = " " + bestPair._1 + bestPair._2 + " "
        i = 0
        while (i < cur.length) { cur(i) = cur(i).replace(pat, rep); i += 1 }
        k += 1
      }
    }
    (merges.result(), cur)
  }

  /** Symbol count of a kernel-produced segmentation string. */
  private[graft] def bpeSymCount(sym: String): Long =
    sym.split("  ").count(_.nonEmpty).toLong

  /** Horner-form rolling hash of the 8-gram at position i, mod 1000003
    * with base 257, reduced at every step so both engines stay in exact
    * BIGINT range. `arr(j)` renders the j-th character code. */
  private def horner(arr: Int => String): String =
    (1 to 7).foldLeft(s"CAST(${arr(0)} AS BIGINT)")((acc, j) =>
      s"((($acc) * 257 + ${arr(j)}) % 1000003)")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- token counting (whitespace tokenizer), per-language stats ---
    "t1_token_stats" -> ((s, dir) => {
      docs(s, dir)
        .select(col("lang"),
          graft.functions.token_count(col("text")).as("n_tok"),
          col("n_chars"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).cast("long").as("total_tokens"),
          round(avg(col("n_tok")), 4).as("avg_tokens"),
          min(col("n_tok")).as("min_tokens"),
          max(col("n_tok")).as("max_tokens"),
          round(avg(col("n_chars") / col("n_tok")), 4).as("avg_chars_per_tok"))
        .orderBy(col("lang"))
    }),

    // --- vocabulary growth curve (Heaps' law audit) — how fast does the
    //     corpus stop yielding NEW tokens? The tokenizer-budget planner's
    //     question, answered without any multi-pass prefix rescans: each
    //     token's FIRST occurrence is one vocab-sized min(doc_id)
    //     aggregate over the token stream, the growth histogram buckets
    //     those first-occurrences by 100-doc prefix, and the running
    //     vocabulary size is a cumulative sum over the bucket relation —
    //     bounded by corpus_size/100 rows, so the single-partition
    //     window is a constant-size tail, not a corpus window. ---
    "t22_heaps" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // bigram units: the synthetic corpus is a small word bag whose
      // unigram vocabulary saturates in the first docs; pair types keep
      // the curve informative while exercising the same dataflow
      // bigram types keyed by their 60-bit md5 prefix (d2's shingle
      // idiom, n=2): the first-occurrence shuffle moves 8-byte longs
      // instead of ~40-byte pair strings, and the fused
      // word_shingle_hashes kernel replaces the split -> transform ->
      // concat pipeline; the oracle applies the identical hash, so even
      // a (mirrored) collision cannot diverge the gate
      val firstSeen = docs(s, dir)
        .select(col("doc_id"),
          explode(expr("word_shingle_hashes(text, 2)")).as("h"))
        .groupBy(col("h")).agg(min(col("doc_id")).as("fd"))
      val buckets = firstSeen
        .groupBy(expr("fd div 20").as("bucket"))
        .agg(count(lit(1)).as("new_tokens"))
      buckets
        .withColumn("vocab_size", sum(col("new_tokens")).over(
          Window.orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
        .orderBy(col("bucket"))
    }),

    // --- per-document quality score (length / alpha ratio / stopwords) ---
    "t2_quality_score" -> ((s, dir) => {
      val d = docs(s, dir)
      val p = padded(d)
      val nTok = graft.functions.token_count(col("text"))
      val alpha = length(regexp_replace(lower(col("text")), "[^a-z]", ""))
      val stops = wordCount(p, "the") + wordCount(p, "a") + wordCount(p, "of")
      d.select(
          col("doc_id"),
          nTok.cast("long").as("n_tok"),
          round(alpha / col("n_chars"), 4).as("alpha_ratio"),
          stops.cast("long").as("stop_count"),
          round(
            least(col("n_chars") / 500.0, lit(1.0)) * 0.3 +
            (alpha / col("n_chars")) * 0.4 +
            least(stops * lit(5.0) / nTok, lit(1.0)) * 0.3, 4).as("quality"))
        .orderBy(col("doc_id"))
    }),

    // --- n-gram-marker language ID + confusion matrix vs the label ---
    "t3_lang_id" -> ((s, dir) =>
      langConfusion(docs(s, dir)).orderBy(col("lang"), col("pred_lang"))),

    // --- multiclass evaluation of the t3 language-ID heuristic: per
    //     gold class, precision / recall / F1 in exact integer ppm,
    //     plus a trailing '~macro' row (micro-accuracy — which equals
    //     micro-P = micro-R for single-label multiclass — in the
    //     precision/recall columns, macro-F1 = floor-mean of the class
    //     F1s in f1_ppm). The heuristic only ever predicts 3 of the 5
    //     gold languages, so two classes score 0/0 honestly (guarded
    //     divisions, never NULL/NaN). Shape: the one corpus scan t3
    //     already pays, then every metric lives on the <=15-cell
    //     confusion relation — margins, tp diagonal, macro rollup are
    //     all model-sized aggregates. ---
    "t26_langid_eval" -> ((s, dir) => {
      val conf = langConfusion(docs(s, dir)).localCheckpoint(true)
      val gold = conf.groupBy(col("lang")).agg(sum(col("n")).cast("long").as("gold_n"))
      val predm = conf.groupBy(col("pred_lang"))
        .agg(sum(col("n")).cast("long").as("pred_n"))
      val tp = conf.filter(col("lang") === col("pred_lang"))
        .select(col("lang"), col("n").cast("long").as("tp"))
      // FULL OUTER over gold ∪ predicted classes: a class the model
      // predicts but the gold set lacks must still count into pred_n
      // (else macro micro-precision silently overstates); with this
      // corpus gold ⊇ pred so the rows are identical, but the shape is
      // the honest one for any label/marker drift.
      val perClass = gold
        .join(predm.withColumnRenamed("pred_lang", "lang"), Seq("lang"), "full_outer")
        .join(tp, Seq("lang"), "left")
        .na.fill(0L, Seq("gold_n", "tp", "pred_n"))
        .select(col("lang"), col("gold_n"), col("pred_n"), col("tp"),
          when(col("pred_n") > 0, expr("tp * 1000000 div pred_n"))
            .otherwise(0L).as("precision_ppm"),
          when(col("gold_n") > 0, expr("tp * 1000000 div gold_n"))
            .otherwise(0L).as("recall_ppm"))
        .withColumn("f1_ppm",
          when(col("precision_ppm") + col("recall_ppm") > 0,
            expr("2 * precision_ppm * recall_ppm div (precision_ppm + recall_ppm)"))
            .otherwise(0L))
      val macroRow = perClass.agg(
          lit("~macro").as("lang"),
          sum(col("gold_n")).cast("long").as("gold_n"),
          sum(col("pred_n")).cast("long").as("pred_n"),
          sum(col("tp")).cast("long").as("tp"),
          expr("sum(tp) * 1000000 div sum(pred_n)").as("precision_ppm"),
          expr("sum(tp) * 1000000 div sum(gold_n)").as("recall_ppm"),
          expr("sum(f1_ppm) div count(1)").as("f1_ppm"))
      perClass.union(macroRow).orderBy(col("lang"))
    }),

    // --- document fingerprint: md5 of whitespace-normalized lowercase ---
    "t4_fingerprint" -> ((s, dir) => {
      docs(s, dir)
        .filter(col("doc_id") < 200)
        .select(col("doc_id"),
          substring(md5(regexp_replace(lower(col("text")), "\\s+", " ")), 1, 16).as("fp"))
        .orderBy(col("doc_id"))
    }),

    // --- winnowing fingerprints (Schleimer et al. '03): rolling 8-gram
    //     hash (Horner, base 257 mod 1000003), minimum per 4-hash window,
    //     distinct minima = the document sketch. Everything is row-local
    //     higher-order-function arithmetic — no explode, no shuffle
    //     before the final per-doc projection. ---
    "t7_winnow" -> ((s, dir) => {
      val h = horner(j => if (j == 0) "element_at(a, i)" else s"element_at(a, i + $j)")
      docs(s, dir).filter(col("doc_id") < 100)
        // Spark ascii() and DuckDB unicode() agree only on ASCII input, so
        // non-ASCII chars are stripped identically on both sides before
        // hashing (a no-op on the current corpus, which is pure ASCII)
        .withColumn("t7", regexp_replace(col("text"), "[^\\x00-\\x7F]", ""))
        .withColumn("a", expr("transform(sequence(1, length(t7)), i -> ascii(substr(t7, i, 1)))"))
        .withColumn("hs", expr(
          s"CASE WHEN size(a) < 8 THEN array() ELSE transform(sequence(1, size(a) - 7), i -> $h) END"))
        .withColumn("fps", expr(
          "array_distinct(CASE WHEN size(hs) < 4 THEN hs ELSE " +
          "transform(sequence(1, size(hs) - 3), i -> array_min(slice(hs, i, 4))) END)"))
        .select(col("doc_id"),
          size(col("fps")).cast("long").as("n_fp"),
          expr("CAST(aggregate(fps, 0L, (acc, x) -> acc + x) AS BIGINT)").as("sum_fp"))
        .orderBy(col("doc_id"))
    }),

    // --- BPE-ish pre-tokenization (GPT-2-style splitter: letter runs,
    //     digit runs, single punctuation marks) — token-class stats per
    //     source. regexp_extract_all + higher-order filters; tok_chars
    //     exploits that the pattern covers every non-space char exactly
    //     once, so sum(len(tok)) = len(text minus whitespace) without a
    //     per-token aggregate. ---
    "t5_bpe_tokens" -> ((s, dir) => {
      val pat = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
      docs(s, dir)
        .select(col("source"),
          regexp_extract_all(col("text"), lit(pat), lit(0)).as("tk"),
          length(regexp_replace(col("text"), "\\s", "")).as("tok_chars"))
        .select(col("source"), size(col("tk")).as("n_bpe"),
          expr("size(filter(tk, x -> x rlike '^[0-9]+$'))").as("n_num"),
          expr("size(filter(tk, x -> x rlike '^[a-zA-Z]+$'))").as("n_word"),
          col("tok_chars"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_bpe")).cast("long").as("total_bpe"),
          round(avg(col("n_bpe")), 4).as("avg_bpe"),
          sum(col("n_num")).cast("long").as("total_num"),
          (sum(col("n_bpe")) - sum(col("n_num")) - sum(col("n_word"))).cast("long").as("total_punct"),
          round(sum(col("tok_chars")) / sum(col("n_bpe")), 4).as("avg_tok_len"))
        .orderBy(col("source"))
    }),

    // --- the composite training-data pipeline: quality gate -> length
    //     gate -> exact dedup (min doc_id survives per fingerprint) ->
    //     per-(source, lang) corpus stats. Scale shape: the quality/
    //     length gates are map-side (pushed before any exchange), dedup
    //     is one shuffle keyed by the md5 fingerprint (uniform — content
    //     hash), the final rollup a small hash aggregate. ---
    "t6_corpus_filter" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = docs(s, dir)
      val p = padded(d)
      val nTok = graft.functions.token_count(col("text"))
      val alpha = length(regexp_replace(lower(col("text")), "[^a-z]", ""))
      val stops = wordCount(p, "the") + wordCount(p, "a") + wordCount(p, "of")
      val quality = round(
        least(col("n_chars") / 500.0, lit(1.0)) * 0.3 +
        (alpha / col("n_chars")) * 0.4 +
        least(stops * lit(5.0) / nTok, lit(1.0)) * 0.3, 4)
      val scored = d.select(col("doc_id"), col("source"), col("lang"),
          nTok.cast("long").as("n_tok"),
          md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("fp"),
          quality.as("q"))
        .filter(col("q") >= 0.55 && col("n_tok") >= 25)
      scored
        .withColumn("rk", row_number().over(Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
        .filter(col("rk") === 1)
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).cast("long").as("total_tokens"),
          // q is 4-decimal; average in scaled-integer space (exact sum),
          // and round via floor(x+0.5): a .5-boundary mean (e.g. 6647.5/1e4)
          // rounds identically in both engines, unlike round() — Spark
          // rounds the decimal string, DuckDB the raw binary
          (floor(sum(round(col("q") * 10000).cast("long")) / count(lit(1)) + 0.5) / 10000.0)
            .as("avg_quality"))
        .orderBy(col("source"), col("lang"))
    }),

    // --- BM25 ranking (Robertson k1=1.2, b=0.75, +1 idf) of the corpus
    //     against a fixed 3-term query. Scale shape: the query terms are
    //     LITERALS, so per-doc document length AND all three term
    //     frequencies come from ONE native byte-scan of the text
    //     (token_term_counts — no token explode, no (doc, term)
    //     aggregate, no per-term regex pass). Corpus stats (n_docs,
    //     avgdl) and per-term document frequencies fuse into a single
    //     1-row aggregate that BROADCASTS back into the scorer, so the
    //     whole query is two corpus scans and zero corpus-sized
    //     shuffles. ---
    "t8_bm25" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val terms = Seq("spark", "merge", "vector")
      val k1 = 1.2; val b = 0.75
      // two-level select on purpose: CollapseProject refuses to inline a
      // non-cheap alias referenced 4 times, so the kernel runs once per row
      val proj = docs(s, dir)
        .select(col("doc_id"),
          graft.functions.token_term_counts(col("text"), terms).as("c"))
        .select(col("doc_id"), col("c").getItem(0).as("dl"),
          col("c").getItem(1).as("tf0"), col("c").getItem(2).as("tf1"),
          col("c").getItem(3).as("tf2"))
      val stats = proj.agg(
        count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"),
        count_if(col("tf0") > 0).as("df0"),
        count_if(col("tf1") > 0).as("df1"),
        count_if(col("tf2") > 0).as("df2"))
      // per-term parts summed as scaled integers: a 3-double sum is
      // aggregation-order-dependent at the last ulp, which round(_, 6)
      // can surface at a boundary; integers commute exactly (tf = 0
      // contributes exactly 0 via the tf factor in the numerator)
      def p9(tf: org.apache.spark.sql.Column, df: org.apache.spark.sql.Column) =
        round((log((col("n_docs") - df + 0.5) / (df + 0.5) + 1.0) *
          (tf * (k1 + 1)) /
          (tf + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))) * 1e9).cast("long")
      val scored = proj
        .filter(col("tf0") > 0 || col("tf1") > 0 || col("tf2") > 0)
        .crossJoin(broadcast(stats))
        .select(col("doc_id"),
          round((p9(col("tf0"), col("df0")) + p9(col("tf1"), col("df1")) +
            p9(col("tf2"), col("df2"))) / 1e9, 6).as("bm25"))
      // global top-10 via orderBy+limit -> TakeOrderedAndProject (each
      // partition keeps 10 rows, driver merges), NOT an unpartitioned
      // window that would drag every scored doc into one partition;
      // the rank window then runs over just the 10 survivors
      val w = Window.orderBy(col("bm25").desc, col("doc_id"))
      scored.orderBy(col("bm25").desc, col("doc_id")).limit(10)
        .withColumn("rk", row_number().over(w))
        .select(col("doc_id"), col("bm25"), col("rk"))
        .orderBy(col("rk"))
    }),

    // --- vocabulary head: top-20 tokens with cumulative Zipf coverage —
    //     the tokenizer-training sanity sweep. One hash aggregate keyed
    //     by token (the explode is map-side); the ranked head is 20 rows,
    //     so the unpartitioned window runs on a trivial set, and the
    //     integer cumulative sum divides by the broadcast total only at
    //     output. ---
    "t9_vocab" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val freq = docs(s, dir)
        .select(explode(split(trim(col("text")), "\\s+")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      val total = freq.agg(sum(col("cnt")).cast("long").as("total"))
      // top-20 via TakeOrderedAndProject first; the rank + cumulative-sum
      // windows then run over 20 rows (the prefix sums at ranks 1..20
      // only involve the top-20 counts, so the result is unchanged)
      val w = Window.orderBy(col("cnt").desc, col("token"))
      freq.orderBy(col("cnt").desc, col("token")).limit(20)
        .withColumn("rank", row_number().over(w))
        .withColumn("cum", sum(col("cnt")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .crossJoin(broadcast(total))
        .select(col("rank"), col("token"), col("cnt"),
          round(col("cum") / col("total"), 6).as("coverage"))
        .orderBy(col("rank"))
    }),

    // --- linear quality-classifier INFERENCE (the fasttext-style filter
    //     pass of corpus curation): engineered integer features (per-mille
    //     stopword rate, per-mille alpha rate, length deviation) scored by
    //     a fixed weight vector, keep = logit >= 0. The model is
    //     broadcast-constant state; scoring is row-local whole-stage
    //     codegen with NO shuffle before the 5-group lang rollup — the
    //     shape a classifier sweep over 100 TB needs (at real scale the
    //     weights come off a trained model; the dataflow is identical).
    //     Integer features + integer weights keep the logit exact, so
    //     the keep decision can't drift across engines. ---
    "t15_classifier" -> ((s, dir) =>
      qualityLogit(docs(s, dir))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("logit") >= 0, 1L).otherwise(0L)).cast("long").as("n_keep"),
          round(avg(col("logit")), 4).as("avg_logit"))
        .orderBy(col("lang"))),

    // --- classifier EVALUATION (the other half of t15: no filter ships
    //     without precision/recall against a labeled sample): t15's keep
    //     decision scored against an independent gold rule (the length
    //     band a human curation pass would approximate), confusion
    //     matrix + precision/recall/F1 — every metric an exact integer
    //     ppm (F1's harmonic mean as 2pr div (p+r) over the ppm values),
    //     so the eval hash cannot drift on a float division. Shape: one
    //     row-local scoring scan into ONE 4-cell aggregate — the d16/v15
    //     eval pattern applied to the quality filter. ---
    "t25_classifier_eval" -> ((s, dir) => {
      val scored = qualityLogit(docs(s, dir))
        .select(when(col("logit") >= 0, 1L).otherwise(0L).as("pred"),
          when(col("n_chars").between(150, 450), 1L).otherwise(0L).as("gold"))
      scored.agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("pred") * col("gold")).cast("long").as("tp"),
          sum(col("pred") * (lit(1L) - col("gold"))).cast("long").as("fp"),
          sum((lit(1L) - col("pred")) * col("gold")).cast("long").as("fn"),
          sum((lit(1L) - col("pred")) * (lit(1L) - col("gold"))).cast("long").as("tn"))
        .select(col("n_docs"), col("tp"), col("fp"), col("fn"), col("tn"),
          // guarded like t26: a filter that keeps nothing (tp+fp=0) or
          // recalls nothing must report an honest 0, not NULL (Spark)
          // vs a division-by-zero error (DuckDB's //)
          expr("CASE WHEN tp + fp > 0 THEN tp * 1000000 div (tp + fp) ELSE 0 END")
            .as("precision_ppm"),
          expr("CASE WHEN tp + fn > 0 THEN tp * 1000000 div (tp + fn) ELSE 0 END")
            .as("recall_ppm"))
        .select(col("*"),
          expr("CASE WHEN precision_ppm + recall_ppm > 0 THEN " +
            "2 * precision_ppm * recall_ppm div (precision_ppm + recall_ppm) " +
            "ELSE 0 END").as("f1_ppm"))
    }),

    // --- repetition quality signals (Gopher/MassiveText repetition
    //     filters): fraction of 3-gram occurrences that are duplicates
    //     and the share of the single most frequent bigram — the two
    //     signals that catch boilerplate/spam which length and stopword
    //     ratios miss. One generated-column pass + one narrow per-doc
    //     aggregate; everything keys on doc_id (uniform), nothing joins
    //     the corpus against itself. ---
    "t10_repetition" -> ((s, dir) => {
      val base = docs(s, dir).filter(col("doc_id") < 200)
        .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ts"))
        .filter(size(col("ts")) >= 3)
      val g = base.select(col("doc_id"),
        expr("transform(sequence(0, size(ts) - 3), i -> concat_ws(' ', ts[i], ts[i+1], ts[i+2]))").as("g3"),
        expr("transform(sequence(0, size(ts) - 2), i -> concat_ws(' ', ts[i], ts[i+1]))").as("g2"))
        .select(col("doc_id"),
          size(col("g3")).as("n3"), size(array_distinct(col("g3"))).as("d3"),
          col("g2"))
      g.select(col("doc_id"), col("n3"), col("d3"), explode(col("g2")).as("b"))
        .groupBy(col("doc_id"), col("n3"), col("d3"), col("b"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"), col("n3"), col("d3"))
        .agg(max(col("c")).as("maxb"), sum(col("c")).cast("long").as("n2"))
        .select(col("doc_id"),
          round((col("n3") - col("d3")) / col("n3"), 6).as("dup3_frac"),
          round(col("maxb") / col("n2"), 6).as("top_bigram_frac"))
        .orderBy(col("doc_id"))
    }),

    // --- bigram language-model scoring: train add-one-smoothed bigram
    //     statistics on the corpus itself, score docs by their average
    //     next-token probability — the cheap statistical stand-in for
    //     perplexity filtering (CCNet trains a real LM; the plumbing is
    //     identical: model tables built once, then a per-doc join+agg).
    //     Probabilities stay RATIONAL (integer counts divided once, both
    //     engines same IEEE op) and per-doc sums use scaled integers, so
    //     no transcendental (log) ever risks cross-engine ulp drift.
    //     Scale: two hash aggregates build the model; scoring joins on
    //     (w1, w2) then w1 — the w1 join carries Zipf skew (stopword
    //     heads), where the d7-style frequency cap or key salting is the
    //     standing lever. ---
    "t11_bigram_lm" -> ((s, dir) => {
      // t21's per-doc-rollup fuse was EVALUATED here and rejected: t11's
      // model tables derive from raw occurrences more cheaply (map-side
      // partial agg compresses corpus -> V^2 types before one tiny
      // exchange) than via a doc x type rollup, whose exchange is
      // corpus-grained; the scoring side is already bounded by the
      // doc_id probe filter. Measured 0.56 s as-is vs 1.33 s rolled-up
      // at sf0.1.
      val toks = docs(s, dir)
        .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ts"))
      val big = toks.filter(size(col("ts")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(ts) - 2), i -> struct(ts[i] AS w1, ts[i+1] AS w2))")).as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      // model tables AND the vocab scalar from the shared materialized
      // bigram artifacts (r15): with vocab no longer a live corpus
      // aggregate, the only corpus consumer left is the probe side,
      // whose doc_id < 100 filter pushes to the scan
      val c12 = bigramTypes(s, dir)
      val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).cast("long").as("c1"))
      val vocab = bigramVocab(s, dir)
      val scored = big.filter(col("doc_id") < 100)
        .join(c12, Seq("w1", "w2"))
        .join(c1, Seq("w1"))
        .crossJoin(broadcast(vocab))
        .select(col("doc_id"),
          floor((col("c12") + 1) / (col("c1") + col("v")) * 1e9 + 0.5).as("p9"))
      scored.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          round(sum(col("p9")) / 1e9 / count(lit(1)), 6).as("avg_p"))
        .orderBy(col("doc_id"))
    }),

    // --- corpus-LM perplexity scoring: every document scored by the
    //     add-one-smoothed bigram LM the corpus itself induces (t11's
    //     model, applied corpus-wide), rolled into perplexity bands —
    //     the model-based quality filter (CCNet/Gopher-style): docs
    //     whose perplexity sits far out of band are boilerplate or
    //     gibberish. Determinism: bigram probability quantizes to
    //     integer nano-units first (t11's hash-matched p9), surprisal
    //     -ln(p9/1e9) quantizes to micro-nats per bigram, and the
    //     per-doc mean is an integer division — every cross-engine sum
    //     is BIGINT, ln/exp only ever see identical doubles. Shape:
    //     one (doc, bigram)-grained aggregate feeds both the LM tables
    //     and the scoring probe (c12 stays an equi-join on (w1, w2); c1
    //     and the vocab scalar broadcast) and each doc collapses to one
    //     row before the tiny band rollup. ---
    "t21_perplexity" -> ((s, dir) => {
      // ONE live corpus consumption: the (doc_id, w1, w2) -> k scoring
      // relation (map-side partial agg compresses corpus -> doc x type
      // before the only corpus-scale exchange). The MODEL side — c12,
      // c1, and the vocab scalar — reads the shared materialized bigram
      // artifacts (r15): earlier rounds hung the model off dw's exchange
      // via AQE reuse (free vs a rebuild, so a c12 artifact alone saved
      // nothing — the original r15 bigram pre-registration's call), but
      // the vocab scalar still cost its OWN full corpus pass; once vocab
      // rides the artifact family, the model side leaves the live plan
      // entirely and dw's exchange serves exactly its one probe
      // consumer. The broadcast is the MODEL (type relation, the bounded
      // side at corpus scale; V^2 worst-case is Zipf-truncated in
      // practice — if the model outgrows broadcast, the lever is a plain
      // shuffle join on (w1, w2), not a dw re-cluster). The risk is
      // ENFORCED, not just documented (ADVICE r10): Spark.session pins
      // spark.sql.maxBroadcastTableSize to 2 GiB, so an outgrown model
      // raises a SparkException naming the conf instead of OOMing the
      // driver; the AQE-adaptive variant (no hint, runtime-stat
      // conversion) was measured and rejected — it must shuffle-write
      // the doc x type probe side before the runtime stats exist
      // (same-window 10-pass pair: ~0.93 s forced vs ~1.02 s adaptive at
      // sf0.1) to buy a fallback this cap already provides loudly.
      // Scoring applies the per-TYPE surprisal to the
      // per-doc counts (sum k*s6 == adding s6 per occurrence — integer
      // math, bit-identical), so no corpus-scale row stream ever reaches
      // the join; the per-doc rollup's partial agg compresses to <=
      // n_docs x partitions rows before its exchange.
      // (The pre-artifact shape deliberately gave the vocabulary its OWN
      // corpus pass rather than deriving it from dw's reused exchange —
      // the derivation put a ~0.6 s re-aggregation on the types-broadcast
      // critical path and benched ~0.35 s SLOWER. The artifact supersedes
      // that trade: now NEITHER arm re-reads the corpus for the model.)
      // ONE doc_id-keyed repartition serves every corpus stage (r20,
      // VERDICT r19 #6): the r19 plan paid THREE corpus exchanges —
      // the round-robin fanout, the (doc_id, w1, w2) aggregate, and
      // the per-doc rollup. HashPartitioning(doc_id) satisfies the
      // clustered distribution of BOTH aggregates (the subset rule:
      // same (doc_id, w1, w2) implies same doc_id partition; the
      // broadcast scoring join preserves the streamed side's
      // partitioning), so the keyed repartition replaces the fanout
      // AND both downstream exchanges run in place — and it moves RAW
      // TEXT rows (~T bytes/doc) where the old aggregate exchange
      // moved the doc x bigram-type stream (~2T: per-doc types barely
      // compress under the partial agg). Same values: aggregation
      // keys/functions unchanged, only their physical placement.
      // Filtered A/B and oracle evidence in OPTIMIZATION_r20.md.
      val toks = Tables.load(s, dir, "documents")
        .repartition(col("doc_id"))
        .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ts"))
      val dw = toks.filter(size(col("ts")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(ts) - 2), i -> struct(ts[i] AS w1, ts[i+1] AS w2))")).as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        .filter(col("w1").isNotNull && col("w2").isNotNull)
        .groupBy(col("doc_id"), col("w1"), col("w2")).agg(count(lit(1)).as("k"))
      val c12 = bigramTypes(s, dir)
      val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).cast("long").as("c1"))
      val vocab = bigramVocab(s, dir)
      val types = c12
        .join(broadcast(c1), Seq("w1"))
        .crossJoin(broadcast(vocab))
        .select(col("w1"), col("w2"),
          floor((col("c12") + 1) / (col("c1") + col("v")) * 1e9 + 0.5).as("p9"))
        .select(col("w1"), col("w2"),
          floor(-log(col("p9") / 1e9) * 1e6 + 0.5).cast("long").as("s6"))
      val perDoc = dw.join(broadcast(types), Seq("w1", "w2"))
        .groupBy(col("doc_id"))
        .agg(sum(col("k")).cast("long").as("nb"),
          sum(col("k") * col("s6")).cast("long").as("ss6"))
        .select(col("nb"), expr("ss6 div nb").as("h6"))
      perDoc.select(col("nb"), exp(col("h6") / 1e6).as("ppl"))
        .groupBy(floor(col("ppl") / 2).cast("long").as("band"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("nb")).cast("long").as("n_bigrams"),
          round(min(col("ppl")), 4).as("ppl_min"),
          round(max(col("ppl")), 4).as("ppl_max"))
        .orderBy(col("band"))
    }),

    // --- KMV (k-minimum-values) distinct-token estimator per language,
    //     audited against the exact count. The scale story: engine-native
    //     sketches (HLL) are implementation-defined and can't be checked
    //     across engines, but KMV built on md5 IS deterministic — at
    //     100 TB the estimate is reproducible on any engine and auditable
    //     on samples, which is why this gate can hash-match it. Estimate:
    //     est = (k-1) * 2^60 / h_(k) over distinct 60-bit hashes. The
    //     rank window here sorts each group's full hash set; the scale
    //     path keeps only k per-partition minima per group (partial
    //     TakeOrdered shape) before a tiny merge. ---
    // --- HyperLogLog distinct-3-gram estimate per language. Unlike
    //     engine-native approx_count_distinct (implementation-defined,
    //     un-auditable across engines), this HLL is built from the same
    //     md5-derived 60-bit hash as the dedup shingles, so the register
    //     state itself is deterministic: register = h mod 64, rho =
    //     leading-zero count of the remaining 54 bits + 1 (via bin()
    //     string length — identical in both engines). The estimator's
    //     harmonic denominator sum(2^-rho_j) is kept EXACT by scaling to
    //     integers (2^(55-rho_j), each a power of two, summed as BIGINT)
    //     — floating addition order never enters, so even the sketch is
    //     hash-gated. Scale shape: two map-side-combinable aggregates
    //     (320 register groups, then 5 langs); a single pass over the
    //     corpus with O(m) state per group, the whole point of HLL. ---
    "t13_hll_shingles" -> ((s, dir) => {
      val sh = docs(s, dir).select(col("lang"),
        explode(expr("word_shingle_hashes(text, 3)")).as("h"))
      val reg = sh
        .select(col("lang"), (col("h") % 64).as("register"),
          expr("h div 64").as("rem"))
        .select(col("lang"), col("register"),
          when(col("rem") === 0, lit(55))
            .otherwise(lit(55) - length(expr("bin(rem)"))).as("rho"))
        .groupBy(col("lang"), col("register"))
        .agg(max(col("rho")).as("rho_j"))
      val hll = reg.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_registers"),
          sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - rho_j AS INT))")).as("sd"))
        .select(col("lang"), col("n_registers"),
          (col("sd") + (lit(64L) - col("n_registers")) *
            expr("shiftleft(CAST(1 AS BIGINT), 55)")).as("denom"))
        // alpha_64 * m^2 * 2^55 precomputed as ONE double literal (the
        // decimal-vs-double literal typing of 0.709 differs across
        // engines; a single constant parses to the same IEEE double)
        .withColumn("est_distinct", expr(
          "CAST(floor(1.0462993238608057e20 / denom + 0.5) AS BIGINT)"))
      val exact = sh.groupBy(col("lang")).agg(count_distinct(col("h")).as("n_exact"))
      hll.join(exact, Seq("lang"))
        .select(col("lang"), col("n_registers"), col("denom"),
          col("est_distinct"), col("n_exact"))
        .orderBy(col("lang"))
    }),

    "t12_kmv_distinct" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // k = 16: the synthetic corpus has ~31 distinct tokens per language
      // at every SF, so a larger k would leave no rank-k hash to estimate
      // from (production k is 256-1024; the estimator is k-agnostic)
      val k = 16
      val h = docs(s, dir)
        .select(col("lang"), explode(split(trim(col("text")), "\\s+")).as("tok"))
        .select(col("lang"),
          expr("md5_bits(tok, 15)").as("hl"))
        .distinct()
      val w = Window.partitionBy(col("lang")).orderBy(col("hl"))
      val est = h.withColumn("rk", row_number().over(w))
        .filter(col("rk") === k)
        .select(col("lang"),
          round(lit((k - 1).toDouble) * lit(1152921504606846976.0) / col("hl"), 4)
            .as("kmv_est"))
      val exact = h.groupBy(col("lang")).agg(count(lit(1)).as("n_exact"))
      exact.join(est, Seq("lang"))
        .select(col("lang"), col("n_exact"), col("kmv_est"))
        .orderBy(col("lang"))
    }),

    // --- BPE merge learning: learn the first 5 byte-pair-encoding merges
    //     from the corpus, the way production tokenizer trainers do it —
    //     pair statistics come from the (word, freq) VOCABULARY, not the
    //     raw corpus (Zipf compaction: the corpus shuffles once into the
    //     tiny vocab, then every iteration runs on vocab-sized data), and
    //     each learned merge broadcasts back into the segmentation.
    //     Words are held as double-space-separated symbol strings
    //     ("  a  b  "); applying merge (a,b) is then a literal
    //     `replace(' a  b ' -> ' ab ')` whose left-to-right
    //     non-overlapping scan IS the BPE merge rule, and the shared
    //     boundary space survives for back-to-back occurrences (both
    //     engines' `replace` has identical semantics — same trick as
    //     wordCount above). Argmax ties break on (count desc, pair) so
    //     the merge sequence is fully deterministic.
    //     Execution shape: merge learning is INHERENTLY sequential (each
    //     round's counts depend on the previous merge) over VOCAB-sized
    //     state — and t14's vocabulary comes from a bounded 100-doc
    //     sample, so it is tiny at ANY corpus scale. Running the 5
    //     rounds as distributed jobs pays 5-15x Spark's per-job floor
    //     (measured: ~0.3 s/job against a 31-row vocab) for zero
    //     parallelism; instead the distributed part is exactly the
    //     corpus-scale pass (sample scan + word count), and the rounds
    //     run in ONE task via [[bpeLearnKernel]] — the same shape
    //     production tokenizer trainers use (distributed count, local
    //     merge loop). One Spark job end-to-end. ---
    "t14_bpe_learn" -> ((s, dir) => {
      import s.implicits._
      // plain load, no fanout: the bounded 100-doc sample makes the scan
      // stage trivially small at any corpus scale — a round-robin
      // exchange would only add a stage
      Tables.load(s, dir, "documents").filter(col("doc_id") < 100)
        .select(explode(split(trim(col("text")), "\\s+")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("freq"))
        .select(
          concat(lit("  "), regexp_replace(col("word"), "(.)", "$1  ")).as("sym"),
          col("freq"))
        .as[(String, Long)]
        .coalesce(1)
        .mapPartitions { it =>
          val (syms, freqs) = it.toArray.unzip
          bpeLearnKernel(syms, freqs, 5)._1.iterator
        }
        .toDF("rank", "a", "b", "cnt").orderBy(col("rank"))
    }),

    // --- BPE APPLICATION: t14 learns the merges; this runs the learned
    //     tokenizer over the whole corpus and reports per-source token
    //     compression. The production trick is word-level caching: BPE
    //     segmentation depends only on the word TYPE, so the merges are
    //     applied once per vocabulary entry and the corpus just joins the
    //     (word -> token count) table — vocab-sized, broadcast — instead
    //     of re-segmenting every occurrence. Corpus touched twice (vocab
    //     build + final join), both map-side-combining aggregates. ---
    "t16_bpe_apply" -> ((s, dir) => {
      import s.implicits._
      val words = docs(s, dir)
        .select(col("source"), explode(split(trim(col("text")), "\\s+")).as("word"))
      val vocab = words.groupBy(col("word")).agg(count(lit(1)).as("freq"))
      // the corpus shuffles once into the Zipf-compact vocab; the 5
      // inherently-sequential merge rounds then run in ONE task via
      // bpeLearnKernel (see t14 — 5 distributed jobs against vocab-sized
      // data only pay the per-job floor), which also emits each word's
      // final segmentation, so learning + application of the tokenizer
      // to the vocabulary is a single pass
      val vocabSym = vocab.select(col("word"),
        concat(lit("  "), regexp_replace(col("word"), "(.)", "$1  ")).as("sym"),
        col("freq"))
      // spark.graft.bpe.minFreq is the >=10^8-type lever (the standard
      // trainer move): learning runs on the Zipf HEAD (freq >= minFreq,
      // bounding the single kernel task's input), and application
      // becomes fully DISTRIBUTED — the <=5 learned merges collect to
      // the driver (same traffic class as a broadcast build) and apply
      // to every word as the same literal left-to-right replace chain
      // the kernel uses, so head-word segmentations are bit-identical
      // to the kernel's (BpeMinFreqSpec proves it on this corpus).
      // Default 1 = no cap: the full vocabulary goes through the
      // single-task kernel, round-7 behavior and hash exactly.
      val minFreq = s.conf.getOption("spark.graft.bpe.minFreq").map(_.toLong).getOrElse(1L)
      val toks =
        if (minFreq <= 1L)
          vocabSym
            .as[(String, String, Long)]
            .coalesce(1)
            .mapPartitions { it =>
              val arr = it.toArray
              val finalSyms = bpeLearnKernel(arr.map(_._2), arr.map(_._3), 5)._2
              arr.iterator.zip(finalSyms.iterator)
                .map { case ((w, _, _), fs) => (w, bpeSymCount(fs)) }
            }
            .toDF("word", "n_sym")
        else {
          val merges = vocabSym.filter(col("freq") >= minFreq)
            .as[(String, String, Long)]
            .coalesce(1)
            .mapPartitions { it =>
              val arr = it.toArray
              bpeLearnKernel(arr.map(_._2), arr.map(_._3), 5)._1.iterator
            }
            .collect()
          val seg = merges.sortBy(_._1).foldLeft(col("sym")) { case (c, (_, a, b, _)) =>
            replace(c, lit(s" $a  $b "), lit(s" $a$b "))
          }
          vocabSym.select(col("word"), seg.as("fs"))
            .select(col("word"),
              expr("size(filter(split(fs, '  '), x -> x != ''))").cast("long")
                .as("n_sym"))
        }
      // toks is VOCAB-sized (word types, Zipf-compact — corpus-
      // sublinear but unbounded; BroadcastAudit executes a 5M-row
      // bound, r19). Broadcast is right while the vocabulary fits the
      // session's loud 2 GiB ceiling (Spark.scala); past that the
      // remediation is dropping the hint for a plain shuffle join on
      // `word` — segmentation stays type-level either way.
      words.join(broadcast(toks), Seq("word"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_words"),
          sum(length(col("word"))).cast("long").as("n_chars_tok"),
          sum(col("n_sym")).cast("long").as("n_bpe"),
          round(sum(length(col("word"))).cast("double") / sum(col("n_sym")), 6)
            .as("chars_per_tok"))
        .orderBy(col("source"))
    }),

    // --- rare-term tf-idf cosine pairs: the WEIGHTED companion of d2's
    //     Jaccard — an inverted-index (term-bucket) pair merge where each
    //     shared term contributes tf1*tf2*iw^2. The idf surrogate is
    //     LINEAR and integer ((N*100) div df) rather than logarithmic:
    //     ln() is libm-dependent and a one-ulp disagreement at a rounding
    //     boundary would poison a hash gate, while integer division is
    //     bit-identical everywhere — same ordering of weights, exact
    //     cross-engine. Only terms with 2 <= df <= 100 enter (the
    //     d7-style stop-term cap: pair work is bounded by sum(df^2) and
    //     a 100 TB corpus's head terms would otherwise dominate);
    //     norms use the SAME capped vocabulary so cos <= 1 exactly.
    //     All sums are BIGINT (aggregation-order-free); the one
    //     sqrt/division per surviving pair runs on exact integers, so
    //     the doubles are deterministic under any partitioning. ---
    "t17_tfidf_pairs" -> ((s, dir) => {
      val d = docs(s, dir)
      // Per-doc term frequencies are ROW-LOCAL: sort the doc's token
      // array and run-length its runs with pure array expressions — the
      // round-6 shape shuffled every raw (doc, word) occurrence to a
      // (doc_id, w) groupBy and then re-shuffled the result by w to meet
      // the df join; both corpus-scale exchanges are gone (the only ones
      // left are vocab-grained: the df build and the term-bucket merge).
      val tfArr =
        "CASE WHEN size(ws) = 0 THEN array() ELSE " +
        "zip_with(starts, concat(slice(starts, 2, size(starts)), array(size(ws))), " +
        "(a, b) -> struct(ws[a] AS w, CAST(b - a AS BIGINT) AS tf)) END"
      val tf = d
        .select(col("doc_id"),
          expr("array_sort(split(trim(lower(text)), '\\\\s+'))").as("ws"))
        .select(col("doc_id"), col("ws"), expr(
          "filter(sequence(0, size(ws) - 1), i -> i = 0 OR ws[i] != ws[i-1])").as("starts"))
        .select(col("doc_id"), explode(expr(tfArr)).as("p"))
        .select(col("doc_id"), col("p.w").as("w"), col("p.tf").as("tf"))
      val nd = d.groupBy().agg(count(lit(1)).as("n_docs"))
      // rare-term table: df-capped at 100, so it is vocab-BOUNDED (and
      // far smaller than the vocab) — broadcast it instead of
      // repartitioning the corpus-scale tf stream onto w
      val dfq = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2 && col("df") <= 100)
      val wtf = tf.join(broadcast(dfq), Seq("w")).crossJoin(broadcast(nd))
        .select(col("doc_id"), col("w"), col("tf"),
          expr("(n_docs * 100) div df").as("iw"))
      val norms = wtf.groupBy(col("doc_id"))
        .agg(sum(expr("tf * tf * iw * iw")).cast("long").as("nrm2"))
      val dots = wtf.groupBy(col("w"), col("iw"))
        .agg(sort_array(collect_list(struct(col("doc_id"), col("tf")))).as("ds"))
        .filter(size(col("ds")) > 1)
        .select(col("iw"), explode(expr(
          "flatten(transform(ds, a -> transform(filter(ds, b -> b.doc_id > a.doc_id), " +
            "b -> struct(a.doc_id AS d1, b.doc_id AS d2, a.tf AS tf1, b.tf AS tf2))))"))
          .as("p"))
        .select(col("p.d1").as("d1"), col("p.d2").as("d2"),
          (col("p.tf1") * col("p.tf2") * col("iw") * col("iw")).as("c"))
        .groupBy(col("d1"), col("d2")).agg(sum(col("c")).cast("long").as("dot"))
      dots
        .join(norms.select(col("doc_id").as("d1"), col("nrm2").as("m1")), Seq("d1"))
        .join(norms.select(col("doc_id").as("d2"), col("nrm2").as("m2")), Seq("d2"))
        .select(col("d1"), col("d2"),
          round(col("dot") / (sqrt(col("m1")) * sqrt(col("m2"))), 6).as("cos"))
        .filter(col("cos") >= 0.5)
        .orderBy(col("d1"), col("d2"))
    }),

    // --- PII detection + redaction (the compliance pass every corpus
    //     release runs): emails and phone numbers matched by regex,
    //     replaced by placeholder tags, with per-source counts and exact
    //     redacted-character accounting. The synthetic corpus carries no
    //     PII, so a deterministic needle mix (0-2 emails + 0-1 phones per
    //     doc, keyed off doc_id) is injected FIRST — the gate then checks
    //     real regex evaluation on both engines, not a vacuous zero. Both
    //     patterns avoid regex features where Java and RE2 dialects
    //     diverge (no backrefs, no lookaround). Row-local codegen end to
    //     end: match counting and replacement never shuffle; the only
    //     exchange is the final 5-group rollup. At 100 TB this is the
    //     model scan-shaped pass — one read, one tiny aggregate. ---
    "t18_pii_redact" -> ((s, dir) => {
      val emailRe = "[A-Za-z0-9._]+@[A-Za-z0-9.]+[A-Za-z]"
      val phoneRe = "[0-9]{3}-[0-9]{4}-[0-9]{4}"
      val d = docs(s, dir).select(col("doc_id"), col("source"),
        concat(col("text"),
          when(col("doc_id") % 3 > 0,
            concat(lit(" contact user"), col("doc_id").cast("string"),
              lit("@example.org"))).otherwise(""),
          when(col("doc_id") % 3 === 2,
            concat(lit(" cc admin"), col("doc_id").cast("string"),
              lit("@corp.net"))).otherwise(""),
          when(col("doc_id") % 2 === 0,
            concat(lit(" call 555-"),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
              lit("-1234"))).otherwise("")).as("t2"))
      d.select(col("source"),
          expr(s"regexp_count(t2, '$emailRe')").cast("long").as("ne"),
          expr(s"regexp_count(t2, '$phoneRe')").cast("long").as("np"),
          (length(col("t2")) - length(
            regexp_replace(regexp_replace(col("t2"), emailRe, "<EMAIL>"),
              phoneRe, "<PHONE>"))).cast("long").as("shrunk"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ne")).cast("long").as("n_emails"),
          sum(col("np")).cast("long").as("n_phones"),
          sum(when(col("ne") + col("np") > 0, 1L).otherwise(0L)).as("n_docs_pii"),
          sum(col("shrunk")).cast("long").as("chars_redacted"))
        .orderBy(col("source"))
    }),

    // --- cross-source contamination matrix: for every ordered source
    //     pair, how much of source A's shingle vocabulary also appears
    //     in source B — the provenance-level overlap scan run before
    //     mixing crawls (is dataset X largely a re-crawl of Y?).
    //     Shape discipline: the corpus relation is only ever AGGREGATED
    //     by (source, h); the pair explode happens per shingle over its
    //     distinct-source list, which is bounded by the SOURCE COUNT
    //     (here 5, never corpus-sized) — so pair work is
    //     O(shingles x sources^2) worst case with a tiny constant, and
    //     the output is the S x S matrix. ---
    "t20_source_overlap" -> ((s, dir) => {
      // ONE corpus consumption, ONE job: collect_set dedups (source, h)
      // pairs map-side inside the shingle-type aggregate, then the pair
      // explode emits ALL ordered pairs INCLUDING the diagonal (s, s) —
      // so the per-source vocabulary sizes are the diagonal counts of
      // the very same S x S aggregate the shared counts come from (no
      // separate sizes branch, no checkpoint for double consumption).
      // The diagonal reaches each off-diagonal row via a window over the
      // <= S^2-row result — S is the source count (5), never
      // corpus-sized, at any corpus scale.
      val pairs = docs(s, dir).select(col("source"),
          explode(expr("word_shingle_hashes(text, 3)")).as("h"))
        .groupBy(col("h"))
        .agg(sort_array(collect_set(col("source"))).as("ss"))
        .select(explode(expr(
          "flatten(transform(ss, a -> transform(ss, " +
            "b -> struct(a AS s1, b AS s2))))")).as("p"))
        .groupBy(col("p.s1").as("s1"), col("p.s2").as("s2"))
        .agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("s1"))
      pairs
        .withColumn("n1", max(when(col("s1") === col("s2"), col("n"))).over(w))
        .filter(col("s1") =!= col("s2"))
        .select(col("s1"), col("s2"), col("n").as("n_shared"),
          round(col("n") / col("n1"), 6).as("overlap_frac"))
        .orderBy(col("s1"), col("s2"))
    }),

    // --- PMI collocation mining: the top bigrams by pointwise mutual
    //     information over the corpus — the phrase-mining pass tokenizer
    //     and vocabulary builders run to decide which word pairs deserve
    //     a fused token ("new york"-style). Determinism: PMI itself is
    //     ln(c12*N / (c1*c2)), but ln is monotone, so RANKING by PMI ==
    //     ranking by the integer lift ratio — the score is the exact
    //     integral lift in parts-per-million, computed in DECIMAL(38,0)
    //     (DuckDB HUGEINT) so c12*N*1e6 can never overflow, and no
    //     transcendental ever enters the gate. Min support c12 >= 5
    //     keeps hapax noise out (the standard collocation cutoff).
    //     Shape: one corpus-scale aggregate into bigram types; the
    //     unigram margins derive FROM the type table (vocab-sized
    //     aggregates, broadcast back); top-20 is a TakeOrdered. ---
    "t23_pmi_collocations" -> ((s, dir) => {
      // the TYPE table is the shared materialized bigram relation (r15);
      // its four consumers (n, both margins, the probe) read the parquet
      // artifact — the per-query localCheckpoint it replaces existed for
      // exactly this multi-consumer reuse
      val c12 = bigramTypes(s, dir)
      val n = c12.agg(sum(col("c12")).cast("long").as("n"))
      val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).cast("long").as("cx"))
      val c2 = c12.groupBy(col("w2")).agg(sum(col("c12")).cast("long").as("cy"))
      c12.filter(col("c12") >= 5)
        .join(broadcast(c1), Seq("w1"))
        .join(broadcast(c2), Seq("w2"))
        .crossJoin(broadcast(n))
        .select(col("w1"), col("w2"), col("c12"),
          expr("CAST(CAST(c12 AS DECIMAL(38,0)) * n * 1000000 div " +
            "(CAST(cx AS DECIMAL(38,0)) * cy) AS BIGINT)").as("lift_ppm"))
        .orderBy(col("lift_ppm").desc, col("w1"), col("w2"))
        .limit(20)
    }),

    // --- Zipf-law fit over the token frequency spectrum: OLS slope and
    //     intercept of ln(freq) on ln(rank) — the corpus-health check a
    //     tokenizer-training run does first (natural text slopes ~ -1;
    //     template/spam corpora flatten or cliff). One corpus-scale hash
    //     aggregate into the vocabulary, TakeOrderedAndProject caps the
    //     spectrum at the top-1000 ranks BEFORE any window (the rank
    //     window then runs over <=1000 rows, never the vocabulary), and
    //     the fit is one tiny moments aggregate with the closed-form
    //     normal-equation solution written identically in both engines
    //     (regr_slope's internal streaming algorithm is not guaranteed to
    //     match a manual moments formula at the last double bit). ---
    "t24_zipf_fit" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val freq = docs(s, dir)
        .select(explode(split(trim(col("text")), "\\s+")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      val w = Window.orderBy(col("cnt").desc, col("token"))
      val xy = freq.orderBy(col("cnt").desc, col("token")).limit(1000)
        .withColumn("rank", row_number().over(w))
        .select(log(col("rank").cast("double")).as("x"),
          log(col("cnt").cast("double")).as("y"))
      xy.agg(count(lit(1)).cast("long").as("n_ranks"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .select(col("n_ranks"),
          round((col("n_ranks") * col("sxy") - col("sx") * col("sy")) /
            (col("n_ranks") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
          round((col("sy") - (col("n_ranks") * col("sxy") - col("sx") * col("sy")) /
            (col("n_ranks") * col("sxx") - col("sx") * col("sx")) * col("sx")) /
            col("n_ranks"), 6).as("intercept"))
    })
  )

  // t14's 5 merge iterations unrolled as chained CTEs: p_k counts
  // adjacent symbol pairs of segmentation s_{k-1} (freq-weighted), t_k is
  // the deterministic argmax, s_k applies the merge via the same literal
  // replace on the double-space symbol string the Spark side uses.
  private val bpeIters: String = (1 to 5).map { k =>
    s"""p$k AS (
       |  SELECT l[i] AS a, l[i+1] AS b, CAST(sum(freq) AS BIGINT) AS cnt
       |  FROM (SELECT list_filter(string_split(sym, '  '), x -> x != '') AS l, freq
       |        FROM s${k - 1}) t,
       |       LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) AS i) u
       |  GROUP BY 1, 2),
       |t$k AS (SELECT $k AS rank, a, b, cnt FROM p$k ORDER BY cnt DESC, a, b LIMIT 1),
       |s$k AS (SELECT replace(sym, ' ' || a || '  ' || b || ' ', ' ' || a || b || ' ') AS sym,
       |               freq
       |        FROM s${k - 1} CROSS JOIN t$k)""".stripMargin
  }.mkString(",\n")

  // t16's variant of the merge loop: the word type rides along so the
  // final segmentation can be joined back to corpus occurrences
  private val bpeApplyIters: String = (1 to 5).map { k =>
    s"""p$k AS (
       |  SELECT l[i] AS a, l[i+1] AS b, CAST(sum(freq) AS BIGINT) AS cnt
       |  FROM (SELECT list_filter(string_split(sym, '  '), x -> x != '') AS l, freq
       |        FROM s${k - 1}) t,
       |       LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) AS i) u
       |  GROUP BY 1, 2),
       |t$k AS (SELECT a, b FROM p$k ORDER BY cnt DESC, a, b LIMIT 1),
       |s$k AS (SELECT word,
       |               replace(sym, ' ' || a || '  ' || b || ' ', ' ' || a || b || ' ') AS sym,
       |               freq
       |        FROM s${k - 1} CROSS JOIN t$k)""".stripMargin
  }.mkString(",\n")

  val oracles: Map[String, String] = Map(
    "t16_bpe_apply" ->
      raw"""WITH cw AS (
         |  SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS word
         |  FROM documents),
         |w AS (SELECT word, count(*) AS freq FROM cw GROUP BY 1),
         |s0 AS (SELECT word, '  ' || regexp_replace(word, '(.)', '\1  ', 'g') AS sym, freq
         |       FROM w),
         |$bpeApplyIters,
         |tok AS (SELECT word,
         |  CAST(len(list_filter(string_split(sym, '  '), x -> x != '')) AS BIGINT) AS n_sym
         |  FROM s5)
         |SELECT cw.source, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(length(cw.word)) AS BIGINT) AS n_chars_tok,
         |  CAST(sum(tok.n_sym) AS BIGINT) AS n_bpe,
         |  round(CAST(sum(length(cw.word)) AS DOUBLE) / sum(tok.n_sym), 6) AS chars_per_tok
         |FROM cw JOIN tok ON cw.word = tok.word
         |GROUP BY cw.source ORDER BY cw.source""".stripMargin,

    "t14_bpe_learn" ->
      raw"""WITH w AS (
         |  SELECT word, count(*) AS freq
         |  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word
         |        FROM documents WHERE doc_id < 100) GROUP BY 1),
         |s0 AS (SELECT '  ' || regexp_replace(word, '(.)', '\1  ', 'g') AS sym, freq FROM w),
         |$bpeIters
         |SELECT rank, a, b, cnt FROM t1 UNION ALL SELECT rank, a, b, cnt FROM t2
         |UNION ALL SELECT rank, a, b, cnt FROM t3 UNION ALL SELECT rank, a, b, cnt FROM t4
         |UNION ALL SELECT rank, a, b, cnt FROM t5 ORDER BY rank""".stripMargin,

    "t13_hll_shingles" ->
      """WITH sh AS (
        |  SELECT lang,
        |    ('0x' || substr(md5(ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]), 1, 15))::BIGINT AS h
        |  FROM (SELECT lang, regexp_split_to_array(trim(text), '\s+') AS ts FROM documents) t,
        |       LATERAL (SELECT unnest(generate_series(1, greatest(len(ts) - 2, 0))) AS i) u),
        |r AS (
        |  SELECT lang, h % 64 AS register,
        |    CASE WHEN h // 64 = 0 THEN 55
        |         ELSE 55 - length(bin(h // 64)) END AS rho
        |  FROM sh),
        |m AS (SELECT lang, register, max(rho) AS rho_j FROM r GROUP BY 1, 2),
        |d AS (
        |  SELECT lang, count(*) AS n_registers,
        |    CAST(sum(1::BIGINT << CAST(55 - rho_j AS INT))
        |         + (64 - count(*)) * (1::BIGINT << 55) AS BIGINT) AS denom
        |  FROM m GROUP BY lang),
        |x AS (SELECT lang, count(DISTINCT h) AS n_exact FROM sh GROUP BY lang)
        |SELECT d.lang, n_registers, denom,
        |  CAST(floor(1.0462993238608057e20 / denom + 0.5) AS BIGINT) AS est_distinct,
        |  n_exact
        |FROM d JOIN x ON d.lang = x.lang ORDER BY d.lang""".stripMargin,

    "t15_classifier" ->
      raw"""WITH t AS (
         |  SELECT lang, n_chars, ' ' || text || ' ' AS p,
         |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok,
         |    CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS BIGINT) AS alpha
         |  FROM documents),
         |u AS (
         |  SELECT lang,
         |    3 * (((CAST(floor((length(p)-length(replace(p,' the ','')))/5.0) AS BIGINT)
         |         + CAST(floor((length(p)-length(replace(p,' a ','')))/3.0) AS BIGINT)
         |         + CAST(floor((length(p)-length(replace(p,' of ','')))/4.0) AS BIGINT)) * 1000) // n_tok)
         |    + 2 * ((alpha * 1000) // n_chars)
         |    - 5 * abs(n_tok - 60) - 1700 AS logit
         |  FROM t)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN logit >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
         |  round(avg(logit), 4) AS avg_logit
         |FROM u GROUP BY lang ORDER BY lang""".stripMargin,

    "t25_classifier_eval" ->
      raw"""WITH t AS (
         |  SELECT n_chars, ' ' || text || ' ' AS p,
         |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok,
         |    CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS BIGINT) AS alpha
         |  FROM documents),
         |u AS (
         |  SELECT
         |    CASE WHEN
         |      3 * (((CAST(floor((length(p)-length(replace(p,' the ','')))/5.0) AS BIGINT)
         |           + CAST(floor((length(p)-length(replace(p,' a ','')))/3.0) AS BIGINT)
         |           + CAST(floor((length(p)-length(replace(p,' of ','')))/4.0) AS BIGINT)) * 1000) // n_tok)
         |      + 2 * ((alpha * 1000) // n_chars)
         |      - 5 * abs(n_tok - 60) - 1700 >= 0 THEN 1 ELSE 0 END AS pred,
         |    CASE WHEN n_chars BETWEEN 150 AND 450 THEN 1 ELSE 0 END AS gold
         |  FROM t),
         |c AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(pred * gold) AS BIGINT) AS tp,
         |    CAST(sum(pred * (1 - gold)) AS BIGINT) AS fp,
         |    CAST(sum((1 - pred) * gold) AS BIGINT) AS fn,
         |    CAST(sum((1 - pred) * (1 - gold)) AS BIGINT) AS tn
         |  FROM u),
         |m AS (
         |  SELECT n_docs, tp, fp, fn, tn,
         |    CASE WHEN tp + fp > 0 THEN tp * 1000000 // (tp + fp) ELSE 0 END AS precision_ppm,
         |    CASE WHEN tp + fn > 0 THEN tp * 1000000 // (tp + fn) ELSE 0 END AS recall_ppm
         |  FROM c)
         |SELECT n_docs, tp, fp, fn, tn, precision_ppm, recall_ppm,
         |  CASE WHEN precision_ppm + recall_ppm > 0
         |       THEN 2 * precision_ppm * recall_ppm // (precision_ppm + recall_ppm)
         |       ELSE 0 END AS f1_ppm
         |FROM m""".stripMargin,

    "t10_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ts
        |  FROM documents WHERE doc_id < 200),
        |f AS (SELECT doc_id, ts FROM t WHERE len(ts) >= 3),
        |g3 AS (SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS g
        |       FROM f, LATERAL (SELECT unnest(generate_series(1, len(ts) - 2)) AS i) u),
        |a3 AS (SELECT doc_id, count(*) AS n3, count(DISTINCT g) AS d3
        |       FROM g3 GROUP BY doc_id),
        |g2 AS (SELECT doc_id, ts[i] || ' ' || ts[i+1] AS g
        |       FROM f, LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i) u),
        |bc AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g),
        |a2 AS (SELECT doc_id, max(c) AS maxb, CAST(sum(c) AS BIGINT) AS n2
        |       FROM bc GROUP BY doc_id)
        |SELECT a3.doc_id, round((n3 - d3) * 1.0 / n3, 6) AS dup3_frac,
        |       round(maxb * 1.0 / n2, 6) AS top_bigram_frac
        |FROM a3 JOIN a2 USING (doc_id) ORDER BY a3.doc_id""".stripMargin,

    "t11_bigram_lm" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ts FROM documents),
        |big AS (
        |  SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
        |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i) u
        |  WHERE len(ts) >= 2),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
        |v AS (SELECT count(DISTINCT tok) AS v FROM (SELECT unnest(ts) AS tok FROM t)),
        |sc AS (
        |  SELECT big.doc_id,
        |    CAST(floor((c12.c12 + 1) * 1.0 / (c1.c1 + v.v) * 1e9 + 0.5) AS BIGINT) AS p9
        |  FROM big JOIN c12 USING (w1, w2) JOIN c1 USING (w1), v
        |  WHERE big.doc_id < 100)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(CAST(sum(p9) AS BIGINT) / 1e9 / count(*), 6) AS avg_p
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // t11's LM tables, surprisal in integer micro-nats per bigram,
    // integer-division per-doc mean; ln/exp see identical doubles
    "t21_perplexity" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ts FROM documents),
        |big AS (
        |  SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
        |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i) u
        |  WHERE len(ts) >= 2),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
        |v AS (SELECT count(DISTINCT tok) AS v FROM (SELECT unnest(ts) AS tok FROM t)),
        |sc AS (
        |  SELECT big.doc_id,
        |    CAST(floor((c12.c12 + 1) * 1.0 / (c1.c1 + v.v) * 1e9 + 0.5) AS BIGINT) AS p9
        |  FROM big JOIN c12 USING (w1, w2) JOIN c1 USING (w1), v),
        |s6 AS (SELECT doc_id,
        |         CAST(floor(-ln(p9 / 1e9) * 1e6 + 0.5) AS BIGINT) AS s6 FROM sc),
        |pd AS (SELECT doc_id, count(*) AS nb,
        |         CAST(sum(s6) AS BIGINT) // count(*) AS h6 FROM s6 GROUP BY 1),
        |pp AS (SELECT nb, exp(h6 / 1e6) AS ppl FROM pd)
        |SELECT CAST(floor(ppl / 2) AS BIGINT) AS band, count(*) AS n_docs,
        |  CAST(sum(nb) AS BIGINT) AS n_bigrams,
        |  round(min(ppl), 4) AS ppl_min, round(max(ppl), 4) AS ppl_max
        |FROM pp GROUP BY 1 ORDER BY band""".stripMargin,

    "t12_kmv_distinct" ->
      """WITH h AS (
        |  SELECT DISTINCT lang,
        |    ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hl
        |  FROM (SELECT lang, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |        FROM documents)),
        |r AS (SELECT lang, hl,
        |        row_number() OVER (PARTITION BY lang ORDER BY hl) AS rk FROM h),
        |est AS (SELECT lang, round(15.0 * 1152921504606846976.0 / hl, 4) AS kmv_est
        |        FROM r WHERE rk = 16),
        |ex AS (SELECT lang, count(*) AS n_exact FROM h GROUP BY lang)
        |SELECT ex.lang, ex.n_exact, est.kmv_est
        |FROM ex JOIN est ON ex.lang = est.lang
        |ORDER BY ex.lang""".stripMargin,

    "t7_winnow" -> {
      val h = horner(j => if (j == 0) "cs[i]" else s"cs[i + $j]")
      s"""WITH t AS (
         |  SELECT doc_id, regexp_replace(text, '[^\\x00-\\x7F]', '', 'g') AS s,
         |    length(regexp_replace(text, '[^\\x00-\\x7F]', '', 'g')) AS n
         |  FROM documents WHERE doc_id < 100),
         |a AS (
         |  SELECT doc_id, n,
         |    list_transform(generate_series(1, n), i -> unicode(substr(s, i, 1))) AS cs
         |  FROM t),
         |h AS (
         |  SELECT doc_id,
         |    CASE WHEN n < 8 THEN [] ELSE
         |      list_transform(generate_series(1, n - 7), i -> $h) END AS hs
         |  FROM a),
         |w AS (
         |  SELECT doc_id,
         |    list_distinct(CASE WHEN len(hs) < 4 THEN hs ELSE
         |      list_transform(generate_series(1, len(hs) - 3),
         |        i -> list_aggregate(hs[i:i+3], 'min')) END) AS fps
         |  FROM h)
         |SELECT doc_id, len(fps) AS n_fp,
         |  CAST(coalesce(list_aggregate(fps, 'sum'), 0) AS BIGINT) AS sum_fp
         |FROM w ORDER BY doc_id""".stripMargin
    },
    "t1_token_stats" ->
      """WITH t AS (
        |  SELECT lang, len(regexp_split_to_array(trim(text), '\s+')) AS n_tok, n_chars
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
        |  round(avg(n_tok), 4) AS avg_tokens,
        |  min(n_tok) AS min_tokens, max(n_tok) AS max_tokens,
        |  round(avg(n_chars * 1.0 / n_tok), 4) AS avg_chars_per_tok
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,

    "t23_pmi_collocations" ->
      raw"""WITH tk AS (
         |  SELECT regexp_split_to_array(trim(text), '\s+') AS ts FROM documents),
         |b AS (
         |  SELECT ts[i] AS w1, ts[i+1] AS w2
         |  FROM tk, LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i) u
         |  WHERE len(ts) >= 2),
         |c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM b GROUP BY 1, 2),
         |n AS (SELECT CAST(sum(c12) AS BIGINT) AS n FROM c12),
         |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS cx FROM c12 GROUP BY 1),
         |c2 AS (SELECT w2, CAST(sum(c12) AS BIGINT) AS cy FROM c12 GROUP BY 1)
         |SELECT c12.w1, c12.w2, c12.c12,
         |  CAST((CAST(c12.c12 AS HUGEINT) * n.n * 1000000)
         |       // (CAST(c1.cx AS HUGEINT) * c2.cy) AS BIGINT) AS lift_ppm
         |FROM c12
         |JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN n
         |WHERE c12.c12 >= 5
         |ORDER BY lift_ppm DESC, c12.w1, c12.w2 LIMIT 20""".stripMargin,

    // the same first-occurrence aggregate + bucketed cumulative sum
    "t22_heaps" ->
      raw"""WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ts FROM documents),
        |toks AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(ts[i] || ' ' || ts[i+1]), 1, 15))::BIGINT AS h
        |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i) u
        |  WHERE len(ts) >= 2),
        |fs AS (SELECT h, min(doc_id) AS fd FROM toks GROUP BY h),
        |b AS (SELECT fd // 20 AS bucket, count(*) AS new_tokens
        |      FROM fs GROUP BY 1)
        |SELECT bucket, new_tokens,
        |  CAST(sum(new_tokens) OVER (ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS vocab_size
        |FROM b ORDER BY bucket""".stripMargin,

    "t2_quality_score" ->
      """WITH t AS (
        |  SELECT doc_id, n_chars, ' ' || text || ' ' AS p,
        |    len(regexp_split_to_array(trim(text), '\s+')) AS n_tok,
        |    length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS alpha
        |  FROM documents),
        |u AS (
        |  SELECT doc_id, n_chars, n_tok, alpha,
        |    CAST(floor((length(p) - length(replace(p, ' the ', ''))) / 5.0) AS BIGINT)
        |    + CAST(floor((length(p) - length(replace(p, ' a ', ''))) / 3.0) AS BIGINT)
        |    + CAST(floor((length(p) - length(replace(p, ' of ', ''))) / 4.0) AS BIGINT) AS stops
        |  FROM t)
        |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
        |  round(alpha * 1.0 / n_chars, 4) AS alpha_ratio,
        |  stops AS stop_count,
        |  round(least(n_chars / 500.0, 1.0) * 0.3 + (alpha * 1.0 / n_chars) * 0.4 +
        |        least(stops * 5.0 / n_tok, 1.0) * 0.3, 4) AS quality
        |FROM u ORDER BY doc_id""".stripMargin,

    "t3_lang_id" ->
      """WITH t AS (
        |  SELECT lang, ' ' || text || ' ' AS p FROM documents),
        |c AS (
        |  SELECT lang,
        |    CAST(floor((length(p)-length(replace(p,' the ','')))/5.0) AS BIGINT)
        |      + CAST(floor((length(p)-length(replace(p,' fast ','')))/6.0) AS BIGINT)
        |      + CAST(floor((length(p)-length(replace(p,' table ','')))/7.0) AS BIGINT) AS en,
        |    CAST(floor((length(p)-length(replace(p,' der ','')))/5.0) AS BIGINT)
        |      + CAST(floor((length(p)-length(replace(p,' und ','')))/5.0) AS BIGINT)
        |      + CAST(floor((length(p)-length(replace(p,' die ','')))/5.0) AS BIGINT) AS de,
        |    CAST(floor((length(p)-length(replace(p,' el ','')))/4.0) AS BIGINT)
        |      + CAST(floor((length(p)-length(replace(p,' la ','')))/4.0) AS BIGINT)
        |      + CAST(floor((length(p)-length(replace(p,' los ','')))/5.0) AS BIGINT) AS es
        |  FROM t)
        |SELECT lang,
        |  CASE WHEN en >= de AND en >= es THEN 'en'
        |       WHEN de >= es THEN 'de' ELSE 'es' END AS pred_lang,
        |  count(*) AS n
        |FROM c GROUP BY 1, 2 ORDER BY lang, pred_lang""".stripMargin,

    "t26_langid_eval" ->
      """WITH t AS (
        |  SELECT lang, ' ' || text || ' ' AS p FROM documents),
        |c AS (
        |  SELECT lang,
        |    CAST(floor((length(p)-length(replace(p,' the ','')))/5.0) AS BIGINT)
        |      + CAST(floor((length(p)-length(replace(p,' fast ','')))/6.0) AS BIGINT)
        |      + CAST(floor((length(p)-length(replace(p,' table ','')))/7.0) AS BIGINT) AS en,
        |    CAST(floor((length(p)-length(replace(p,' der ','')))/5.0) AS BIGINT)
        |      + CAST(floor((length(p)-length(replace(p,' und ','')))/5.0) AS BIGINT)
        |      + CAST(floor((length(p)-length(replace(p,' die ','')))/5.0) AS BIGINT) AS de,
        |    CAST(floor((length(p)-length(replace(p,' el ','')))/4.0) AS BIGINT)
        |      + CAST(floor((length(p)-length(replace(p,' la ','')))/4.0) AS BIGINT)
        |      + CAST(floor((length(p)-length(replace(p,' los ','')))/5.0) AS BIGINT) AS es
        |  FROM t),
        |conf AS (
        |  SELECT lang,
        |    CASE WHEN en >= de AND en >= es THEN 'en'
        |         WHEN de >= es THEN 'de' ELSE 'es' END AS pred_lang,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM c GROUP BY 1, 2),
        |gold AS (SELECT lang, CAST(sum(n) AS BIGINT) AS gold_n FROM conf GROUP BY 1),
        |pm AS (SELECT pred_lang AS lang, CAST(sum(n) AS BIGINT) AS pred_n
        |       FROM conf GROUP BY 1),
        |tp AS (SELECT lang, n AS tp FROM conf WHERE lang = pred_lang),
        |pc AS (
        |  SELECT coalesce(g.lang, pm.lang) AS lang,
        |    coalesce(g.gold_n, 0) AS gold_n,
        |    coalesce(pm.pred_n, 0) AS pred_n, coalesce(tp.tp, 0) AS tp,
        |    CASE WHEN coalesce(pm.pred_n, 0) > 0
        |         THEN coalesce(tp.tp, 0) * 1000000 // pm.pred_n ELSE 0 END
        |      AS precision_ppm,
        |    CASE WHEN coalesce(g.gold_n, 0) > 0
        |         THEN coalesce(tp.tp, 0) * 1000000 // g.gold_n ELSE 0 END
        |      AS recall_ppm
        |  FROM gold g FULL JOIN pm ON g.lang = pm.lang
        |  LEFT JOIN tp ON coalesce(g.lang, pm.lang) = tp.lang),
        |pcf AS (
        |  SELECT *,
        |    CASE WHEN precision_ppm + recall_ppm > 0
        |         THEN 2 * precision_ppm * recall_ppm // (precision_ppm + recall_ppm)
        |         ELSE 0 END AS f1_ppm
        |  FROM pc)
        |SELECT lang, gold_n, pred_n, tp, precision_ppm, recall_ppm, f1_ppm FROM pcf
        |UNION ALL
        |SELECT '~macro', CAST(sum(gold_n) AS BIGINT), CAST(sum(pred_n) AS BIGINT),
        |  CAST(sum(tp) AS BIGINT),
        |  CAST(sum(tp) AS BIGINT) * 1000000 // CAST(sum(pred_n) AS BIGINT),
        |  CAST(sum(tp) AS BIGINT) * 1000000 // CAST(sum(gold_n) AS BIGINT),
        |  CAST(sum(f1_ppm) AS BIGINT) // count(*)
        |FROM pcf
        |ORDER BY lang""".stripMargin,

    "t4_fingerprint" ->
      """SELECT doc_id,
        |  substr(md5(regexp_replace(lower(text), '\s+', ' ', 'g')), 1, 16) AS fp
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,

    "t5_bpe_tokens" ->
      """WITH t AS (
        |  SELECT source,
        |    regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]') AS tk,
        |    length(regexp_replace(text, '\s', '', 'g')) AS tok_chars
        |  FROM documents),
        |u AS (
        |  SELECT source, len(tk) AS n_bpe,
        |    len(list_filter(tk, x -> regexp_full_match(x, '[0-9]+'))) AS n_num,
        |    len(list_filter(tk, x -> regexp_full_match(x, '[a-zA-Z]+'))) AS n_word,
        |    tok_chars
        |  FROM t)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_bpe) AS BIGINT) AS total_bpe,
        |  round(avg(n_bpe), 4) AS avg_bpe,
        |  CAST(sum(n_num) AS BIGINT) AS total_num,
        |  CAST(sum(n_bpe) - sum(n_num) - sum(n_word) AS BIGINT) AS total_punct,
        |  round(sum(tok_chars) * 1.0 / sum(n_bpe), 4) AS avg_tok_len
        |FROM u GROUP BY source ORDER BY source""".stripMargin,

    "t6_corpus_filter" ->
      """WITH t AS (
        |  SELECT doc_id, source, lang, n_chars, ' ' || text || ' ' AS p,
        |    len(regexp_split_to_array(trim(text), '\s+')) AS n_tok,
        |    length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS alpha,
        |    md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
        |  FROM documents),
        |u AS (
        |  SELECT doc_id, source, lang, n_tok, fp,
        |    round(least(n_chars / 500.0, 1.0) * 0.3 + (alpha * 1.0 / n_chars) * 0.4 +
        |      least((CAST(floor((length(p) - length(replace(p, ' the ', ''))) / 5.0) AS BIGINT)
        |           + CAST(floor((length(p) - length(replace(p, ' a ', ''))) / 3.0) AS BIGINT)
        |           + CAST(floor((length(p) - length(replace(p, ' of ', ''))) / 4.0) AS BIGINT))
        |        * 5.0 / n_tok, 1.0) * 0.3, 4) AS q
        |  FROM t),
        |kept AS (
        |  SELECT * FROM (
        |    SELECT doc_id, source, lang, n_tok, q,
        |      row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rk
        |    FROM u WHERE q >= 0.55 AND n_tok >= 25)
        |  WHERE rk = 1)
        |SELECT source, lang, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
        |  floor(sum(CAST(round(q * 10000) AS BIGINT)) * 1.0 / count(*) + 0.5) / 10000.0 AS avg_quality
        |FROM kept GROUP BY source, lang ORDER BY source, lang""".stripMargin,

    "t8_bm25" ->
      """WITH base AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tok FROM documents),
        |d AS (SELECT doc_id, len(tok) AS dl, tok FROM base),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM d),
        |tf AS (
        |  SELECT doc_id, dl, term, count(*) AS tf
        |  FROM (SELECT doc_id, dl, unnest(tok) AS term FROM d)
        |  WHERE term IN ('spark', 'merge', 'vector')
        |  GROUP BY doc_id, dl, term),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |parts AS (
        |  SELECT tf.doc_id,
        |    CAST(round(
        |      ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0) *
        |      (tf.tf * 2.2) /
        |      (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / s.avgdl)) * 1e9) AS BIGINT) AS p9
        |  FROM tf JOIN df USING (term), stats s),
        |scored AS (
        |  SELECT doc_id, round(CAST(sum(p9) AS BIGINT) / 1e9, 6) AS bm25
        |  FROM parts GROUP BY doc_id),
        |ranked AS (
        |  SELECT doc_id, bm25,
        |    row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rk
        |  FROM scored)
        |SELECT doc_id, bm25, rk FROM ranked WHERE rk <= 10 ORDER BY rk""".stripMargin,

    "t9_vocab" ->
      """WITH tok AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token FROM documents),
        |freq AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM freq),
        |r AS (
        |  SELECT token, cnt,
        |    row_number() OVER (ORDER BY cnt DESC, token) AS rank,
        |    CAST(sum(cnt) OVER (ORDER BY cnt DESC, token
        |                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM freq)
        |SELECT rank, token, cnt, round(cum * 1.0 / total, 6) AS coverage
        |FROM r, tot WHERE rank <= 20 ORDER BY rank""".stripMargin,

    "t24_zipf_fit" ->
      raw"""WITH tok AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token FROM documents),
        |freq AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
        |r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token) AS rank FROM freq),
        |xy AS (SELECT ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(cnt AS DOUBLE)) AS y
        |       FROM r WHERE rank <= 1000),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n_ranks, sum(x) AS sx, sum(y) AS sy,
        |             sum(x * y) AS sxy, sum(x * x) AS sxx FROM xy)
        |SELECT n_ranks,
        |  round((n_ranks * sxy - sx * sy) / (n_ranks * sxx - sx * sx), 6) AS slope,
        |  round((sy - (n_ranks * sxy - sx * sy) / (n_ranks * sxx - sx * sx) * sx)
        |        / n_ranks, 6) AS intercept
        |FROM m""".stripMargin,

    "t17_tfidf_pairs" ->
      raw"""WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
        |  FROM documents),
        |tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |dfq AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf
        |        GROUP BY 1 HAVING count(*) BETWEEN 2 AND 100),
        |wtf AS (SELECT tf.doc_id, tf.w, tf.tf, (n_docs * 100) // df AS iw
        |        FROM tf JOIN dfq USING (w) CROSS JOIN nd),
        |nrm AS (SELECT doc_id, CAST(sum(tf * tf * iw * iw) AS BIGINT) AS nrm2
        |        FROM wtf GROUP BY 1),
        |dt AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
        |              CAST(sum(a.tf * b.tf * a.iw * a.iw) AS BIGINT) AS dot
        |       FROM wtf a JOIN wtf b ON a.w = b.w AND a.doc_id < b.doc_id
        |       GROUP BY 1, 2)
        |SELECT d1, d2, round(dot / (sqrt(n1.nrm2) * sqrt(n2.nrm2)), 6) AS cos
        |FROM dt JOIN nrm n1 ON d1 = n1.doc_id JOIN nrm n2 ON d2 = n2.doc_id
        |WHERE round(dot / (sqrt(n1.nrm2) * sqrt(n2.nrm2)), 6) >= 0.5
        |ORDER BY d1, d2""".stripMargin,

    // the same needle injection; DuckDB counts via len(regexp_extract_all)
    // (no regexp_count) and needs the 'g' flag for replace-all
    "t18_pii_redact" ->
      """WITH d AS (
        |  SELECT doc_id, source, text
        |    || CASE WHEN doc_id % 3 > 0
        |         THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.org'
        |         ELSE '' END
        |    || CASE WHEN doc_id % 3 = 2
        |         THEN ' cc admin' || CAST(doc_id AS VARCHAR) || '@corp.net'
        |         ELSE '' END
        |    || CASE WHEN doc_id % 2 = 0
        |         THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '-1234'
        |         ELSE '' END AS t2
        |  FROM documents),
        |m AS (
        |  SELECT source,
        |    CAST(len(regexp_extract_all(t2, '[A-Za-z0-9._]+@[A-Za-z0-9.]+[A-Za-z]')) AS BIGINT) AS ne,
        |    CAST(len(regexp_extract_all(t2, '[0-9]{3}-[0-9]{4}-[0-9]{4}')) AS BIGINT) AS np,
        |    CAST(length(t2) - length(
        |      regexp_replace(regexp_replace(t2,
        |        '[A-Za-z0-9._]+@[A-Za-z0-9.]+[A-Za-z]', '<EMAIL>', 'g'),
        |        '[0-9]{3}-[0-9]{4}-[0-9]{4}', '<PHONE>', 'g')) AS BIGINT) AS shrunk
        |  FROM d)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(ne) AS BIGINT) AS n_emails,
        |  CAST(sum(np) AS BIGINT) AS n_phones,
        |  CAST(sum(CASE WHEN ne + np > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_pii,
        |  CAST(sum(shrunk) AS BIGINT) AS chars_redacted
        |FROM m GROUP BY source ORDER BY source""".stripMargin,

    "t20_source_overlap" ->
      raw"""WITH sh AS (
        |  SELECT DISTINCT source,
        |    ('0x' || substr(md5(ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]), 1, 15))::BIGINT AS h
        |  FROM (SELECT source, regexp_split_to_array(trim(text), '\s+') AS ts FROM documents) t,
        |       LATERAL (SELECT unnest(generate_series(1, greatest(len(ts) - 2, 0))) AS i) u),
        |sizes AS (SELECT source, count(*) AS n_sh FROM sh GROUP BY source),
        |shared AS (
        |  SELECT a.source AS s1, b.source AS s2, count(*) AS n_shared
        |  FROM sh a JOIN sh b ON a.h = b.h AND a.source != b.source
        |  GROUP BY 1, 2)
        |SELECT s1, s2, n_shared,
        |  round(n_shared * 1.0 / sizes.n_sh, 6) AS overlap_frac
        |FROM shared JOIN sizes ON s1 = sizes.source
        |ORDER BY s1, s2""".stripMargin
  )
}
