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
    Tables.load(s, dir, "documents")

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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- token counting (whitespace tokenizer), per-language stats ---
    "t1_token_stats" -> ((s, dir) => {
      docs(s, dir)
        .select(col("lang"),
          size(split(trim(col("text")), "\\s+")).as("n_tok"),
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

    // --- per-document quality score (length / alpha ratio / stopwords) ---
    "t2_quality_score" -> ((s, dir) => {
      val d = docs(s, dir)
      val p = padded(d)
      val nTok = size(split(trim(col("text")), "\\s+"))
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
    "t3_lang_id" -> ((s, dir) => {
      val d = docs(s, dir)
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
        .orderBy(col("lang"), col("pred_lang"))
    }),

    // --- document fingerprint: md5 of whitespace-normalized lowercase ---
    "t4_fingerprint" -> ((s, dir) => {
      docs(s, dir)
        .filter(col("doc_id") < 200)
        .select(col("doc_id"),
          substring(md5(regexp_replace(lower(col("text")), "\\s+", " ")), 1, 16).as("fp"))
        .orderBy(col("doc_id"))
    })
  )

  val oracles: Map[String, String] = Map(
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

    "t4_fingerprint" ->
      """SELECT doc_id,
        |  substr(md5(regexp_replace(lower(text), '\s+', ' ', 'g')), 1, 16) AS fp
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin
  )
}
