package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Streaming operators over the documents corpus — the ingestion-time
  * form of the text/dedup surface (a crawl arrives as a stream, not a
  * table).
  *
  * The KMV sketch here is the streaming twin of the batch
  * `t12_kmv_distinct` gate: per key, state holds only the k smallest
  * DISTINCT 60-bit hashes (k longs — bounded regardless of stream
  * length), and because "the k minima of a set" is order-independent,
  * the final estimate is deterministic: any arrival order, any
  * partitioning, same answer as the batch sketch over the same corpus.
  * That determinism is what engine-native streaming HLL cannot offer and
  * is why the spec can assert exact equality with the batch gate. */
object CorpusStream {

  /** File-source stream over a directory of documents parquet. The
    * required upfront schema is taken from the files themselves (one
    * footer pass at stream definition time), never assumed — a hardcoded
    * schema silently reinterprets columns when the writer's physical
    * types drift (the events-ts lesson). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    // cold-start fallback when the directory has no footers to infer
    // from yet (see EventStream.read) — the documented documents layout
    val native = try spark.read.parquet(dir).schema catch {
      case _: org.apache.spark.sql.AnalysisException =>
        org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
    }
    spark.readStream.schema(native).parquet(StreamPath.resolve(spark, dir))
  }

  /** The STREAMABLE half of the batch d15 curation funnel: the length
    * band and the integer cross-multiplied alpha-ratio quality gate are
    * row-local (pure map, identical expressions to the batch query),
    * and exact content dedup becomes a streaming `dropDuplicates` on
    * the md5 hash — one state row per distinct content, "keep the first
    * ARRIVAL" (the batch keeps the lowest doc_id; which member survives
    * differs, the surviving hash SET is identical — what the spec
    * asserts). The corpus-global stages are deliberately absent:
    * boilerplate (d13) needs corpus-wide document frequencies and
    * survivor selection needs the whole dup group — those are batch
    * passes by nature, and the funnel documents that boundary. In
    * production the dedup state bounds via
    * `withWatermark + dropDuplicatesWithinWatermark` once documents
    * carry an ingest timestamp. */
  def curationSurvivors(docs: DataFrame): DataFrame =
    docs.filter(col("n_chars") >= 100 && col("n_chars") <= 20000)
      .filter(lit(10) * length(regexp_replace(lower(col("text")), "[^a-z]", ""))
        >= lit(6) * col("n_chars"))
      .withColumn("hash", md5(col("text")))
      .dropDuplicates("hash")

  final case class KeyHash(key: String, hl: Long)
  final case class KmvEstimate(key: String, n_tracked: Int, kth: Long, est: Double)

  final case class SourceTokens(source: String, toks: Long)
  final case class BudgetStatus(source: String, cum_tokens: Long,
      budget: Long, over_budget: Boolean)

  /** Streaming per-source token-budget monitor — the ingestion-time twin
    * of batch p14's budget allocation: as the crawl streams in, each
    * source's CUMULATIVE token count accrues in `mapGroupsWithState`
    * (state = ONE long per source — bounded by the source alphabet, not
    * the stream) and every touched source emits its running total plus
    * the over-budget flag each micro-batch. A production intake wires
    * the flag to back-pressure/drop; the spec asserts the final
    * cumulative totals equal the batch rollup exactly (integer sums —
    * arrival order and partitioning cannot change them). */
  def budgetMonitor(docs: DataFrame, budgets: Map[String, Long]): Dataset[BudgetStatus] = {
    import docs.sparkSession.implicits._
    val perDoc = docs.select(col("source"),
        graft.functions.token_count(col("text")).cast("long").as("toks"))
      .as[SourceTokens]
    perDoc.groupByKey(_.source)
      .mapGroupsWithState[Long, BudgetStatus](GroupStateTimeout.NoTimeout) {
        (source: String, rows: Iterator[SourceTokens], state: GroupState[Long]) =>
          val cum = state.getOption.getOrElse(0L) + rows.map(_.toks).sum
          state.update(cum)
          val budget = budgets.getOrElse(source, Long.MaxValue)
          BudgetStatus(source, cum, budget, cum > budget)
      }
  }

  /** Tokenize a document stream into md5-hashed (lang, token) pairs —
    * identical hashing to the batch t12 gate. */
  def hashedTokens(docs: DataFrame): Dataset[KeyHash] = {
    import docs.sparkSession.implicits._
    docs.select(col("lang").as("key"),
        explode(split(trim(col("text")), "\\s+")).as("tok"))
      .select(col("key"),
        expr("md5_bits(tok, 15)").as("hl"))
      .as[KeyHash]
  }

  /** Per-key KMV distinct estimate, updated each micro-batch. State per
    * key: the k smallest distinct hashes (a sorted Vector of <= k longs).
    * Emits the current estimate whenever a batch touches the key; with
    * fewer than k distinct hashes seen the estimate is the exact tracked
    * count. est = (k-1) * 2^60 / h_(k), matching the batch gate. */
  def kmvDistinct(hashed: Dataset[KeyHash], k: Int = 16): Dataset[KmvEstimate] = {
    import hashed.sparkSession.implicits._
    hashed.groupByKey(_.key)
      .mapGroupsWithState[Vector[Long], KmvEstimate](GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[KeyHash], state: GroupState[Vector[Long]]) =>
          val prev = state.getOption.getOrElse(Vector.empty[Long])
          // merge: distinct k-minima of (state ∪ batch) — order-independent
          val merged = (prev ++ rows.map(_.hl)).distinct.sorted.take(k)
          state.update(merged)
          val est =
            if (merged.size < k) merged.size.toDouble
            // HALF_UP at 4dp = Spark's round(), so the spec can compare
            // against the batch gate's rounded column bit-for-bit
            else BigDecimal((k - 1).toDouble * 1152921504606846976.0 / merged.last)
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          KmvEstimate(key, merged.size, if (merged.isEmpty) 0L else merged.last, est)
      }
  }
}
