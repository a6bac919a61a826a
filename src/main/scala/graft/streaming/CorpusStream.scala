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
  def read(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 0): DataFrame = {
    // cold-start fallback when the directory has no footers to infer
    // from yet (see EventStream.read) — the documented documents layout
    val native = try spark.read.parquet(dir).schema catch {
      case _: org.apache.spark.sql.AnalysisException =>
        org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
    }
    StreamPath.parquetStream(spark, dir, native, maxFilesPerTrigger)
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

  final case class DedupHit(doc_id: Long, exact: Boolean, nb: Long,
      cd: Option[Long], nc: Option[Long])
  final case class DedupState(exact: Boolean, nb: Long, m: Map[Long, Long],
      nc: Map[Long, Long])
  final case class DedupStatus(doc_id: Long, status: String)

  /** Streaming incremental dedup classification — batch d11's streaming
    * twin: each ARRIVING document is classified `exact_dup` /
    * `near_dup` / `new` against a STATIC standing corpus, at ingest
    * time (the accept/reject decision a crawl intake makes per page).
    *
    * Dataflow: the corpus compiles ONCE into two static relations — the
    * distinct content-hash set (broadcast into a row-local left join)
    * and the per-doc distinct shingle relation with set sizes. Arriving
    * docs shingle row-locally (`word_shingle_hashes`, the d2/d11
    * idiom), stream-static LEFT-join their shingles to the corpus
    * relation, and ONE `mapGroupsWithState` per doc accumulates the
    * per-corpus-candidate overlap m. The decision is exact integer
    * arithmetic: jaccard >= 0.5 iff 3m >= nb + nc — no float enters, so
    * arrival order and partitioning cannot flip a classification, and
    * the spec asserts bit-equality with the batch d11 statuses.
    *
    * State per arriving doc is bounded by its CANDIDATE set (corpus
    * docs sharing >= 1 shingle — the same bound batch d11's broadcast
    * join rides); at production scale the corpus shingle relation
    * stays a shuffled (not broadcast) join side and d7's stop-shingle
    * cap bounds hot-shingle fan-out, exactly as the batch query
    * documents. */
  def incrementalDedup(batch: DataFrame, corpus: DataFrame): Dataset[DedupStatus] = {
    import batch.sparkSession.implicits._
    val csh = corpus.select(col("doc_id").as("cd"),
        explode(expr("array_distinct(word_shingle_hashes(text, 3))")).as("h"))
    val cn = csh.groupBy(col("cd")).agg(count(lit(1)).as("nc"))
    val cshn = csh.join(cn, Seq("cd"))
    val chSet = broadcast(
      corpus.select(md5(col("text")).as("ch")).distinct().withColumn("e", lit(1)))
    val hits = batch
      .select(col("doc_id"), md5(col("text")).as("ch"),
        expr("array_distinct(word_shingle_hashes(text, 3))").as("hs"))
      .join(chSet, Seq("ch"), "left")
      .select(col("doc_id"), (col("e") === 1).as("exact"),
        size(col("hs")).cast("long").as("nb"),
        explode_outer(col("hs")).as("h"))
      .join(cshn, Seq("h"), "left")
      .select(col("doc_id"), coalesce(col("exact"), lit(false)).as("exact"),
        col("nb"), col("cd"), col("nc"))
      .as[DedupHit]
    hits.groupByKey(_.doc_id)
      .mapGroupsWithState[DedupState, DedupStatus](GroupStateTimeout.NoTimeout) {
        (doc: Long, rows: Iterator[DedupHit], state: GroupState[DedupState]) =>
          var s = state.getOption.getOrElse(
            DedupState(exact = false, nb = 0L, Map.empty, Map.empty))
          rows.foreach { r =>
            s = s.copy(exact = s.exact || r.exact, nb = math.max(s.nb, r.nb))
            r.cd.foreach { c =>
              s = s.copy(m = s.m.updated(c, s.m.getOrElse(c, 0L) + 1L),
                nc = s.nc.updated(c, r.nc.getOrElse(0L)))
            }
          }
          state.update(s)
          val near = s.m.exists { case (c, m) => 3 * m >= s.nb + s.nc(c) }
          DedupStatus(doc,
            if (s.exact) "exact_dup" else if (near) "near_dup" else "new")
      }
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
