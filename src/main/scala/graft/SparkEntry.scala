package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator (SURVEY.md §2 plus the
  * LLM-pipeline additions); `oracleSql` holds the DuckDB-equivalent SQL the
  * driver runs for the correctness gate. Column names are aligned between
  * the two on purpose (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  private[graft] def packs: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (graft.queries.Relational.queries, graft.queries.Relational.oracles),
      (graft.queries.Relational2.queries, graft.queries.Relational2.oracles),
      (graft.queries.Relational3.queries, graft.queries.Relational3.oracles),
      (graft.queries.ArrayOps.queries, graft.queries.ArrayOps.oracles),
      (graft.queries.TextOps.queries, graft.queries.TextOps.oracles),
      (graft.queries.DedupOps.queries, graft.queries.DedupOps.oracles),
      (graft.queries.SimilarityOps.queries, graft.queries.SimilarityOps.oracles),
      (graft.queries.EventOps.queries, graft.queries.EventOps.oracles),
      (graft.queries.GraphOps.queries, graft.queries.GraphOps.oracles),
      (graft.queries.ClusterOps.queries, graft.queries.ClusterOps.oracles),
      (graft.queries.MediaQueries.queries, graft.queries.MediaQueries.oracles)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Each build
    * runs inside a [[graft.queries.Materialized.fingerprintScope]]: all
    * dirTag calls within ONE query build see one consistent corpus
    * fingerprint, so a composed plan can never key a mixed stale/fresh
    * artifact set across an in-place corpus mutation (VERDICT r17 #4). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(_._1).reduce(_ ++ _).map { case (k, f) =>
      k -> ((s: SparkSession, dir: String) =>
        graft.queries.Materialized.fingerprintScope(f(s, dir)))
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.map(_._2).reduce(_ ++ _)
}
