package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared materialized derived relations (the pattern the r14 verdict
  * endorsed for g3/g10's wedge relation, factored out): a family of
  * queries that all need the SAME expensive derived relation — the
  * triangle counts, the dup-cluster labels, the fitted Lloyd model —
  * computes it once per (JVM, tag) and parquet-materializes it under
  * [[graft.Scratch]]; every consumer thereafter is a scan + projection.
  *
  * Semantics are materialized-view semantics: the artifact is keyed by
  * the input dir (plus any density levers), so different corpora —
  * including the rehearsal's scaled copies — can never alias. On a
  * cluster the artifact lives on the shared FS; every relation shared
  * through this helper is orders of magnitude smaller than the corpus
  * it derives from (node-sized, doc-sized, or model-sized), so the
  * materialization cost is dominated by the compute it de-duplicates.
  *
  * Writers are idempotent per the Scratch contract; a per-tag lock
  * serializes the existence-check + write against parallel suites in
  * one JVM, and the _SUCCESS marker gates readers on a COMPLETE write.
  */
private[graft] object Materialized {

  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Sanitized per-dir key component (path + hash: readable and
    * collision-safe for scratch lifetimes). */
  def dirTag(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9]+", "_").takeRight(32) + "-" +
      java.lang.Integer.toHexString(dir.hashCode)

  /** n named relations built together under one tag: `build` runs at
    * most once per JVM; all callers read the parquet artifacts. */
  def rels(s: SparkSession, tag: String, names: Seq[String])
          (build: => Seq[DataFrame]): Seq[DataFrame] = {
    val dir = graft.Scratch.dir(s"mv-$tag")
    val lock = locks.computeIfAbsent(tag, _ => new Object)
    lock.synchronized {
      if (!names.forall(n => new java.io.File(s"$dir/$n.parquet", "_SUCCESS").exists())) {
        val dfs = build
        require(dfs.length == names.length,
          s"materialized build for $tag returned ${dfs.length} relations, expected ${names.length}")
        names.zip(dfs).foreach { case (n, df) =>
          df.write.mode("overwrite").parquet(s"$dir/$n.parquet")
        }
      }
    }
    names.map(n => s.read.parquet(s"$dir/$n.parquet"))
  }

  def rel(s: SparkSession, tag: String)(build: => DataFrame): DataFrame =
    rels(s, tag, Seq("rel"))(Seq(build)).head
}
