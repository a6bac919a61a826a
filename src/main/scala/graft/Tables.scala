package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Registry for the driver-generated parquet tables (TESTDATA.md).
  *
  * One parquet file per table under `\$sfDir/`. All queries read through
  * [[Tables.load]] so filters/projections push down to the parquet scan
  * (verified via `.explain("formatted")` — `PushedFilters`/`ReadSchema`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private val dfCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  /** Drop entries whose session has been stopped — keeps the static maps
    * from retaining dead sessions (and their cached plans) for the JVM
    * lifetime when sessions are created and stopped repeatedly. */
  private def purgeStopped(): Unit = {
    dfCache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    lastDir.keySet.removeIf(s => s.sparkContext.isStopped)
    fanoutCache.keySet.removeIf(df => df.sparkSession.sparkContext.isStopped)
  }

  /** Invalidate every cached plan/view registration under `dir` — the
    * escape hatch for non-read-only uses: the cached FileIndex snapshot
    * would otherwise serve stale file listings if data under `dir`
    * changed. */
  def invalidate(dir: String): Unit = {
    // ORDER IS LOAD-BEARING: fanout()'s TOCTOU guard re-checks dfCache
    // AFTER its insert, which only catches a racing invalidate if the
    // dfCache eviction happens BEFORE fanoutCache is cleared. The
    // second clear below makes the guard order-independent anyway: even
    // if a racing fanout re-pins an already-evicted frame between the
    // dfCache eviction and the first clear, the trailing clear drops it.
    fanoutCache.clear()
    dfCache.keySet.removeIf(k => k._2 == dir)
    lastDir.entrySet.removeIf(e => e.getValue == dir)
    // fanout entries aren't attributable to a dir (keyed by DataFrame
    // reference) — drop them all; re-probing is cheap and correct
    fanoutCache.clear()
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    purgeStopped()
    // cache the (immutable) logical plan per table: a fresh spark.read
    // re-lists the path and re-reads parquet footers on every call, pure
    // overhead when every query loads its inputs through here. The
    // testdata is read-only, so the cached FileIndex snapshot cannot
    // go stale.
    dfCache.computeIfAbsent((spark, dir, name), _ =>
      normalizeTs(spark.read.parquet(s"$dir/$name.parquet")))
  }

  /** Normalize a raw-Long `ts` column to TimestampType. A TIMESTAMP(NANOS)
    * parquet column reaches Spark 4 only as epoch-nanos long
    * (spark.sql.legacy.parquet.nanosAsLong=true, set in Spark.session);
    * truncate ns -> us exactly in integer math (matches DuckDB, which also
    * truncates ns to its internal microsecond timestamps). A file whose
    * `ts` is already typed (timestamp[us]/[ms]) passes through untouched —
    * the guard is on the OBSERVED schema, never an assumed one, so both
    * physical layouts read identically. Shared by the batch loader and the
    * streaming reader so the two paths can never diverge on units. */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case None    => df
    }

  /** Fan a scan out to the session's full parallelism WHEN (and only
    * when) the source under-splits. The synthetic tables are single-
    * row-group parquet, so the scan stage — and with it every CPU-heavy
    * per-row kernel attached to it (shingle md5s, regexes, vector
    * arithmetic) — runs on ONE core unless an exchange intervenes;
    * measured 3-4x on the text/dedup family at sf0.1. At production
    * scale a 100 TB table arrives in thousands of splits, the guard
    * fails, and this is a no-op — the repartition exists to restore
    * scan-stage parallelism the substrate withholds, not as a standing
    * plan stage. Catalyst still pushes filters/pruning through the
    * round-robin exchange to the scan. */
  def fanout(df: DataFrame): DataFrame = {
    // Cache the split-count decision per input DataFrame: the
    // `df.rdd.getNumPartitions` probe forces a physical-plan conversion,
    // pure overhead when the same (cached) table DataFrame flows through
    // here on every query build. Keyed by reference — `load` hands out
    // one instance per (session, dir, name), and DataFrame has no value
    // equality, so reference identity IS the cache key. Only canonical
    // instances are admitted to the cache (checked below): an arbitrary
    // per-call DataFrame would grow the cache without bound. The probe
    // runs OUTSIDE the map's bin lock (get / putIfAbsent, not
    // computeIfAbsent) — df.rdd is a full physical-plan conversion that
    // can itself take Spark/Catalyst locks, and holding a CHM bin lock
    // across it invites lock-order trouble; a rare duplicate probe on a
    // race is harmless (both compute the same plan).
    val cached = fanoutCache.get(df)
    if (cached != null) cached
    else {
      val cores = df.sparkSession.sparkContext.defaultParallelism
      val out = if (df.rdd.getNumPartitions * 2 < cores) df.repartition(cores) else df
      // Only canonical Tables.load instances are CACHED (reference
      // identity is the key, so an arbitrary per-call frame would grow
      // the map without bound). A non-canonical frame — e.g. one held
      // across Tables.invalidate, which evicts the canonical entry —
      // still computes correctly; it just pays the partition probe on
      // every call instead of crashing the query build.
      if (dfCache.containsValue(df)) {
        val prev = fanoutCache.putIfAbsent(df, out)
        // TOCTOU guard: an invalidate() racing between the check above
        // and the insert would have cleared fanoutCache already — the
        // insert would then pin the evicted frame (and its stale
        // FileIndex) until session stop. Re-check and undo.
        if (!dfCache.containsValue(df)) fanoutCache.remove(df)
        if (prev != null) prev else out
      } else out
    }
  }

  private val fanoutCache =
    new java.util.concurrent.ConcurrentHashMap[DataFrame, DataFrame]()

  private val lastDir = new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  /** Register every table as a temp view (used by SQL-form queries).
    * Idempotent per (session, dir): repeated calls — every SQL query
    * invokes this — skip the 10 parquet footer reads + view swaps unless
    * the data directory actually changed. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    if (lastDir.get(spark) != dir) {
      names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
      // recorded only after every view registered: a failure mid-loop must
      // leave the next call re-registering, not serving a mixed view set
      lastDir.put(spark, dir)
    }
}
