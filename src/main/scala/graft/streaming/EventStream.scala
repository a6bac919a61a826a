package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming operators over the events schema — the streaming
  * surface the reference lacks entirely (SURVEY.md §2 gap analysis:
  * "no streaming at all"), built the Spark-native way:
  * `readStream -> withWatermark -> window/flatMapGroupsWithState ->
  * writeStream`.
  *
  * At scale these run unchanged against a file/Kafka source: the
  * watermark bounds state, the windowed aggregate is an incremental
  * partial agg, and sessionization state lives in the state store keyed
  * by user_id (uniform key space — no hot keys).
  */
object EventStream {

  /** File-source stream over a directory of events parquet, schema-driven
    * exactly like the batch loader: a streaming file source requires a
    * schema upfront, so take it from the files themselves (one batch-read
    * footer pass at stream definition time), then apply the SAME observed-
    * schema `ts` guard as `Tables.load` via [[graft.Tables.normalizeTs]].
    * Forcing an assumed Long schema here is how a timestamp[us] file gets
    * misread as raw microseconds and the event timeline compresses 1000x
    * (no watermark ever fires) — the schema must come from the data. */
  def read(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 0): DataFrame = {
    // If the directory is empty or absent at stream-definition time (a
    // file-source stream's legitimate cold start — the reason upstream
    // Spark makes file streams demand a user schema), inference has no
    // footers; fall back to the documented testdata layout. The fallback
    // covers BOTH physical ts encodings normalizeTs handles (typed
    // timestamp arrives via inference; the nanosAsLong long arrives only
    // from real footers) — a cold-started stream assumes the typed form.
    val native = try spark.read.parquet(dir).schema catch {
      case _: org.apache.spark.sql.AnalysisException =>
        org.apache.spark.sql.types.StructType.fromDDL(
          "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, " +
            "event_type STRING, value DOUBLE, props STRING")
    }
    // maxFilesPerTrigger threading lives in StreamPath.parquetStream
    // (shared by all three corpus readers): > 0 bounds each micro-batch,
    // making a bounded replay a genuine multi-batch stream — StreamGate
    // uses it to measure per-window finalize latency; production ingest
    // uses it as back-pressure.
    val df = graft.Tables.normalizeTs(
      StreamPath.parquetStream(spark, dir, native, maxFilesPerTrigger))
    // Watermarks demand TIMESTAMP (session-tz), but a timestamp[us] parquet
    // column without tz metadata arrives as TIMESTAMP_NTZ. Re-tag it: the
    // session runs in UTC (Spark.session), so the NTZ wall clock IS the
    // epoch instant and the cast changes no value. Batch queries keep the
    // native NTZ type (their oracle hashes depend on it); only the
    // streaming path needs the event-time type.
    df.schema.find(f => f.name == "ts" && f.dataType == TimestampNTZType) match {
      case Some(_) => df.withColumn("ts", col("ts").cast(TimestampType))
      case None    => df
    }
  }

  /** Tumbling 1-hour windowed counts with a 2-hour watermark. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("bucket"), col("event_type"), col("n"), col("total_value"))

  /** Daily distinct-user HLL sketches over the stream — e24's streaming
    * twin: per tumbling day window, the 64-register sketch estimate via
    * the single-pass [[graft.functions.HllSketchAgg]] typed aggregate
    * (hash-exact, so the streamed estimate EQUALS the batch estimate for
    * every complete window — asserted in StreamingSpec). State per
    * window is one 64-register array merged incrementally across
    * micro-batches: exactly the mergeability contract e24 gates in
    * batch, exercised here through Structured Streaming's partial-state
    * path. */
  def distinctUsersDaily(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .select(col("ts"),
        expr("md5_bits(CAST(user_id AS STRING), 15)").as("h"))
      .groupBy(window(col("ts"), "1 day"))
      .agg(graft.functions.hll_estimate(col("h")).as("est_distinct"))
      .select(col("window.start").as("day"), col("est_distinct"))

  /** Watermarked streaming deduplication on (user_id, event_type) within
    * the watermark horizon — the streaming form of exact dedup (state
    * bounded by the watermark, not the stream length). */
  def dedupByUserType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicates("user_id", "event_type")

  /** Content-fingerprint streaming dedup via Spark 4's
    * `dropDuplicatesWithinWatermark` — the streaming twin of batch
    * `d1_dedup_exact` (md5-of-content dedup): duplicate payloads arriving
    * within the watermark horizon collapse to one row. Unlike
    * `dropDuplicates`, a fingerprint's state is EVICTED once the
    * watermark passes its event time + horizon, so state is bounded by
    * the horizon, not the stream's lifetime key cardinality — the form
    * that survives an unbounded 100 TB/day firehose where at-least-once
    * delivery makes duplicates arrive within a bounded lag. */
  def dedupContentWithinWatermark(events: DataFrame, horizon: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", horizon)
      .withColumn("fp", md5(concat_ws("\u0001",
        col("user_id"), col("event_type"), col("value"), col("props"))))
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming distribution-drift monitor — the streaming twin of batch
    * a10's PSI: per finalized event-time hour window, the population
    * stability index between that window's event-type mix and a fixed
    * reference distribution (in ppm). ONE watermarked windowed aggregate:
    * conditional sums over the fixed type alphabet keep the whole monitor
    * a single stateful operator (a per-(window, type) aggregate feeding a
    * per-window rollup would chain two stateful aggregates for the same
    * K counters), and the PSI itself is row-local arithmetic on the
    * finalized row — a10's exact quantization (Laplace +1 smoothing,
    * each term floored to integer micro-units before the sum) so the
    * emitted score is partition- and arrival-order-invariant. At a
    * 100 TB/day intake this is the first monitor a training-data
    * pipeline runs on its firehose: state is K counters per open window,
    * evicted by the watermark. */
  def typeMixDrift(events: DataFrame, refPpm: Map[String, Long],
      watermark: String = "2 hours"): DataFrame = {
    require(refPpm.nonEmpty && refPpm.values.forall(_ > 0),
      "every reference proportion must be positive ppm (a zero reference " +
        "cell makes log(p/q) non-finite)")
    require(refPpm.values.sum <= 1000000L,
      s"reference proportions sum to ${refPpm.values.sum} ppm > 1e6 — " +
        "not a distribution (per-mille passed as ppm?); PSI against an " +
        "over-unity reference is silently wrong")
    val types = refPpm.keys.toSeq.sorted
    // the OTHER bucket catches types outside the reference alphabet —
    // without it, a drift to 90% unseen types leaves every monitored
    // proportion unchanged and PSI reads ~0 through the worst possible
    // drift. Its reference mass is whatever ppm the alphabet leaves
    // unclaimed, floored at 1 ppm so the q side stays positive (an
    // alphabet summing to 1e6 still drifts hard when OTHER appears).
    val otherPpm = math.max(1000000L - refPpm.values.sum, 1L)
    val k = types.length + 1
    val aggs = types.zipWithIndex.map { case (t, i) =>
      sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n$i")
    } :+ sum(when(col("event_type").isin(types: _*), 0L).otherwise(1L))
      .as(s"n${types.length}")
    val counts = events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("total", (0 until k).map(i => col(s"n$i")).reduce(_ + _))
    val termMicro = (types.map(refPpm) :+ otherPpm).zipWithIndex.map { case (ppm, i) =>
      val p = (col(s"n$i") + 1).cast("double") / (col("total") + k)
      val q = lit(ppm.toDouble / 1e6)
      val t = floor((p - q) * log(p / q) * 1e6 + 0.5).cast("long")
      // the OTHER cell contributes only when out-of-alphabet events are
      // OBSERVED: with n_other = 0 its Laplace pseudo-count alone against
      // the 1-ppm floor reads ~(1/total)*ln(total*1e6/k) — up to ~1.7
      // "drift" on a near-empty in-spec window, a false alarm by
      // construction. Zero observed against (near-)zero expected is
      // zero evidence of drift; the cell arms exactly when the unseen
      // type actually appears, which is the event it exists to catch.
      if (i == types.length) when(col(s"n$i") > 0, t).otherwise(lit(0L)) else t
    }.reduce(_ + _)
    counts.select(col("window.start").as("bucket"), col("total"),
      round(termMicro / 1e6, 6).as("psi"))
  }

  /** Bloom-guarded streaming decontamination: drop every event whose
    * `key` is in the static blocklist. Rows the bloom rules out pass
    * straight through MAP-SIDE (a bloom has no false negatives — no join
    * runs for them at all); only bloom-positive candidates anti-join the
    * static blocklist to clear false positives. At a 100 TB/day firehose
    * the anti-join branch sees ~fpp of the stream while the blocklist
    * bloom (a few MB even for millions of keys) rides along as a task
    * literal — the streaming twin of batch d10's prefilter + exact
    * confirm. */
  def dropBlocked(events: DataFrame, key: String, bloom: Array[Byte],
                  blocklist: DataFrame): DataFrame = {
    val probe = graft.functions.might_contain(lit(bloom), col(key))
    val clean = events.filter(!probe)
    val cleared = events.filter(probe)
      .join(broadcast(blocklist), Seq(key), "left_anti")
    clean.unionByName(cleared)
  }

  /** Stream-stream self-join: for each purchase, the error events of the
    * same user within the following 30 minutes. Both sides watermarked so
    * join state is bounded (Spark requires the time-interval condition). */
  def purchaseThenError(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_event"))
      .withWatermark("p_ts", "1 hour")
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"),
        col("event_id").as("e_event"))
      .withWatermark("e_ts", "1 hour")
    purchases.join(errors,
      col("p_user") === col("e_user") &&
      col("e_ts") >= col("p_ts") &&
      col("e_ts") <= col("p_ts") + expr("INTERVAL 30 MINUTES"))
  }

  final case class FullEv(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                          event_type: String, value: Double, props: String)
  final case class Ev(event_id: Long, sec: Long, user_id: Long)
  final case class TsEv(event_id: Long, ts: java.sql.Timestamp, user_id: Long)
  final case class SessionState(start: Long, last: Long, n: Int)
  final case class Session(user_id: Long, start_sec: Long, n_events: Int, dur_sec: Long)

  final case class TypedEv(event_id: Long, ts: java.sql.Timestamp, event_type: String)
  final case class WindowTopK(window_start: Long, event_type: String, n: Long, rk: Int)

  /** Streaming per-window top-k event types — the rank-after-aggregate
    * shape ("GROUP BY window, type, then take the k largest per window")
    * that append-mode Structured Streaming cannot express as two chained
    * aggregations. State is keyed by tumbling-window start and holds one
    * counter per distinct type seen in that window: bounded by the type
    * vocabulary times the watermark horizon, never by event volume. The
    * window's top-k rows emit exactly once, when the watermark passes the
    * window end (event-time timeout) — so results are final, no
    * retraction needed. Caller must `withWatermark("ts", ...)` the input.
    *
    * At scale this is the canonical trending-items job: the per-window
    * candidate counts live distributed in the state store (one shuffle by
    * window key), and only k rows per window ever leave it. */
  def topKPerWindow(events: Dataset[TypedEv], windowSec: Long = 3600L,
                    k: Int = 3): Dataset[WindowTopK] = {
    import events.sparkSession.implicits._
    events.groupByKey(e => e.ts.getTime / 1000 / windowSec * windowSec)
      .flatMapGroupsWithState[Map[String, Long], WindowTopK](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (winStart: Long, evs: Iterator[TypedEv], state: GroupState[Map[String, Long]]) =>
          if (state.hasTimedOut) {
            // watermark passed window end: finalize, emit, drop state
            val counts = state.getOption.getOrElse(Map.empty[String, Long])
            state.remove()
            counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(k).zipWithIndex
              .map { case ((t, n), i) => WindowTopK(winStart, t, n, i + 1) }
              .iterator
          } else {
            val counts = evs.foldLeft(state.getOption.getOrElse(Map.empty[String, Long])) {
              (m, e) => m.updated(e.event_type, m.getOrElse(e.event_type, 0L) + 1L)
            }
            state.update(counts)
            // rows older than the watermark never reach here, so window
            // end is always strictly ahead of the watermark — legal timeout
            state.setTimeoutTimestamp((winStart + windowSec) * 1000)
            Iterator.empty
          }
      }
  }

  /** Stateful gap sessionization (30-min inactivity), the streaming twin
    * of the batch `e2_sessionize` query: closed sessions are emitted as
    * soon as a later event proves the gap. */
  def sessionize(events: Dataset[Ev]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[List[SessionState]]) =>
          // events within a micro-batch arrive unordered: sort this batch,
          // then fold into the open session carried in state
          val sorted = evs.toSeq.sortBy(e => (e.sec, e.event_id))
          var open = state.getOption.flatMap(_.headOption)
          val closed = List.newBuilder[Session]
          sorted.foreach { e =>
            open match {
              case Some(s) if e.sec - s.last <= 1800 =>
                open = Some(s.copy(last = e.sec, n = s.n + 1))
              case Some(s) =>
                closed += Session(user, s.start, s.n, s.last - s.start)
                open = Some(SessionState(e.sec, e.sec, 1))
              case None =>
                open = Some(SessionState(e.sec, e.sec, 1))
            }
          }
          state.update(open.toList)
          closed.result().iterator
      }
  }

  /** Sessionization that ALSO closes idle sessions by event-time timeout:
    * when the watermark passes last+gap, the open session is emitted and
    * its state dropped without waiting for a successor event —
    * [[sessionize]] above can never close a user's final session. The
    * production form: state is bounded by the watermark horizon, keyed by
    * user_id. Caller must `withWatermark("ts", ...)` the input. */
  def sessionizeWithTimeout(events: Dataset[TsEv], gapSec: Long = 1800L): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[TsEv], state: GroupState[List[SessionState]]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.getOrElse(Nil)
              .map(s => Session(user, s.start, s.n, s.last - s.start))
            state.remove()
            out.iterator
          } else {
            val sorted = evs.map(e => (e.event_id, e.ts.getTime / 1000))
              .toSeq.sortBy(e => (e._2, e._1))
            var open = state.getOption.flatMap(_.headOption)
            val closed = List.newBuilder[Session]
            sorted.foreach { case (_, sec) =>
              open match {
                case Some(s) if sec - s.last <= gapSec =>
                  // a late-but-valid event may precede the open session:
                  // extend both ends, never move `last` backwards (that
                  // would shrink the timeout and emit negative durations)
                  open = Some(SessionState(math.min(s.start, sec),
                    math.max(s.last, sec), s.n + 1))
                case Some(s) =>
                  closed += Session(user, s.start, s.n, s.last - s.start)
                  open = Some(SessionState(sec, sec, 1))
                case None =>
                  open = Some(SessionState(sec, sec, 1))
              }
            }
            state.update(open.toList)
            open.foreach(s => state.setTimeoutTimestamp((s.last + gapSec) * 1000))
            closed.result().iterator
          }
      }
  }
}
