package graft.tools

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.{Spark, Tables}
import graft.streaming.{CorpusStream, EmbeddingStream, EventStream}

/** Streaming equivalence gate (VERDICT r12 ask #5 / r13 ask #1): runs
  * every streaming family against its BATCH TWIN over the same data and
  * writes `STREAM_SUMMARY.json` — the oracle-class artifact the batch
  * surface has had since round 1 (CORRECTNESS_rN) and the streaming
  * surface lacked (its equivalences lived only in StreamingSpec, at
  * sf0.001, uncommitted as evidence).
  *
  * Method: each family's input is replayed as a genuine MULTI-BATCH file
  * stream — the source parquet is re-chunked into `Chunks` time-ordered
  * files with increasing mtimes and read with maxFilesPerTrigger=1, so
  * the event-time watermark advances BETWEEN micro-batches exactly as it
  * would on a live ingest, windows finalize mid-run (not in one terminal
  * flush), and per-window finalize latency is measurable. Equality is
  * value equality against the batch twin (the StreamingSpec twins, run
  * here at the driver's gate SF), with the same append-mode eligibility
  * rule: a watermarked family's twin keeps only windows the final
  * watermark (max event ts − delay) has passed.
  *
  * Metrics per family, measured not asserted:
  *   - rows_per_sec: stream input rows / wall seconds (start→stop,
  *     including query startup — the honest end-to-end figure);
  *   - emit_latency_ms: median over emitting micro-batches of the time
  *     from "the finalizing data is available" to "rows visible in the
  *     sink". For watermark-finalized families that spans TWO batches by
  *     construction (the watermark used by batch N is computed from data
  *     ingested in batch N−1), so the measure is duration(N−1) +
  *     duration(N); for flow-through families (dedup, joins — output in
  *     the ingesting batch) it is the emitting batch's duration alone.
  *
  * Run: `sbt "runMain graft.tools.StreamGate [sfDir] [outPath]"`
  * (defaults /root/testdata/sf0.1, STREAM_SUMMARY.json). Exit 1 if any
  * family is unequal — the artifact records per-family detail either way.
  */
object StreamGate {

  private val Chunks = 4

  final case class BStat(ms: Long, out: Long, in: Long)

  final case class Fam(name: String, twin: String, equal: Boolean,
      rowsCompared: Long, inputRows: Long, wallSec: Double, batches: Int,
      emitMs: Double, latencyKind: String, note: String)

  private def median(xs: Seq[Double]): Double =
    if (xs.isEmpty) -1.0
    else {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }

  private def progress(q: StreamingQuery): Seq[BStat] =
    q.recentProgress.toSeq.map { p =>
      val ms = Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L)
      val out = Option(p.sink).map(_.numOutputRows).getOrElse(-1L)
      BStat(ms, out, p.numInputRows)
    }

  /** Start `df` into a memory sink, drain with AvailableNow, return
    * (wall seconds, per-batch stats). */
  private def runToMemory(df: DataFrame, name: String, mode: String): (Double, Seq[BStat]) = {
    val t0 = System.nanoTime()
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    ((System.nanoTime() - t0) / 1e9, progress(q))
  }

  /** Emit latency from batch stats: median over batches that put rows in
    * the sink; watermark-finalized families span the emitting batch plus
    * its predecessor (see scaladoc). */
  private def emitLatency(stats: Seq[BStat], twoBatch: Boolean): Double = {
    def lat(pick: BStat => Boolean) = stats.zipWithIndex.collect {
      case (s, i) if pick(s) =>
        (s.ms + (if (twoBatch && i > 0) stats(i - 1).ms else 0L)).toDouble
    }
    val byOut = lat(_.out > 0)
    // a foreachBatch sink reports no output-row counts — fall back to
    // input-bearing batches (flow-through families emit in the batch
    // that ingests, so the duration is the same measure)
    median(if (byOut.nonEmpty) byOut else lat(_.in > 0))
  }

  /** Re-chunk a frame into `n` single-file parquets under a fresh temp
    * dir, ordered by `orderCol` with INCREASING mtimes so the file
    * stream source (oldest-first) replays them in that order — for a
    * time column this makes the watermark advance monotonically across
    * micro-batches with no late data between chunks. */
  private[graft] def chunkBy(df: DataFrame, orderCol: String, n: Int, tag: String): String = {
    // all gate temp data lives under one Scratch root: deleted by the
    // JVM shutdown hook, so a gate run leaves no copies of the corpus
    // behind in /tmp. Staging goes through the Hadoop FS API (not
    // java.nio), so the gate runs end-to-end under a scheme-qualified
    // scratch root — MockSchemeFsSpec drives one family on mock://.
    val spark = df.sparkSession
    val root = new org.apache.hadoop.fs.Path(graft.Scratch.dir("stream-gate"))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(root,
      s"$tag-${java.util.UUID.randomUUID().toString.take(8)}")
    require(fs.mkdirs(dir), s"mkdirs failed for $dir")
    val w = df.withColumn("__c", ntile(n).over(Window.orderBy(col(orderCol))))
    for (i <- 1 to n) {
      val tmp = new org.apache.hadoop.fs.Path(root,
        s"$tag-$i-${java.util.UUID.randomUUID().toString.take(8)}")
      w.filter(col("__c") === i).drop("__c")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = fs.listStatus(tmp)
        .map(_.getPath)
        .find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file in $tmp"))
      val dst = new org.apache.hadoop.fs.Path(dir, f"chunk-$i%02d.parquet")
      require(fs.rename(part, dst), s"rename $part -> $dst failed")
      fs.delete(tmp, true)
      // replay order is mtime order: a silently-failed stamp would fall
      // back to listing order and void the monotone-watermark premise.
      fs.setTimes(dst, 1600000000000L + i * 60000L, -1)
      require(fs.getFileStatus(dst).getModificationTime == 1600000000000L + i * 60000L,
        s"setTimes not honored for $dst — chunk replay order would be undefined")
    }
    dir.toString
  }

  /** Disjoint-copy scale-up of the gate's four input tables into a
    * scratch dir (the Sf1Rehearsal transforms): user/doc/vec/cust ids
    * remap to id*k+copy so per-key state (sessions, dedup, sketches)
    * scales with the corpus; event timestamps stay fixed so watermark
    * geometry is identical and per-window volume grows k-fold. Both the
    * stream chunks AND the batch twins read the SAME scaled tables, so
    * the equivalence claim is unchanged — only the scale moves. */
  private def scaleDir(spark: SparkSession, sfDir: String, k: Int): String = {
    // corpus-keyed like every Materialized artifact (path + content
    // fingerprint + k): two base dirs in one JVM — or a persistent root
    // across corpora — can never alias a scaled copy (ADVICE r15)
    val out = graft.Scratch.dir(
      s"stream-gate-sf$k-${graft.queries.Materialized.dirTag(spark, sfDir)}")
    val payload = s"base=$sfDir k=$k"
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val done = new org.apache.hadoop.fs.Path(out, "_DONE")
    if (fs.exists(done)) {
      // belt-and-braces on the tag: a marker whose recorded inputs
      // disagree with this request is a corrupted/foreign cache entry
      val in = fs.open(done)
      val got = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                finally in.close()
      require(got == payload,
        s"stale stream-gate scale cache at $out: marker '$got' != requested '$payload'")
      return out
    }
    val cp = explode(expr(s"sequence(0, ${k - 1})"))
    Tables.load(spark, sfDir, "events").withColumn("cp", cp)
      .select((col("event_id") * k + col("cp")).as("event_id"), col("ts"),
        (col("user_id") * k + col("cp")).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .repartition(16).write.mode("overwrite").parquet(s"$out/events.parquet")
    Tables.load(spark, sfDir, "documents").withColumn("cp", cp)
      .select((col("doc_id") * k + col("cp")).as("doc_id"),
        expr("regexp_replace(text, '(\\\\S+)', concat('$1#', CAST(cp AS STRING)))").as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(8).write.mode("overwrite").parquet(s"$out/documents.parquet")
    Tables.load(spark, sfDir, "embeddings").withColumn("cp", cp)
      .select((col("vec_id") * k + col("cp")).as("vec_id"),
        expr("transform(embedding, (x, i) -> x + CAST(cp AS FLOAT) * 0.001F * CAST(i % 7 AS FLOAT))")
          .as("embedding"), col("label"))
      .repartition(8).write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    Tables.load(spark, sfDir, "customer").withColumn("cp", cp)
      .select((col("c_custkey") * k + col("cp")).as("c_custkey"), col("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
      .repartition(8).write.mode("overwrite").parquet(s"$out/customer.parquet")
    val o = fs.create(done, true)
    try o.write(payload.getBytes("UTF-8")) finally o.close()
    out
  }

  def main(args: Array[String]): Unit = {
    // the f-interpolator formats with the default locale: under a
    // comma-decimal locale "%.3f" would emit invalid JSON (ADVICE r16)
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outPath = if (args.length > 1) args(1) else "STREAM_SUMMARY.json"
    val scaleK = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Spark.session(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt, appName = "graft-stream-gate")
    import spark.implicits._
    val sfDir = if (scaleK > 1) scaleDir(spark, baseDir, scaleK) else baseDir

    val ev = Tables.load(spark, sfDir, "events")
    val evCount = ev.count()
    val maxSec = ev.agg(max(unix_timestamp(col("ts")))).collect()(0).getLong(0)
    // final watermark at ms precision: max raw event time − 2h delay.
    // ts is TIMESTAMP_NTZ; the session runs UTC, so the NTZ wall clock IS
    // the epoch instant and the cast changes no value (EventStream.read
    // does the same re-tag for the watermark column).
    val maxMs = ev.agg(max(expr("unix_micros(CAST(ts AS TIMESTAMP))")))
      .collect()(0).getLong(0) / 1000L
    val finalWmMs = maxMs - 7200000L
    val docs = Tables.load(spark, sfDir, "documents")
    val emb = Tables.load(spark, sfDir, "embeddings")

    val evDir = chunkBy(ev, "ts", Chunks, "events")
    def readEv = EventStream.read(spark, evDir, maxFilesPerTrigger = 1)

    val fams = scala.collection.mutable.ArrayBuffer.empty[Fam]
    def gate(name: String, twin: String)(body: => (Boolean, Long, Long, Double, Int, Double, String, String)): Unit = {
      val fam = try {
        val (equal, rowsCompared, inRows, wall, batches, emitMs, kind, note) = body
        Fam(name, twin, equal, rowsCompared, inRows, wall, batches, emitMs, kind, note)
      } catch {
        case e: Throwable =>
          Fam(name, twin, equal = false, 0, 0, -1, 0, -1, "n/a",
            s"EXCEPTION: ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
      }
      println(s"[stream-gate] ${fam.name}: equal=${fam.equal} rows=${fam.rowsCompared} " +
        f"wall=${fam.wallSec}%.2fs batches=${fam.batches} emit=${fam.emitMs}%.0fms ${fam.note}")
      fams += fam
    }

    // ---- 1. tumbling hourly counts (watermark-finalized agg) -----------
    gate("tumbling_counts", "batch hourly count/sum over closed windows") {
      val (wall, st) = runToMemory(EventStream.tumblingCounts(readEv), "g_tumbling", "append")
      val streamed = spark.sql(
        "SELECT unix_timestamp(bucket) AS b, event_type, n, total_value FROM g_tumbling ORDER BY b, event_type")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      val batch = ev
        .select((floor(unix_timestamp(col("ts")) / 3600) * 3600).cast("long").as("b"), col("event_type"), col("value"))
        .groupBy(col("b"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("tv"))
        .filter(col("b") + 3600 <= maxSec - 7200)
        .orderBy(col("b"), col("event_type"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      // counts exact; the double sum is compared to 1e-9 relative (the
      // stream accumulates it incrementally across micro-batches, so the
      // float addition order differs from the batch aggregate's)
      val equal = streamed.length == batch.length && batch.nonEmpty &&
        streamed.zip(batch).forall { case ((b1, t1, n1, v1), (b2, t2, n2, v2)) =>
          b1 == b2 && t1 == t2 && n1 == n2 && math.abs(v1 - v2) <= 1e-9 * math.max(1.0, math.abs(v2))
        }
      (equal, batch.length.toLong, evCount, wall, st.size, emitLatency(st, twoBatch = true),
        "watermark-two-batch", s"${batch.length} closed windows")
    }

    // ---- 2. daily distinct-user HLL (e24 twin) --------------------------
    gate("hll_daily", "batch e24-class HLL sketch per closed day window") {
      val (wall, st) = runToMemory(EventStream.distinctUsersDaily(readEv), "g_hll", "append")
      val streamed = spark.sql(
        "SELECT unix_timestamp(day) AS d, est_distinct FROM g_hll ORDER BY d")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val batch = ev
        .select((floor(unix_timestamp(col("ts")) / 86400) * 86400).cast("long").as("d"),
          expr("md5_bits(CAST(user_id AS STRING), 15)").as("h"))
        .groupBy(col("d"))
        .agg(graft.functions.hll_estimate(col("h")).as("est"))
        .filter(col("d") + 86400 <= maxSec - 7200)
        .orderBy(col("d"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      (batch.nonEmpty && streamed == batch, batch.length.toLong, evCount, wall, st.size,
        emitLatency(st, twoBatch = true), "watermark-two-batch", s"${batch.length} closed days, hash-exact")
    }

    // ---- 3. type-mix drift PSI (a10 twin) --------------------------------
    gate("psi_drift", "batch PSI with identical integer-micro quantization") {
      val ref = Map("click" -> 200000L, "error" -> 200000L, "purchase" -> 200000L,
        "signup" -> 200000L, "view" -> 200000L)
      val (wall, st) = runToMemory(EventStream.typeMixDrift(readEv, ref), "g_psi", "append")
      val streamed = spark.sql(
        "SELECT unix_timestamp(bucket) AS b, total, psi FROM g_psi ORDER BY b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val types = ref.keys.toSeq.sorted
      val batch = ev
        .select((floor(unix_timestamp(col("ts")) / 3600) * 3600).cast("long").as("b"), col("event_type"))
        .groupBy(col("b"))
        .agg(types.map(t => sum(when(col("event_type") === t, 1L).otherwise(0L)).as(t)).head,
          types.map(t => sum(when(col("event_type") === t, 1L).otherwise(0L)).as(t)).tail: _*)
        .filter(col("b") + 3600 <= maxSec - 7200)
        .orderBy(col("b"))
        .collect().map { r =>
          val ns = types.map(t => r.getAs[Long](t))
          val total = ns.sum
          val k = types.length + 1
          val micro = types.zip(ns).map { case (t, n) =>
            val p = (n + 1).toDouble / (total + k)
            val qq = ref(t).toDouble / 1e6
            math.floor((p - qq) * math.log(p / qq) * 1e6 + 0.5).toLong
          }.sum
          (r.getLong(0), total, micro / 1e6)
        }.toSeq
      (batch.nonEmpty && streamed == batch, batch.length.toLong, evCount, wall, st.size,
        emitLatency(st, twoBatch = true), "watermark-two-batch", "PSI integer-micro exact")
    }

    // ---- 4. watermarked dedup on (user, type) ---------------------------
    gate("dedup_user_type", "batch countDistinct(user_id, event_type)") {
      val (wall, st) = runToMemory(EventStream.dedupByUserType(readEv), "g_dedup_ut", "append")
      val got = spark.sql("SELECT count(*) FROM g_dedup_ut").collect()(0).getLong(0)
      val want = ev.select(countDistinct(col("user_id"), col("event_type"))).collect()(0).getLong(0)
      (got == want && want > 0, want, evCount, wall, st.size,
        emitLatency(st, twoBatch = false), "same-batch", s"$want distinct keys")
    }

    // ---- 5. content dedup within watermark (d1 twin at ingest) ----------
    gate("dedup_content_watermark", "batch distinct content fingerprints (collapse-injected replay)") {
      // inject a guaranteed-duplicate copy of EVERY event 10 minutes
      // after it (same content fingerprint, new event_id): all copies
      // must collapse or be late-dropped — either way the admitted
      // fingerprint SET equals the originals' distinct set, and the
      // admitted count is bounded by originals-plus-internal-dup
      // re-admissions (a same-content pair spaced past the horizon is
      // legitimately re-admitted by the WITHIN-WATERMARK semantics; the
      // batch `distinct` would collapse it, which is exactly the
      // difference the within-horizon form exists to bound).
      val copies = ev
        .withColumn("event_id", col("event_id") + lit(1000000000L))
        .withColumn("ts", col("ts") + expr("INTERVAL 10 MINUTES"))
      val arrDir = chunkBy(ev.unionByName(copies), "ts", Chunks, "content-dedup")
      val stream = EventStream.dedupContentWithinWatermark(
        EventStream.read(spark, arrDir, maxFilesPerTrigger = 1))
      val (wall, st) = runToMemory(stream.select(col("fp")), "g_dedup_fp", "append")
      val streamedFps = spark.sql("SELECT fp FROM g_dedup_fp").collect().map(_.getString(0))
      val batchFps = ev.select(md5(concat_ws("\u0001",
          col("user_id"), col("event_type"), col("value"), col("props"))).as("fp"))
        .distinct().collect().map(_.getString(0))
      val setEqual = streamedFps.toSet == batchFps.toSet
      val countOk = streamedFps.length >= batchFps.length && streamedFps.length <= evCount
      (setEqual && countOk, batchFps.length.toLong, evCount * 2, wall, st.size,
        emitLatency(st, twoBatch = false), "same-batch",
        s"admitted ${streamedFps.length} of ${evCount * 2} arrivals; ${batchFps.length} distinct fps")
    }

    // ---- 6. stream-stream interval join ----------------------------------
    gate("interval_join", "batch purchase-then-error join (30-min interval)") {
      val (wall, st) = runToMemory(
        EventStream.purchaseThenError(readEv).select(col("p_event"), col("e_event")),
        "g_ssjoin", "append")
      val streamed = spark.sql("SELECT p_event, e_event FROM g_ssjoin")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("ts").as("pt"), col("event_id").as("pe"))
      val e = ev.filter(col("event_type") === "error")
        .select(col("user_id").as("eu"), col("ts").as("et"), col("event_id").as("ee"))
      val batch = p.join(e, col("pu") === col("eu") &&
          col("et") >= col("pt") && col("et") <= col("pt") + expr("INTERVAL 30 MINUTES"))
        .select(col("pe"), col("ee"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      (batch.nonEmpty && streamed == batch, batch.length.toLong, evCount, wall, st.size,
        emitLatency(st, twoBatch = false), "same-batch", s"${batch.length} pairs, full pair-set equality")
    }

    // ---- 7. bloom-guarded decontamination (d10 twin) ---------------------
    gate("bloom_decontam", "batch left-anti join against the blocklist") {
      val block = ev.filter(col("user_id") % 3 === 1).select(col("user_id")).distinct()
      val bloom = graft.functions.buildBloom(block, "user_id", 10000L, 131072L)
      val (wall, st) = runToMemory(
        EventStream.dropBlocked(readEv, "user_id", bloom, block).select(col("event_id")),
        "g_decontam", "append")
      val streamed = spark.sql("SELECT event_id FROM g_decontam")
        .collect().map(_.getLong(0)).sorted.toSeq
      val batch = ev.join(block, Seq("user_id"), "left_anti")
        .select(col("event_id")).collect().map(_.getLong(0)).sorted.toSeq
      (batch.nonEmpty && batch.length < evCount && streamed == batch,
        batch.length.toLong, evCount, wall, st.size,
        emitLatency(st, twoBatch = false), "same-batch",
        s"kept ${batch.length}/$evCount after blocklist")
    }

    // ---- 8. stream-static enrichment aggregate ---------------------------
    gate("stream_static_join", "batch broadcast-dim enrichment aggregate") {
      val tiers = Tables.load(spark, sfDir, "customer")
        .select(col("c_custkey").as("user_id"), (col("c_custkey") % 3).as("tier"))
      val enriched = readEv.join(broadcast(tiers), Seq("user_id"))
        .groupBy(col("tier")).agg(count(lit(1)).as("n"))
      val (wall, st) = runToMemory(enriched, "g_tiered", "complete")
      val got = spark.sql("SELECT tier, n FROM g_tiered ORDER BY tier").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val want = ev.join(broadcast(tiers), Seq("user_id"))
        .groupBy(col("tier")).agg(count(lit(1)).as("n"))
        .orderBy(col("tier")).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      (got == want && got.nonEmpty, want.length.toLong, evCount, wall, st.size,
        emitLatency(st, twoBatch = false), "same-batch", "complete-mode refresh")
    }

    // ---- 9. incremental dedup classification (d11 twin) ------------------
    gate("incremental_dedup_d11", "oracle-gated batch d11_incremental") {
      val corpus = docs.filter(col("doc_id") % 7 =!= 3)
      val arrDir = chunkBy(docs.filter(col("doc_id") % 7 === 3), "doc_id", Chunks, "d11-arrivals")
      val updates = java.util.Collections.synchronizedList(
        new java.util.ArrayList[(Long, Long, String)]())
      val t0 = System.nanoTime()
      val q = CorpusStream.incrementalDedup(
          CorpusStream.read(spark, arrDir, maxFilesPerTrigger = 1), corpus)
        .writeStream.outputMode("update")
        .foreachBatch {
          (ds: org.apache.spark.sql.Dataset[CorpusStream.DedupStatus], batchId: Long) =>
            ds.collect().foreach(r => updates.add((batchId, r.doc_id, r.status)))
            ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.processAllAvailable(); q.stop()
      val wall = (System.nanoTime() - t0) / 1e9
      val st = progress(q)
      val streamed = updates.asScala.toSeq.groupBy(_._2)
        .map { case (id, rows) => (id, rows.maxBy(_._1)._3) }.toSeq.sortBy(_._1)
      val batch = graft.SparkEntry.queries("d11_incremental")(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      val nArrivals = streamed.length.toLong
      (batch.nonEmpty && batch.map(_._2).distinct.size > 1 && streamed == batch,
        batch.length.toLong, nArrivals, wall, st.size,
        emitLatency(st, twoBatch = false), "same-batch",
        s"classes: ${batch.groupBy(_._2).view.mapValues(_.size).toMap}")
    }

    // ---- 10. embedding near-dup at ingest (v4/v5 twin) --------------------
    gate("embedding_neardup", "same LSH+cosine operator over batch frames") {
      val corpus = emb.filter(col("vec_id") % 3 =!= 0)
      val arrivals = emb.filter(col("vec_id") % 3 === 0)
      val arrDir = chunkBy(arrivals, "vec_id", Chunks, "emb-arrivals")
      // data-derived threshold: the 50th-highest cross-split cosine, so
      // the equality always has real pairs regardless of the corpus's
      // similarity floor
      val brute = arrivals.as("a").crossJoin(corpus.as("b"))
        .select(round(graft.functions.vector_dot(col("a.embedding"), col("b.embedding")) /
          (sqrt(graft.functions.vector_dot(col("a.embedding"), col("a.embedding"))) *
           sqrt(graft.functions.vector_dot(col("b.embedding"), col("b.embedding")))), 6).as("cos"))
      val th = brute.orderBy(col("cos").desc).limit(50).collect().map(_.getDouble(0)).min
      val (wall, st) = runToMemory(
        EmbeddingStream.neardupAgainst(
          EmbeddingStream.read(spark, arrDir, maxFilesPerTrigger = 1), corpus, th),
        "g_neardup", "append")
      val streamed = spark.sql(
          "SELECT vec_id, corpus_id, cos FROM g_neardup ORDER BY vec_id, corpus_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val batch = EmbeddingStream.neardupAgainst(arrivals, corpus, th)
        .orderBy(col("vec_id"), col("corpus_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val nArr = arrivals.count()
      (batch.nonEmpty && streamed == batch, batch.length.toLong, nArr, wall, st.size,
        emitLatency(st, twoBatch = false), "same-batch",
        f"threshold $th%.4f, ${batch.length} pairs")
    }

    // ---- 11. curation funnel survivors (d15's streamable half) ------------
    gate("curation_survivors", "batch length/quality filter + distinct content hash") {
      val docsDir = chunkBy(docs, "doc_id", Chunks, "docs-curation")
      val (wall, st) = runToMemory(
        CorpusStream.curationSurvivors(
          CorpusStream.read(spark, docsDir, maxFilesPerTrigger = 1))
          .select(col("hash")),
        "g_curation", "append")
      val streamed = spark.sql("SELECT hash FROM g_curation")
        .collect().map(_.getString(0)).sorted.toSeq
      val batch = docs
        .filter(col("n_chars") >= 100 && col("n_chars") <= 20000)
        .filter(lit(10) * length(regexp_replace(lower(col("text")), "[^a-z]", ""))
          >= lit(6) * col("n_chars"))
        .select(md5(col("text")).as("hash")).distinct()
        .collect().map(_.getString(0)).sorted.toSeq
      val nDocs = docs.count()
      (batch.nonEmpty && batch.length < nDocs && streamed == batch,
        batch.length.toLong, nDocs, wall, st.size,
        emitLatency(st, twoBatch = false), "same-batch",
        s"${batch.length}/$nDocs survive")
    }

    // ---- 12. token budget monitor (p14 twin) -------------------------------
    gate("budget_monitor", "batch per-source token totals + overrun flags") {
      val batchTotals = docs
        .select(col("source"), graft.functions.token_count(col("text")).cast("long").as("t"))
        .groupBy(col("source")).agg(sum(col("t")).as("total"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val budgets = batchTotals.toSeq.sortBy(_._1).zipWithIndex.map { case ((s0, tot), i) =>
        s0 -> (if (i % 2 == 0) tot / 2 else tot * 2)
      }.toMap
      val docsDir = chunkBy(docs, "doc_id", Chunks, "docs-budget")
      val (wall, st) = runToMemory(
        CorpusStream.budgetMonitor(
          CorpusStream.read(spark, docsDir, maxFilesPerTrigger = 1), budgets).toDF(),
        "g_budget", "update")
      val streamed = spark.sql(
        """SELECT source, cum_tokens, over_budget FROM (
          |  SELECT source, cum_tokens, over_budget, row_number() OVER (
          |    PARTITION BY source ORDER BY cum_tokens DESC) AS rn FROM g_budget)
          |WHERE rn = 1 ORDER BY source""".stripMargin)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSeq
      val equal = streamed.length == batchTotals.size && streamed.forall {
        case (s0, cum, over) => cum == batchTotals(s0) && over == (cum > budgets(s0))
      } && streamed.exists(_._3) && streamed.exists(!_._3)
      (equal, batchTotals.size.toLong, docs.count(), wall, st.size,
        emitLatency(st, twoBatch = false), "same-batch",
        s"${streamed.count(_._3)}/${streamed.length} sources over budget")
    }

    // ---- 13. KMV distinct sketch (t12 twin) --------------------------------
    gate("kmv_distinct", "oracle-gated batch t12_kmv_distinct") {
      val docsDir = chunkBy(docs, "doc_id", Chunks, "docs-kmv")
      val (wall, st) = runToMemory(
        CorpusStream.kmvDistinct(
          CorpusStream.hashedTokens(
            CorpusStream.read(spark, docsDir, maxFilesPerTrigger = 1)), k = 16).toDF(),
        "g_kmv", "update")
      // "final sketch state" pick must be deterministic: n_tracked
      // saturates at k, so post-saturation rows TIE on it — kth (the
      // k-th smallest hash) is monotonically non-increasing across
      // batches, so (n_tracked DESC, kth ASC) names the final row
      // uniquely
      val streamed = spark.sql(
        """SELECT key, est FROM (
          |  SELECT key, est, row_number() OVER (
          |    PARTITION BY key ORDER BY n_tracked DESC, kth ASC) AS rn FROM g_kmv)
          |WHERE rn = 1 ORDER BY key""".stripMargin)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      val batch = graft.SparkEntry.queries("t12_kmv_distinct")(spark, sfDir)
        .select(col("lang"), col("kmv_est"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      (batch.nonEmpty && streamed == batch, batch.length.toLong, docs.count(), wall, st.size,
        emitLatency(st, twoBatch = false), "same-batch", s"${batch.length} language sketches")
    }

    // ---- 14. per-window top-k (timer-finalized rank-after-aggregate) -------
    gate("topk_per_window", "batch hourly top-3 types over timer-closed windows") {
      val typed = readEv
        .withWatermark("ts", "2 hours")
        .select(col("event_id"), col("ts"), col("event_type"))
        .as[EventStream.TypedEv]
      val (wall, st) = runToMemory(
        EventStream.topKPerWindow(typed, windowSec = 3600L, k = 3).toDF(), "g_topk", "append")
      val streamed = spark.sql(
        "SELECT window_start, event_type, n, rk FROM g_topk ORDER BY window_start, rk")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3))).toSeq
      // twin eligibility: the timeout fires when the final watermark
      // strictly passes window end (GroupStateImpl: timeout < watermark)
      val batch = ev
        .select((floor(unix_timestamp(col("ts")) / 3600) * 3600).cast("long").as("w"), col("event_type"))
        .groupBy(col("w"), col("event_type")).agg(count(lit(1)).as("n"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("w")).orderBy(col("n").desc, col("event_type"))))
        .filter(col("rk") <= 3 && (col("w") + 3600) * 1000 < finalWmMs)
        .orderBy(col("w"), col("rk"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3))).toSeq
      (batch.nonEmpty && streamed == batch, batch.length.toLong, evCount, wall, st.size,
        emitLatency(st, twoBatch = true), "watermark-two-batch",
        s"${batch.length} ranked rows over ${batch.map(_._1).distinct.size} closed windows")
    }

    // ---- 15. gap sessionization with event-time timeout --------------------
    gate("sessionize_timeout", "batch lag-window sessions (gap-closed + timer-closed)") {
      val tsEv = readEv
        .withWatermark("ts", "2 hours")
        .select(col("event_id"), col("ts"), col("user_id"))
        .as[EventStream.TsEv]
      val (wall, st) = runToMemory(
        EventStream.sessionizeWithTimeout(tsEv).toDF(), "g_sessions", "append")
      val streamed = spark.sql(
        "SELECT user_id, start_sec, n_events, dur_sec FROM g_sessions ORDER BY user_id, start_sec")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSeq
      // batch twin: per-user sessions by the 30-min gap rule; a session is
      // emitted if gap-closed by a successor, or if it is the user's final
      // session and its timer (last + gap) fired against the final watermark
      val w = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
      val sess = ev.select(col("user_id"), unix_timestamp(col("ts")).as("sec"), col("event_id"))
        .withColumn("prev", lag(col("sec"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev").isNull || col("sec") - col("prev") > 1800, 1).otherwise(0))
        .withColumn("sid", sum(col("new_sess")).over(
          Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sid"))
        .agg(min(col("sec")).as("start_sec"), max(col("sec")).as("last"),
          count(lit(1)).cast("int").as("n_events"))
      val lastSid = sess.groupBy(col("user_id")).agg(max(col("sid")).as("max_sid"))
      val batch = sess.join(lastSid, Seq("user_id"))
        .filter(col("sid") < col("max_sid") ||
          (col("last") + 1800) * 1000 < finalWmMs)
        .select(col("user_id"), col("start_sec"), col("n_events"),
          (col("last") - col("start_sec")).as("dur_sec"))
        .orderBy(col("user_id"), col("start_sec"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSeq
      (batch.nonEmpty && streamed == batch, batch.length.toLong, evCount, wall, st.size,
        emitLatency(st, twoBatch = true), "watermark-two-batch",
        s"${batch.length} sessions (gap- or timer-closed)")
    }

    // ---- artifact ----------------------------------------------------------
    val commit = try scala.sys.process.Process(Seq("git", "rev-parse", "--short", "HEAD"))
      .!!.trim catch { case _: Throwable => "unknown" }
    val allEqual = fams.forall(_.equal)
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    val famJson = fams.map { f =>
      val rps = if (f.wallSec > 0) f.inputRows / f.wallSec else -1.0
      f""""${f.name}":{"twin":"${esc(f.twin)}","equal":${f.equal},""" +
        f""""rows_compared":${f.rowsCompared},"input_rows":${f.inputRows},""" +
        f""""wall_sec":${f.wallSec}%.3f,"rows_per_sec":$rps%.1f,"batches":${f.batches},""" +
        f""""emit_latency_ms":${f.emitMs}%.1f,"latency_kind":"${f.latencyKind}","note":"${esc(f.note)}"}"""
    }.mkString("{", ",", "}")
    val json =
      f"""{"sf_dir":"$sfDir","base_dir":"$baseDir","scale_k":$scaleK,""" +
      f""""commit":"$commit","timestamp_utc":"${java.time.Instant.now()}",""" +
      f""""chunks_per_stream":$Chunks,"max_files_per_trigger":1,""" +
      f""""n_families":${fams.size},"n_equal":${fams.count(_.equal)},"all_equal":$allEqual,""" +
      f""""latency_note":"emit_latency_ms: median wall time from the finalizing data being available to rows visible in the memory sink; watermark-finalized families span two micro-batches by construction (the watermark used by batch N comes from data ingested in batch N-1)",""" +
      f""""families":$famJson}"""
    Files.write(java.nio.file.Paths.get(outPath), json.getBytes("UTF-8"))
    println(s"[stream-gate] ${fams.count(_.equal)}/${fams.size} families equal -> $outPath")
    spark.stop()
    if (!allEqual) System.exit(1)
  }
}
