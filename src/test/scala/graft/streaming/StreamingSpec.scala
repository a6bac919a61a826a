package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.scalatest.funsuite.AnyFunSuite

import graft.{Spark, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming correctness: the streaming operators must agree with their
  * batch twins over the same events data (processAllAvailable on a
  * file source = bounded replay). */
class StreamingSpec extends AnyFunSuite {

  private lazy val spark = Spark.session(master = "local[4]", shufflePartitions = 4,
    appName = "graft-stream-test")

  private lazy val eventsDir: String = {
    // file-source needs a directory of parquet
    val dir = Files.createTempDirectory("events-stream")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  test("streams define against an empty directory (cold start) and pick up late-arriving files") {
    val dir = Files.createTempDirectory("events-cold-start")
    // definition must not throw despite zero footers to infer from
    val stream = EventStream.read(spark, dir.toString)
    assert(stream.isStreaming)
    assert(stream.schema.fieldNames.contains("ts"))
    val docs = CorpusStream.read(spark, Files.createTempDirectory("docs-cold-start").toString)
    assert(docs.isStreaming && docs.schema.fieldNames.contains("doc_id"))
    // files arriving after definition flow through the cold-started stream
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val out = Files.createTempDirectory("cold-start-ckpt")
    val q = stream.groupBy().count()
      .writeStream.format("memory").queryName("cold_start_cnt")
      .outputMode("complete")
      .option("checkpointLocation", out.toString)
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val n = spark.table("cold_start_cnt").collect()(0).getLong(0)
    assert(n > 0, s"cold-started stream read $n rows")
  }

  test("streams define against a NOT-YET-EXISTING directory and start once it appears") {
    // one step colder than the empty-dir case: the ingest path has not
    // been created at stream-definition time (a deploy racing its data
    // producer) — definition must not throw, and the first files to land
    // after the directory appears must flow through
    val parent = Files.createTempDirectory("events-unborn")
    val dir = parent.resolve("not-yet-created")
    assert(!Files.exists(dir))
    val stream = EventStream.read(spark, dir.toString)
    assert(stream.isStreaming && stream.schema.fieldNames.contains("ts"))
    Files.createDirectories(dir)
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val ckpt = Files.createTempDirectory("unborn-ckpt")
    val q = stream.groupBy().count()
      .writeStream.format("memory").queryName("unborn_cnt")
      .outputMode("complete")
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val n = spark.table("unborn_cnt").collect()(0).getLong(0)
    assert(n > 0, s"stream over a late-created directory read $n rows")
  }

  test("stateful aggregation state survives a query restart (checkpoint recovery)") {
    // the 1000-executor reality: queries get stopped (deploys, failures)
    // and must resume from the state store, not recount from zero
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val ckpt = Files.createTempDirectory("agg-restart-ckpt").toString
    val mem = MemoryStream[(String, Long)](spark)
    def start(name: String) = mem.toDF().toDF("k", "v")
      .groupBy(col("k")).agg(sum(col("v")).cast("long").as("total"),
        count(lit(1)).as("n"))
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    // AvailableNow snapshots the end offset at start — enqueue first
    mem.addData(("a", 1L), ("b", 10L), ("a", 2L))
    val q1 = start("agg_before")
    q1.processAllAvailable(); q1.stop()
    assert(spark.sql("SELECT total FROM agg_before WHERE k = 'a'")
      .collect()(0).getLong(0) == 3L)
    // restart from the same checkpoint; only NEW rows arrive, so correct
    // totals prove the per-key sums and counts were recovered, not rebuilt
    mem.addData(("a", 4L), ("c", 100L))
    val q2 = start("agg_after")
    q2.processAllAvailable(); q2.stop()
    val after = spark.sql("SELECT k, total, n FROM agg_after ORDER BY k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(after.toSeq == Seq(("a", 7L, 3L), ("b", 10L, 1L), ("c", 100L, 1L)))
  }

  test("streaming tumbling window equals the batch aggregate") {
    val q = EventStream.tumblingCounts(EventStream.read(spark, eventsDir))
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.sql(
      "SELECT unix_timestamp(bucket) AS b, event_type, n FROM tumbling ORDER BY b, event_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val maxSec = ev.agg(max(unix_timestamp(col("ts")))).collect()(0).getLong(0)
    // append mode finalizes a window only once the watermark (max ts - 2h)
    // passes its end — trailing windows are intentionally never emitted
    val batch = ev
      .select((floor(unix_timestamp(col("ts")) / 3600) * 3600).cast("long").as("b"),
        col("event_type"))
      .groupBy(col("b"), col("event_type")).agg(count(lit(1)).as("n"))
      .filter(col("b") + 3600 <= maxSec - 7200)
      .orderBy(col("b"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

    assert(batch.nonEmpty)
    assert(streamed.length == batch.length)
    assert(streamed.sameElements(batch))
  }

  test("streaming daily distinct-user HLL equals the batch sketch per closed window") {
    // e24's streaming twin: the 64-register sketch is hash-exact, so the
    // streamed estimate (merged incrementally across micro-batches via
    // the typed aggregate's partial state) must EQUAL the batch estimate
    val q = EventStream.distinctUsersDaily(EventStream.read(spark, eventsDir))
      .writeStream.format("memory").queryName("hll_daily")
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.sql(
      "SELECT unix_timestamp(day) AS d, est_distinct FROM hll_daily ORDER BY d")
      .collect().map(r => (r.getLong(0), r.getLong(1)))

    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val maxSec = ev.agg(max(unix_timestamp(col("ts")))).collect()(0).getLong(0)
    val batch = ev
      .select((floor(unix_timestamp(col("ts")) / 86400) * 86400).cast("long").as("d"),
        expr("md5_bits(CAST(user_id AS STRING), 15)").as("h"))
      .groupBy(col("d"))
      .agg(graft.functions.hll_estimate(col("h")).as("est"))
      .filter(col("d") + 86400 <= maxSec - 7200) // append emits closed windows only
      .orderBy(col("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))

    assert(batch.nonEmpty)
    assert(streamed.length == batch.length)
    assert(streamed.sameElements(batch))
  }

  test("streaming type-mix drift (PSI) equals the batch twin per closed window") {
    val ref = Map("click" -> 200000L, "error" -> 200000L, "purchase" -> 200000L,
      "signup" -> 200000L, "view" -> 200000L)
    val q = EventStream.typeMixDrift(EventStream.read(spark, eventsDir), ref)
      .writeStream.format("memory").queryName("psidrift")
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql(
      "SELECT unix_timestamp(bucket) AS b, total, psi FROM psidrift ORDER BY b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    // batch twin with the identical quantization, over watermark-eligible
    // windows only (append mode finalizes a window once max ts - 2h
    // passes its end)
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val maxSec = ev.agg(max(unix_timestamp(col("ts")))).collect()(0).getLong(0)
    val types = ref.keys.toSeq.sorted
    val batch = ev
      .select((floor(unix_timestamp(col("ts")) / 3600) * 3600).cast("long").as("b"),
        col("event_type"))
      .groupBy(col("b"))
      .agg(types.map(t =>
        sum(when(col("event_type") === t, 1L).otherwise(0L)).as(t)).head,
        types.map(t =>
          sum(when(col("event_type") === t, 1L).otherwise(0L)).as(t)).tail: _*)
      .filter(col("b") + 3600 <= maxSec - 7200)
      .orderBy(col("b"))
      .collect().map { r =>
        val ns = types.map(t => r.getAs[Long](t))
        val total = ns.sum // the testdata has no out-of-alphabet types
        // the OTHER cell (0 observed here) contributes nothing — it
        // arms only when an out-of-alphabet event is actually observed
        val k = types.length + 1
        val micro = types.zip(ns).map { case (t, n) =>
          val p = (n + 1).toDouble / (total + k)
          val qq = ref(t).toDouble / 1e6
          math.floor((p - qq) * math.log(p / qq) * 1e6 + 0.5).toLong
        }.sum
        (r.getLong(0), total, micro / 1e6)
      }
    assert(batch.nonEmpty)
    assert(streamed.length == batch.length)
    // psi is a rounded double of an integer-micro sum — exact compare is safe
    assert(streamed.sameElements(batch))
    // sanity: scores are finite, non-negative, and small — the stream IS
    // the uniform reference here and the OTHER cell stays silent
    assert(streamed.forall { case (_, _, psi) =>
      psi >= 0.0 && !psi.isNaN && !psi.isInfinite && psi < 2.0 })
  }

  test("type-mix drift ARMS on out-of-alphabet types (the OTHER cell)") {
    // drop 'view' from the alphabet (it carries ~19% of events): every
    // window that observes a view now routes it to the OTHER cell
    // against the 1-ppm floor — the monitor must read severe drift
    val ref = Map("click" -> 250000L, "error" -> 250000L,
      "purchase" -> 250000L, "signup" -> 250000L)
    val q = EventStream.typeMixDrift(EventStream.read(spark, eventsDir), ref)
      .writeStream.format("memory").queryName("psiarm")
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val psis = spark.sql("SELECT psi FROM psiarm").collect().map(_.getDouble(0))
    assert(psis.nonEmpty)
    assert(psis.max > 1.0,
      s"OTHER cell failed to arm: max psi ${psis.max} with 19% unseen traffic")
  }

  test("watermarked streaming dedup keeps one row per (user, type)") {
    val q = EventStream.dedupByUserType(EventStream.read(spark, eventsDir))
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT count(*) FROM dedup").collect()(0).getLong(0)
    val want = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(countDistinct(col("user_id"), col("event_type"))).collect()(0).getLong(0)
    assert(got == want, s"streamed $got vs batch distinct $want")
  }

  test("content dedup within watermark: dups collapse, state evicts past the horizon") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStream.FullEv
    val mem = MemoryStream[FullEv](spark)
    val q = EventStream.dedupContentWithinWatermark(mem.toDS().toDF())
      .writeStream.format("memory").queryName("content_dedup")
      .outputMode("append").start()
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val t0 = 1700000000L
    // same content three times within the horizon (different event ids) +
    // one distinct payload
    val batch1 = Seq(
      FullEv(1, ts(t0), 7, "click", 1.5, "{}"),
      FullEv(2, ts(t0 + 60), 7, "click", 1.5, "{}"),
      FullEv(3, ts(t0 + 120), 7, "click", 1.5, "{}"),
      FullEv(4, ts(t0 + 60), 8, "purchase", 9.0, "{}"))
    mem.addData(batch1: _*)
    q.processAllAvailable()
    // batch-twin equivalence over the same replay: one row per fingerprint
    val afterB1 = spark.sql("SELECT count(*) FROM content_dedup").collect()(0).getLong(0)
    val batchTwin = batch1.toDF()
      .withColumn("fp", md5(concat_ws("\u0001",
        col("user_id"), col("event_type"), col("value"), col("props"))))
      .dropDuplicates("fp").count()
    assert(afterB1 == batchTwin && afterB1 == 2, s"streamed $afterB1 vs batch $batchTwin")

    // advance the watermark 10h past t0, then replay the SAME content:
    // its state must have been evicted, so it is emitted again — the
    // within-watermark semantics (a plain dropDuplicates would drop it)
    mem.addData(FullEv(5, ts(t0 + 36000), 9, "view", 0.0, "{}"))
    q.processAllAvailable()
    mem.addData(FullEv(6, ts(t0 + 36060), 7, "click", 1.5, "{}"))
    q.processAllAvailable()
    q.stop()
    val clicks = spark.sql(
      "SELECT count(*) FROM content_dedup WHERE user_id = 7").collect()(0).getLong(0)
    assert(clicks == 2, s"expected re-admission after state eviction, got $clicks")
  }

  test("stream-stream interval join matches the batch twin") {
    val q = EventStream.purchaseThenError(EventStream.read(spark, eventsDir))
      .writeStream.format("memory").queryName("ssjoin")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT count(*) FROM ssjoin").collect()(0).getLong(0)
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pt"))
    val e = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("eu"), col("ts").as("et"))
    val want = p.join(e, col("pu") === col("eu") &&
      col("et") >= col("pt") && col("et") <= col("pt") + expr("INTERVAL 30 MINUTES")).count()
    assert(got == want, s"streamed $got vs batch $want")
  }

  test("stream-static join: events enriched by a broadcast dimension") {
    // static side: per-user tier from the customer table (re-keyed to the
    // events' user space); Spark re-plans the static side per micro-batch
    val tiers = Tables.load(spark, "/root/testdata/sf0.001", "customer")
      .select(col("c_custkey").as("user_id"),
        (col("c_custkey") % 3).as("tier"))
    val enriched = EventStream.read(spark, eventsDir)
      .join(broadcast(tiers), Seq("user_id"))
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n"))
    val q = enriched.writeStream.format("memory").queryName("tiered")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT tier, n FROM tiered ORDER BY tier").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .join(broadcast(tiers), Seq("user_id"))
      .groupBy(col("tier")).agg(count(lit(1)).as("n"))
      .orderBy(col("tier")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want && got.nonEmpty, s"streamed $got vs batch $want")
  }

  test("bloom-guarded streaming decontamination equals the batch anti-join") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    // blocklist: a subset of users (at sf0.001 every user has produced an
    // error at some point, so key off id range to keep both sides nonempty)
    val block = ev.filter(col("user_id") % 3 === 1)
      .select(col("user_id")).distinct()
    val bloom = graft.functions.buildBloom(block, "user_id", 1000L, 8192L)
    val q = EventStream.dropBlocked(
        EventStream.read(spark, eventsDir), "user_id", bloom, block)
      .select(col("event_id"))
      .writeStream.format("memory").queryName("decontam").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql("SELECT event_id FROM decontam").collect()
      .map(_.getLong(0)).sorted
    val batch = ev.join(block, Seq("user_id"), "left_anti")
      .select(col("event_id")).collect().map(_.getLong(0)).sorted
    // the filter must actually drop something, and the bloom's false
    // positives must all have been cleared by the exact anti-join branch
    assert(batch.nonEmpty && batch.length < ev.count(), "blocklist dropped nothing")
    assert(streamed.sameElements(batch),
      s"streamed ${streamed.length} rows vs batch ${batch.length}")
  }

  test("streaming incremental dedup classifies arrivals exactly like batch d11") {
    // the d11 split: doc_id % 7 == 3 is the arriving batch, the rest is
    // the standing corpus
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val corpus = docs.filter(col("doc_id") % 7 =!= 3)
    val arrivalsDir = Files.createTempDirectory("dedup-arrivals")
    docs.filter(col("doc_id") % 7 === 3)
      .write.mode("overwrite").parquet(arrivalsDir.toString)
    // capture batchId via foreachBatch so "last update per doc" is keyed
    // by REAL recency (the micro-batch id), not an ordering coincidence
    // over status labels
    val updates = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Long, Long, String)]())
    val q = CorpusStream.incrementalDedup(
        CorpusStream.read(spark, arrivalsDir.toString), corpus)
      .writeStream.outputMode("update")
      .foreachBatch {
        (ds: org.apache.spark.sql.Dataset[CorpusStream.DedupStatus],
         batchId: Long) =>
          ds.collect().foreach(r => updates.add((batchId, r.doc_id, r.status)))
          ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    // last update per doc = the final classification
    import scala.jdk.CollectionConverters._
    val streamed = updates.asScala.toSeq.groupBy(_._2)
      .map { case (id, rows) => (id, rows.maxBy(_._1)._3) }
      .toSeq.sortBy(_._1)
    val batch = graft.SparkEntry.queries("d11_incremental")(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(batch.nonEmpty && batch.map(_._2).distinct.size > 1,
      "batch twin produced a single-class corpus — weak test")
    assert(streamed == batch, {
      val s = streamed.toMap; val b = batch.toMap
      val diff = (s.keySet ++ b.keySet).filter(k => s.get(k) != b.get(k)).take(5)
      s"mismatch on ${diff.map(k => s"$k: ${s.get(k)} vs ${b.get(k)}")}"
    })
  }

  test("streaming embedding near-dup at ingest equals the batch twin and is sound") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val corpus = e.filter(col("vec_id") % 3 =!= 0)
    val arrivalsDir = Files.createTempDirectory("emb-arrivals")
    e.filter(col("vec_id") % 3 === 0)
      .write.mode("overwrite").parquet(arrivalsDir.toString)
    // data-derived threshold: the 20th-highest cross-split cosine, so the
    // equality assertion always has real pairs to compare regardless of
    // the synthetic corpus's similarity floor
    val brutePairs = e.filter(col("vec_id") % 3 === 0).as("a")
      .crossJoin(corpus.as("b"))
      .select(col("a.vec_id").as("v"), col("b.vec_id").as("c"),
        round(graft.functions.vector_dot(col("a.embedding"), col("b.embedding")) /
          (sqrt(graft.functions.vector_dot(col("a.embedding"), col("a.embedding"))) *
           sqrt(graft.functions.vector_dot(col("b.embedding"), col("b.embedding")))), 6)
          .as("cos"))
    val th = brutePairs.select(col("cos")).orderBy(col("cos").desc)
      .limit(20).collect().map(_.getDouble(0)).min
    val q = EmbeddingStream.neardupAgainst(
        EmbeddingStream.read(spark, arrivalsDir.toString), corpus, th)
      .writeStream.format("memory").queryName("emb_neardup").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql(
        "SELECT vec_id, corpus_id, cos FROM emb_neardup ORDER BY vec_id, corpus_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // batch twin: the identical operator over batch frames
    val batch = EmbeddingStream.neardupAgainst(
        e.filter(col("vec_id") % 3 === 0), corpus, th)
      .orderBy(col("vec_id"), col("corpus_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(batch.nonEmpty, "no near-dup pairs at this threshold — weak test")
    assert(streamed == batch, s"stream ${streamed.length} vs batch ${batch.length}")
    // soundness: every emitted pair really clears the exact threshold
    // (brute-force cosine, no LSH in the check path)
    val brute = brutePairs.filter(col("cos") >= th)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    streamed.foreach { p =>
      assert(brute.contains(p), s"emitted pair $p fails the brute-force threshold")
    }
  }

  test("streaming curation stages match the batch funnel's survivor set") {
    val docsDir = {
      val dir = Files.createTempDirectory("docs-curation")
      Files.copy(Paths.get("/root/testdata/sf0.001/documents.parquet"),
        dir.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
      dir.toString
    }
    val q = CorpusStream.curationSurvivors(CorpusStream.read(spark, docsDir))
      .select(col("source"), col("hash"))
      .writeStream.format("memory").queryName("curation").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val streamedHashes = spark.sql("SELECT hash FROM curation")
      .collect().map(_.getString(0)).sorted
    // batch twin: the same row-local stages relationally, one row per
    // distinct surviving content hash
    val batch = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("n_chars") >= 100 && col("n_chars") <= 20000)
      .filter(lit(10) * length(regexp_replace(lower(col("text")), "[^a-z]", ""))
        >= lit(6) * col("n_chars"))
      .select(md5(col("text")).as("hash")).distinct()
      .collect().map(_.getString(0)).sorted
    // the stages must actually drop something, the dedup must actually
    // collapse something, and the surviving hash set must be exact
    val total = Tables.load(spark, "/root/testdata/sf0.001", "documents").count()
    assert(batch.nonEmpty && batch.length < total, "curation dropped nothing")
    assert(streamedHashes.sameElements(batch),
      s"streamed ${streamedHashes.length} survivors vs batch ${batch.length}")
  }

  test("streaming token-budget monitor accrues exact per-source totals and flags overruns") {
    val docsDir = {
      val dir = Files.createTempDirectory("docs-budget-stream")
      Files.copy(Paths.get("/root/testdata/sf0.001/documents.parquet"),
        dir.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
      dir.toString
    }
    // batch truth: per-source token totals on the same corpus
    val batch = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("source"), graft.functions.token_count(col("text")).cast("long").as("t"))
      .groupBy(col("source")).agg(sum(col("t")).as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(batch.nonEmpty)
    // budget half the sources below their actual total -> must flag
    val budgets = batch.toSeq.sortBy(_._1).zipWithIndex.map { case ((s0, tot), i) =>
      s0 -> (if (i % 2 == 0) tot / 2 else tot * 2)
    }.toMap
    val q = CorpusStream.budgetMonitor(CorpusStream.read(spark, docsDir), budgets)
      .writeStream.format("memory").queryName("budget").outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    // last update per source = the final cumulative state
    val streamed = spark.sql(
      """SELECT source, cum_tokens, over_budget FROM (
        |  SELECT source, cum_tokens, over_budget, row_number() OVER (
        |    PARTITION BY source ORDER BY cum_tokens DESC) AS rn FROM budget)
        |WHERE rn = 1 ORDER BY source""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(streamed.length == batch.size)
    streamed.foreach { case (s0, cum, over) =>
      assert(cum == batch(s0), s"$s0: streamed $cum vs batch ${batch(s0)}")
      assert(over == (cum > budgets(s0)), s"$s0: flag $over at $cum vs ${budgets(s0)}")
    }
    // the halved-budget sources actually flagged
    assert(streamed.count(_._3) == budgets.count { case (s0, b) => batch(s0) > b })
    assert(streamed.exists(_._3) && streamed.exists(!_._3))
  }

  test("streaming KMV sketch converges to the batch t12 estimate exactly") {
    val docsDir = {
      val dir = Files.createTempDirectory("docs-stream")
      Files.copy(Paths.get("/root/testdata/sf0.001/documents.parquet"),
        dir.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
      dir.toString
    }
    val q = CorpusStream.kmvDistinct(
        CorpusStream.hashedTokens(CorpusStream.read(spark, docsDir)), k = 16)
      .writeStream.format("memory").queryName("kmv").outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    // last update per key = the final sketch state
    val streamed = spark.sql(
      """SELECT key, est FROM (
        |  SELECT key, est, row_number() OVER (
        |    PARTITION BY key ORDER BY n_tracked DESC) AS rn FROM kmv)
        |WHERE rn = 1 ORDER BY key""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    // batch twin: the oracle-gated t12 query on the same corpus
    val batch = graft.SparkEntry.queries("t12_kmv_distinct")(spark, "/root/testdata/sf0.001")
      .select(col("lang"), col("kmv_est"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"streaming sketch $streamed vs batch gate $batch")
  }

  test("event-time timeout closes idle sessions without a successor event") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStream.TsEv
    val mem = MemoryStream[TsEv](spark)
    val q = EventStream.sessionizeWithTimeout(
        mem.toDS().withWatermark("ts", "0 seconds").as[TsEv])
      .writeStream.format("memory").queryName("to_sessions")
      .outputMode("append").start()
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val t0 = 1700000000L
    // user 1: two events, then silence forever
    mem.addData(TsEv(1, ts(t0), 1), TsEv(2, ts(t0 + 60), 1))
    q.processAllAvailable() // watermark -> t0+60
    // user 2 advances the watermark far past user 1's last+gap
    mem.addData(TsEv(3, ts(t0 + 7200), 2))
    q.processAllAvailable() // watermark -> t0+7200
    // one more batch: the timeout fires against the advanced watermark
    mem.addData(TsEv(4, ts(t0 + 7260), 2))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT * FROM to_sessions")
      .as[graft.streaming.EventStream.Session].collect()
    assert(got.exists(s => s.user_id == 1 && s.n_events == 2 && s.dur_sec == 60),
      got.mkString(", "))
  }

  test("streaming per-window top-k: final ranks emit once on window close") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStream.{TypedEv, WindowTopK}
    val mem = MemoryStream[TypedEv](spark)
    val q = EventStream.topKPerWindow(
        mem.toDS().withWatermark("ts", "0 seconds").as[TypedEv],
        windowSec = 600L, k = 2)
      .writeStream.format("memory").queryName("topk")
      .outputMode("append").start()
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val w0 = 1700000400L // aligned: 1700000400 % 600 == 0
    // window w0: a x3, b x2, c x1 -> top-2 = a(3), b(2)
    mem.addData(
      TypedEv(1, ts(w0 + 10), "a"), TypedEv(2, ts(w0 + 20), "b"),
      TypedEv(3, ts(w0 + 30), "a"), TypedEv(4, ts(w0 + 40), "c"),
      TypedEv(5, ts(w0 + 50), "b"), TypedEv(6, ts(w0 + 60), "a"))
    q.processAllAvailable() // watermark -> w0+60: window still open, no rows
    assert(spark.sql("SELECT * FROM topk").count() == 0)
    // next window's traffic pushes the watermark past w0's end
    mem.addData(TypedEv(7, ts(w0 + 1200), "d"))
    q.processAllAvailable()
    mem.addData(TypedEv(8, ts(w0 + 1260), "d"))
    q.processAllAvailable() // timeout fires against watermark w0+1260
    q.stop()
    val got = spark.sql("SELECT * FROM topk").as[WindowTopK].collect()
      .sortBy(r => (r.window_start, r.rk))
    assert(got.toSeq == Seq(
      WindowTopK(w0, "a", 3L, 1), WindowTopK(w0, "b", 2L, 2)),
      got.mkString(", "))
  }

  test("stateful sessionization emits gap-closed sessions") {
    import spark.implicits._
    val evs = EventStream.read(spark, eventsDir)
      .select(col("event_id"), unix_timestamp(col("ts")).as("sec"), col("user_id"))
      .as[EventStream.Ev]
    val q = EventStream.sessionize(evs)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()

    val sessions = spark.sql("SELECT * FROM sessions").collect()
    assert(sessions.nonEmpty, "closed sessions must be emitted")

    // batch twin: session count per user (minus the still-open last
    // session of each user, which streaming hasn't closed)
    val batchSessions = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id"), unix_timestamp(col("ts")).as("sec"), col("event_id"))
      .withColumn("prev", lag(col("sec"), 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
          .orderBy(col("sec"), col("event_id"))))
      .withColumn("new_sess", when(col("prev").isNull || col("sec") - col("prev") > 1800, 1).otherwise(0))
      .agg(sum(col("new_sess"))).collect()(0).getLong(0)
    val users = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    assert(sessions.length == batchSessions - users,
      s"streamed closed sessions ${sessions.length} vs batch $batchSessions - $users open")
  }
}
