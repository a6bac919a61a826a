package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Spark

/** A/B probe for the g5/g7/g8 sf1 plateau (VERDICT r13 ask #3): the
  * JobCensus floor model says their wall time is dominated by exchange
  * count (g5: 18 jobs/18 stages ≈ 2.9 s of 3.77 s at sf1), so the
  * candidate rewrites cut EXCHANGES PER ROUND, not shuffle bytes.
  * Every variant's VALUES are asserted equal to the current gate query
  * before its timing is trusted.
  *
  * r14 measured outcomes (three windows, /tmp/graft-sf1 at k=10):
  *   - mode-round g5 (broadcast label relation + ONE `mode(lbl, true)`
  *     aggregate): 2.80 -> 2.11 s — ADOPTED as the gate query, so the
  *     probe no longer carries it as a variant (it would A/B the gate
  *     against itself); `g5ModeAgg` here composes it with the REJECTED
  *     aggregate-form edge build.
  *   - g7_fused (no per-round checkpoint): 9.47 s vs 1.66 s — REJECTED,
  *     recompute explosion through 4 nested semi-join rounds.
  *   - g7_bcast (broadcast-hinted peel semi-joins): no win (1.30 vs
  *     1.17 s) — AQE already picks broadcast; REJECTED.
  *   - g8_fused (no per-round lazy checkpoint): mixed/noise (1.47 vs
  *     1.62, then 1.44 vs 1.39) — NOT adopted.
  *   - edgesAgg (collect_set + id_pairs edge build): 1.53 vs 1.02 s —
  *     REJECTED, object-agg buffers lose to the exchange+SMJ form (the
  *     collect-list-vs-window lesson).
  *
  * Usage:
  *   SPARK_GRAFT_EXTRA_JAVA_OPTS=-Dgraft.graph.capScale=10 \
  *     sbt "Test/runMain graft.tools.ProbeGRounds /tmp/graft-sf1 3"
  */
object ProbeGRounds {

  private def capScale: Long = sys.props.getOrElse("graft.graph.capScale", "1").toLong

  private def edges(s: SparkSession, dir: String): DataFrame = {
    val li = graft.Tables.load(s, dir, "lineitem")
      .filter(col("l_partkey") < 3000L * capScale)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .repartition(col("o"))
      .distinct()
    li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("d1"), col("b.p").as("d2"))
      .distinct().localCheckpoint(true)
  }

  /** Aggregate-form edge build: ONE map-side-combinable collect_set per
    * order (the (o,p) distinct happens inside the set), pairs generated
    * ROW-LOCALLY by id_pairs, then the (d1,d2) distinct. Replaces
    * repartition(o) + distinct + SMJ self-join (which sorts the relation
    * twice) with a hash aggregate + array explode. */
  private def edgesAgg(s: SparkSession, dir: String): DataFrame =
    graft.Tables.load(s, dir, "lineitem")
      .filter(col("l_partkey") < 3000L * capScale)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .groupBy(col("o")).agg(collect_set(col("p")).as("ps"))
      .select(explode(graft.functions.id_pairs(col("ps"))).as("pr"))
      .select(col("pr.d1").as("d1"), col("pr.d2").as("d2"))
      .distinct().localCheckpoint(true)

  private def g7Agg(s: SparkSession, dir: String): DataFrame = {
    val k = 80
    var e: DataFrame = edgesAgg(s, dir)
    var bi = e.union(e.select(col("d2").as("d1"), col("d1").as("d2")))
    var deg = bi.groupBy(col("d1")).agg(count(lit(1)).as("deg"))
    val rounds = (1 to 4).map { r =>
      val keep = deg.filter(col("deg") >= k).select(col("d1").as("node"))
      e = e.join(keep.select(col("node").as("d1")), Seq("d1"), "left_semi")
        .join(keep.select(col("node").as("d2")), Seq("d2"), "left_semi")
        .select(col("d1"), col("d2"))
        .localCheckpoint(true)
      bi = e.union(e.select(col("d2").as("d1"), col("d1").as("d2")))
      deg = bi.groupBy(col("d1")).agg(count(lit(1)).as("deg"))
      deg.agg(count(lit(1)).cast("long").as("n_nodes"),
          expr("coalesce(sum(deg), CAST(0 AS BIGINT)) div 2").as("n_edges"))
        .select(lit(r).as("round"), col("n_nodes"), col("n_edges"))
    }
    rounds.reduce(_ union _).orderBy(col("round"))
  }

  private def g5ModeAgg(s: SparkSession, dir: String): DataFrame = {
    val e = edgesAgg(s, dir)
    val bi = e.union(e.select(col("d2").as("d1"), col("d1").as("d2")))
    var lab = bi.select(col("d1")).distinct()
      .select(col("d1").as("node"), col("d1").as("lbl"))
      .localCheckpoint(true)
    for (_ <- 1 to 3) {
      lab = bi.join(broadcast(lab), col("d1") === col("node"))
        .groupBy(col("d2"))
        .agg(expr("mode(lbl, true)").as("lbl"))
        .select(col("d2").as("node"), col("lbl"))
    }
    lab.groupBy(col("lbl")).agg(count(lit(1)).as("community_size"))
      .select(col("lbl").as("community"), col("community_size"))
      .orderBy(col("community_size").desc, col("community"))
      .limit(20)
  }

  private def g8Agg(s: SparkSession, dir: String): DataFrame = {
    val e = edgesAgg(s, dir)
    val bi = e.union(e.select(col("d2").as("d1"), col("d1").as("d2")))
    var dist = bi.select(col("d1")).distinct().filter(col("d1") < 20)
      .select(col("d1").as("src"), col("d1").as("node"), lit(0L).as("dist"))
      .localCheckpoint(true)
    for (_ <- 1 to 3) {
      val relaxed = bi.join(broadcast(dist), col("d1") === col("node"))
        .select(col("src"), col("d2").as("node"), (col("dist") + 1L).as("dist"))
      dist = dist.union(relaxed)
        .groupBy(col("src"), col("node")).agg(min(col("dist")).as("dist"))
        .localCheckpoint(false)
    }
    dist.filter(col("dist") > 0)
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n_reached"),
        sum(expr("1000000 div dist")).cast("long").as("harmonic_micro"))
      .orderBy(col("harmonic_micro").desc, col("src"))
  }

  private def g7Fused(s: SparkSession, dir: String): DataFrame = {
    val k = 80
    var e: DataFrame = edges(s, dir)
    var bi = e.union(e.select(col("d2").as("d1"), col("d1").as("d2")))
    var deg = bi.groupBy(col("d1")).agg(count(lit(1)).as("deg"))
    val rounds = (1 to 4).map { r =>
      val keep = deg.filter(col("deg") >= k).select(col("d1").as("node"))
      e = e.join(keep.select(col("node").as("d1")), Seq("d1"), "left_semi")
        .join(keep.select(col("node").as("d2")), Seq("d2"), "left_semi")
        .select(col("d1"), col("d2"))
      bi = e.union(e.select(col("d2").as("d1"), col("d1").as("d2")))
      deg = bi.groupBy(col("d1")).agg(count(lit(1)).as("deg"))
      deg.agg(count(lit(1)).cast("long").as("n_nodes"),
          expr("coalesce(sum(deg), CAST(0 AS BIGINT)) div 2").as("n_edges"))
        .select(lit(r).as("round"), col("n_nodes"), col("n_edges"))
    }
    rounds.reduce(_ union _).orderBy(col("round"))
  }

  /** g7 with the checkpoint-leaf broadcast idiom: `e` is a stats-less
    * checkpoint leaf, so the planner can make the peel semi-joins SMJ —
    * hint broadcast on the (tiny, deg>=80) keep side of both. */
  private def g7Bcast(s: SparkSession, dir: String): DataFrame = {
    val k = 80
    var e: DataFrame = edges(s, dir)
    var bi = e.union(e.select(col("d2").as("d1"), col("d1").as("d2")))
    var deg = bi.groupBy(col("d1")).agg(count(lit(1)).as("deg"))
    val rounds = (1 to 4).map { r =>
      val keep = deg.filter(col("deg") >= k).select(col("d1").as("node"))
      e = e.join(broadcast(keep.select(col("node").as("d1"))), Seq("d1"), "left_semi")
        .join(broadcast(keep.select(col("node").as("d2"))), Seq("d2"), "left_semi")
        .select(col("d1"), col("d2"))
        .localCheckpoint(true)
      bi = e.union(e.select(col("d2").as("d1"), col("d1").as("d2")))
      deg = bi.groupBy(col("d1")).agg(count(lit(1)).as("deg"))
      deg.agg(count(lit(1)).cast("long").as("n_nodes"),
          expr("coalesce(sum(deg), CAST(0 AS BIGINT)) div 2").as("n_edges"))
        .select(lit(r).as("round"), col("n_nodes"), col("n_edges"))
    }
    rounds.reduce(_ union _).orderBy(col("round"))
  }

  private def g8Fused(s: SparkSession, dir: String): DataFrame = {
    val e = edges(s, dir)
    val bi = e.union(e.select(col("d2").as("d1"), col("d1").as("d2")))
    var dist = bi.select(col("d1")).distinct().filter(col("d1") < 20)
      .select(col("d1").as("src"), col("d1").as("node"), lit(0L).as("dist"))
      .localCheckpoint(true)
    for (_ <- 1 to 3) {
      val relaxed = bi.join(broadcast(dist), col("d1") === col("node"))
        .select(col("src"), col("d2").as("node"), (col("dist") + 1L).as("dist"))
      dist = dist.union(relaxed)
        .groupBy(col("src"), col("node")).agg(min(col("dist")).as("dist"))
    }
    dist.filter(col("dist") > 0)
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n_reached"),
        sum(expr("1000000 div dist")).cast("long").as("harmonic_micro"))
      .orderBy(col("harmonic_micro").desc, col("src"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf1")
    val runs = if (args.length > 1) args(1).toInt else 3
    val spark = Spark.session(appName = "graft-probe-grounds")
    if (!sys.props.contains("graft.graph.capScale") && dir.contains("sf1"))
      println("[probe] WARNING: capScale unset over a scaled dir — shrunk graph!")

    // edge-build share: the floor every variant pays before any round —
    // decomposed into its pipeline steps so the heavy one is named
    locally {
      def li = graft.Tables.load(spark, dir, "lineitem")
        .filter(col("l_partkey") < 3000L * capScale)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .repartition(col("o"))
        .distinct()
      def pairs = li.as("a").join(li.as("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .select(col("a.p").as("d1"), col("b.p").as("d2"))
      val steps: Seq[(String, () => Long)] = Seq(
        ("scan+repart+distinct", () => li.count()),
        ("  +wedge join", () => pairs.count()),
        ("  +pair distinct", () => pairs.distinct().count()),
        ("  +checkpoint (full)", () => edges(spark, dir).count()),
        ("edgesAgg (full)", () => edgesAgg(spark, dir).count()))
      steps.foreach { case (nm, f) =>
        f() // warm
        val ts = (1 to runs).map { _ =>
          val t0 = System.nanoTime(); val n = f(); ((System.nanoTime() - t0) / 1e9, n)
        }
        println(f"[probe] ${nm}%-22s ${ts.map(_._1).sorted.apply(ts.size / 2)}%.2fs rows=${ts.head._2} " +
          ts.map(t => f"${t._1}%.2f").mkString("[", ",", "]"))
      }
    }

    // EVERY defined variant is runnable — the list is the measured-
    // rejection record (r14 outcomes in the scaladoc): nothing compiles
    // here without being exercised by an invocation.
    val variants: Seq[(String, String, (SparkSession, String) => DataFrame)] = Seq(
      ("g5_label_prop", "g5_mode_agg", g5ModeAgg),
      ("g7_kcore", "g7_agg", g7Agg),
      ("g8_harmonic", "g8_agg", g8Agg),
      ("g7_kcore", "g7_fused", g7Fused),
      ("g7_kcore", "g7_bcast", g7Bcast),
      ("g8_harmonic", "g8_fused", g8Fused))

    variants.foreach { case (base, name, fn) =>
      val cur = graft.SparkEntry.queries(base)
      // value equality first — a faster wrong answer is not a result
      val a = cur(spark, dir).collect().map(_.toString).sorted.toSeq
      val b = fn(spark, dir).collect().map(_.toString).sorted.toSeq
      require(a == b, s"$name != $base:\n base=${a.take(3)}\n variant=${b.take(3)}")
      def time(f: (SparkSession, String) => DataFrame): Seq[Double] = {
        f(spark, dir).count() // warm
        (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          f(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }
      }
      val tc = time(cur)
      val tv = time(fn)
      def med(x: Seq[Double]) = x.sorted.apply(x.size / 2)
      println(f"[probe] $base%-15s cur=${med(tc)}%.2fs ${tc.map(t => f"$t%.2f").mkString("[",",","]")}  " +
        f"$name=${med(tv)}%.2fs ${tv.map(t => f"$t%.2f").mkString("[",",","]")}  values_equal=true")
    }
    spark.stop()
  }
}
