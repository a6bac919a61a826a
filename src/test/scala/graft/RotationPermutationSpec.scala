package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins v9_pq_rot's driver-computed signed permutation to the SQL form
  * it replaced (r20): the r19 shape derived (pi, ps) as a one-row Spark
  * aggregate — md5("rot" || i) hex, sign from the 2nd hex digit,
  * entries sorted by (h, i, sg) — and applied it through an interpreted
  * transform() lambda. The r20 shape computes the same 64-entry table
  * with java.security MessageDigest on the driver and applies it as a
  * codegen'd static array constructor. This spec recomputes BOTH and
  * asserts element-for-element equality, plus the rotated vectors of a
  * deterministic corpus under both application forms. */
class RotationPermutationSpec extends AnyFunSuite {

  private lazy val spark = Spark.session(master = "local[4]",
    shufflePartitions = 4, appName = "graft-rot-prop")

  private def driverPerm: Seq[(String, Int, Double)] =
    (0 until 64).map { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"rot$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
      (h, i, if (h.charAt(1) <= '7') 1.0 else -1.0)
    }.sortBy(_._1)

  test("driver-computed (pi, ps) equals the SQL one-row aggregate") {
    val pmOk = spark.range(64).select(col("id").cast("int").as("i"))
      .select(col("i"), md5(concat(lit("rot"), col("i"))).as("h"))
      .select(col("i"), col("h"),
        when(expr("substr(h, 2, 1) IN ('0','1','2','3','4','5','6','7')"), 1.0)
          .otherwise(-1.0).as("sg"))
      .groupBy()
      .agg(expr("transform(array_sort(collect_list(struct(h, i, sg))), x -> x.i)").as("pi"),
        expr("transform(array_sort(collect_list(struct(h, i, sg))), x -> x.sg)").as("ps"))
    val row = pmOk.head()
    val pi = row.getSeq[Int](0)
    val ps = row.getSeq[Double](1)
    val d = driverPerm
    assert(pi == d.map(_._2), "permutation order diverged from the SQL form")
    assert(ps == d.map(_._3), "sign vector diverged from the SQL form")
  }

  test("literal-array rotation application equals the broadcast-pm form") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val corpus = (0 until 50).map(i =>
      (i.toLong, Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat)))
    val df = corpus.toDF("vec_id", "embedding")
    val d = driverPerm
    // the production v9 shape: pi/ps inlined as SQL array literals in
    // the SAME transform() the r19 form used (the HOF stays as the
    // codegen barrier that keeps the encode span JIT-compilable)
    val piLit = d.map(_._2).mkString("array(", ", ", ")")
    val psLit = d.map(_._3).map(v => s"${v}D").mkString("array(", ", ", ")")
    val staticRot = df.select(col("vec_id"),
      expr(s"transform(sequence(0, 63), j -> $psLit[j] * " +
        s"CAST(embedding[$piLit[j]] AS DOUBLE))").as("r"))
    val pm = spark.range(64).select(col("id").cast("int").as("i"))
      .select(col("i"), md5(concat(lit("rot"), col("i"))).as("h"))
      .select(col("i"), col("h"),
        when(expr("substr(h, 2, 1) IN ('0','1','2','3','4','5','6','7')"), 1.0)
          .otherwise(-1.0).as("sg"))
      .groupBy()
      .agg(expr("transform(array_sort(collect_list(struct(h, i, sg))), x -> x.i)").as("pi"),
        expr("transform(array_sort(collect_list(struct(h, i, sg))), x -> x.sg)").as("ps"))
    val hofRot = df.crossJoin(broadcast(pm))
      .select(col("vec_id"),
        expr("transform(sequence(0, 63), j -> ps[j] * CAST(embedding[pi[j]] AS DOUBLE))")
          .as("r"))
    val a = staticRot.orderBy("vec_id").collect().map(r => r.getSeq[Double](1))
    val b = hofRot.orderBy("vec_id").collect().map(r => r.getSeq[Double](1))
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }
}
