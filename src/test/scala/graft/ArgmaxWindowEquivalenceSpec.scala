package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized equivalence gate for v2's round-11 rewrite: the rk=1
  * per-vector window was replaced by a max-struct ARGMAX (v17's idiom —
  * argmax by (round-6 cos desc, cell asc)), so the exchange moves one row
  * per vector instead of sorting n x K rows. This spec runs the UNMODIFIED
  * v2 gate query against synthetic embeddings and compares it to the old
  * window formulation built from the same relation — including a corpus
  * where two labels are seeded with IDENTICAL member vectors, so their
  * centroids tie exactly and the (cos desc, cell asc) tie-break is
  * actually exercised, not just present. */
class ArgmaxWindowEquivalenceSpec extends AnyFunSuite {

  private lazy val spark = Spark.session(master = "local[4]",
    shufflePartitions = 4, appName = "graft-argmax-prop")

  private def corpus(seed: Long, withTie: Boolean): Seq[(Long, Array[Float], Int)] = {
    val rnd = new scala.util.Random(seed)
    val base = (0 until 150).map { i =>
      (i.toLong, Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat), i % 5)
    }
    if (!withTie) base
    else {
      // labels 3 and 4 get byte-identical member sets -> identical
      // centroids -> every vector's cos to cell 3 EQUALS its cos to
      // cell 4 exactly (same doubles), so the tie-break decides
      val tied = base.filter(_._3 == 3)
        .map { case (id, e, _) => (id + 1000L, e.clone(), 4) }
      base.filterNot(_._3 == 4) ++ tied
    }
  }

  test("v2 argmax assignment == rk=1 window assignment (random + exact-tie corpora)") {
    import spark.implicits._
    for ((seed, tie) <- Seq((91L, false), (92L, false), (93L, true))) {
      val dir = java.nio.file.Files.createTempDirectory("argmax-prop").toString
      corpus(seed, tie).toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

      val got = SparkEntry.queries("v2_ivf_assign")(spark, dir)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq

      // the pre-round-11 formulation, rebuilt verbatim on the same data
      val e = Tables.load(spark, dir, "embeddings")
      val cent = e.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos"))
        .agg(avg(col("v")).as("cv"))
        .groupBy(col("label"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, cv))), x -> x.cv)")
          .as("centroid"))
        .select(col("label").as("cell"), col("centroid"))
      val scored = e
        .withColumn("nrm", sqrt(graft.functions.vector_dot(col("embedding"), col("embedding"))))
        .join(broadcast(cent.withColumn("cn",
          sqrt(graft.functions.vector_dot(col("centroid"), col("centroid"))))))
        .select(col("vec_id"), col("label"), col("cell"),
          (graft.functions.vector_dot(col("embedding"), col("centroid"))
            / (col("nrm") * col("cn"))).as("cos_raw"))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(round(col("cos_raw"), 6).desc, col("cell"))
      val want = scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .groupBy(col("label"), col("cell"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("label"), col("cell"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq

      assert(got == want, s"seed=$seed tie=$tie: argmax != window rk=1")
      if (tie) {
        // the tie actually fired: no vector may land in cell 4 (cell 3
        // wins every exact tie), and cell 3 must hold both labels' mass
        assert(!got.exists(_._2 == 4), "exact centroid tie was not exercised")
      }
    }
  }
}
