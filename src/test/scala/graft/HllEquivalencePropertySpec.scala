package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized equivalence gate for the repo's TWO HLL register paths
  * (VERDICT r9 ask #7): t13's `hll_estimate` TypedImperativeAggregate
  * (`functions/HllSketch.scala`) and e24's SQL register-max algebra
  * (register = h mod 64, rho = 55 - bitlength(h div 64), harmonic
  * denominator in exact integers) implement the same 64-register sketch
  * independently — this spec pins them to each other AND to a
  * plain-Scala reference kernel on random inputs, so neither can drift.
  * Also pins MERGEABILITY on random partitions: merging per-part
  * register maxima must equal the direct sketch, through both paths.
  *
  * Input domain is the shipped contract: nonnegative 60-bit hashes
  * (15 hex digits of md5), drawn with duplicates, skew, and the
  * boundary values 0 and 2^60 - 1.
  */
class HllEquivalencePropertySpec extends AnyFunSuite {

  private lazy val spark = Spark.session(master = "local[4]",
    shufflePartitions = 4, appName = "graft-hll-prop")

  /** Reference kernel: the t13/e24 register algebra in plain Scala. */
  private def refEstimate(hs: Seq[Long]): Long = {
    val reg = new Array[Int](64)
    hs.foreach { h =>
      val r = (h % 64).toInt
      val rem = h / 64
      val rho = if (rem == 0L) 55 else 55 - (64 - java.lang.Long.numberOfLeadingZeros(rem))
      if (rho > reg(r)) reg(r) = rho
    }
    val denom = reg.map(q => 1L << (55 - q)).sum
    math.floor(1.0462993238608057e20 / denom.toDouble + 0.5).toLong
  }

  /** Random 60-bit hash multiset: mixed cardinalities, heavy duplicates,
    * low-bit clumping (stresses register selection), plus boundaries. */
  private def hashes(seed: Long, n: Int): Seq[Long] = {
    val rnd = new scala.util.Random(seed)
    val distinct = math.max(1, n / (1 + rnd.nextInt(10)))
    val pool = Seq.fill(distinct)(rnd.nextLong(1L << 60)) ++
      Seq(0L, (1L << 60) - 1, rnd.nextInt(64).toLong) // tiny h: rem == 0 path
    Seq.fill(n)(pool(rnd.nextInt(pool.size)))
  }

  test("aggregate == SQL register algebra == reference kernel on random inputs") {
    import spark.implicits._
    for (seed <- 1L to 6L) {
      val hs = hashes(seed, n = 2000 + seed.toInt * 777)
      val df = hs.toDF("h").repartition(4)
      val viaAgg = df.agg(graft.functions.hll_estimate(col("h"))).as[Long].head()
      // e24's exact SQL shape: register-max, integer harmonic denominator
      val viaSql = df
        .select((col("h") % 64).as("register"), expr("h div 64").as("rem"))
        .select(col("register"),
          when(col("rem") === 0, lit(55))
            .otherwise(lit(55) - length(expr("bin(rem)"))).as("rho"))
        .groupBy(col("register")).agg(max(col("rho")).as("rho_j"))
        .agg(count(lit(1)).as("nr"),
          sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - rho_j AS INT))")).as("sd"))
        .select(expr(
          "CAST(floor(1.0462993238608057e20 / (sd + (64 - nr) * " +
            "shiftleft(CAST(1 AS BIGINT), 55)) + 0.5) AS BIGINT)"))
        .as[Long].head()
      val ref = refEstimate(hs)
      assert(viaAgg == ref, s"seed $seed: aggregate $viaAgg != reference $ref")
      assert(viaSql == ref, s"seed $seed: sql $viaSql != reference $ref")
    }
  }

  test("merge of random partitions equals the direct sketch, both paths") {
    import spark.implicits._
    for (seed <- 10L to 13L) {
      val rnd = new scala.util.Random(seed)
      val hs = hashes(seed, n = 3000)
      val parts = hs.map(h => (rnd.nextInt(7), h)) // 7 random "days"
      val df = parts.toDF("d", "h").repartition(4)
      // e24's shape: per-part register maxima merged by register-wise max
      val merged = df
        .select(col("d"), (col("h") % 64).as("register"), expr("h div 64").as("rem"))
        .select(col("d"), col("register"),
          when(col("rem") === 0, lit(55))
            .otherwise(lit(55) - length(expr("bin(rem)"))).as("rho"))
        .groupBy(col("d"), col("register")).agg(max(col("rho")).as("rho_d"))
        .groupBy(col("register")).agg(max(col("rho_d")).as("rho_j"))
        .agg(count(lit(1)).as("nr"),
          sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - rho_j AS INT))")).as("sd"))
        .select(expr(
          "CAST(floor(1.0462993238608057e20 / (sd + (64 - nr) * " +
            "shiftleft(CAST(1 AS BIGINT), 55)) + 0.5) AS BIGINT)"))
        .as[Long].head()
      // aggregate path: partial buffers merge inside the agg machinery
      val direct = df.agg(graft.functions.hll_estimate(col("h"))).as[Long].head()
      val ref = refEstimate(hs)
      assert(merged == ref, s"seed $seed: merged $merged != reference $ref")
      assert(direct == ref, s"seed $seed: aggregate $direct != reference $ref")
    }
  }
}
