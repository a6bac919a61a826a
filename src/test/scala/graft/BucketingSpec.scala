package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Bucketing = the pre-shuffle: both sides of a recurring equi-join are
  * written hash-partitioned (and sorted) by the join key, so the join
  * plans as a sort-merge with NO exchange on either side. At 100 TB this
  * is the difference between re-shuffling the fact table on every query
  * and shuffling it once at ingest (SURVEY.md scale rule: "co-locate
  * joins via bucketing or pre-partitioning").
  */
class BucketingSpec extends AnyFunSuite {

  private lazy val spark = Spark.session(master = "local[4]", shufflePartitions = 4,
    appName = "graft-bucketing-test")
  private val dir = "/root/testdata/sf0.001"

  test("bucketed co-located join: SMJ with zero exchanges, and bucket pruning") {
    Tables.load(spark, dir, "orders")
      .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bkt")
    Tables.load(spark, dir, "customer")
      .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_bkt")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // forbid broadcast so the co-location (not table size) is what
      // eliminates the shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("orders_bkt")
        .join(spark.table("customer_bkt"), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_name"))
      val plan = j.queryExecution.sparkPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan)

      // same rows as the unbucketed join
      val want = Tables.load(spark, dir, "orders")
        .join(Tables.load(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .count()
      assert(j.count() == want)

      // an equality predicate on the bucket column scans one bucket file
      val pruned = spark.table("orders_bkt").filter(col("o_custkey") === 7)
      val scanLine = pruned.queryExecution.sparkPlan.toString
        .linesIterator.find(_.contains("SelectedBucketsCount"))
      assert(scanLine.exists(_.contains("1 out of 8")), scanLine.toString)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }
}
