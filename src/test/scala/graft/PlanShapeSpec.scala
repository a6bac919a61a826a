package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions: the optimizations the engine relies on at scale
  * must actually appear in the physical plans — filter/column pushdown to
  * the parquet scan, broadcast joins for dimension tables, no cartesian
  * products where a hash join belongs. */
class PlanShapeSpec extends AnyFunSuite {

  private lazy val spark = Spark.session(master = "local[4]", shufflePartitions = 4,
    appName = "graft-plan-test")
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q1: shipdate filter and column pruning reach the parquet scan") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    // only the referenced columns are read (no l_orderkey/l_partkey/...)
    assert(p.contains("ReadSchema"), p)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_partkey"), readSchema)
    assert(readSchema.contains("l_shipdate"), readSchema)
  }

  test("q5: dimension tables join via broadcast, fact side never broadcast") {
    val p = plan("q5_multi_join")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.toLowerCase.contains("cartesianproduct"), p)
  }

  test("t4: doc_id pushdown on documents") {
    val p = plan("t4_fingerprint")
    assert(p.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,200)]"), p)
  }

  test("v1: scoring runs inside whole-stage codegen with broadcast queries") {
    val p = plan("v1_cosine_topk")
    assert(p.contains("vector_dot"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }
}
