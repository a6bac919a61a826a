package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cell-occupancy skew gate for the IVF family (VERDICT r7 #5).
  *
  * Every O(sum cell^2) consumer — v16's kNN self-join, v2/v3/v6's cell
  * routing — relies on the coarse quantizer SPREADING the corpus across
  * cells; the documented scale lever (raise the cell count K) is useless
  * against a degenerate quantizer that swallows the corpus into one cell
  * and turns the pair scan into O(n^2) on a single task. This spec pins
  * the spread at sf0.1: max occupancy within a small factor of the mean,
  * and no single cell owning a majority of the total pair work. The 8x
  * corpus re-measurement lives in `QueryScaleRehearsal ivf` (rehearsals
  * are run manually per PERF_NOTES discipline; this gate runs in CI
  * scale).
  */
class IvfSkewSpec extends AnyFunSuite {

  private lazy val spark = Spark.session(master = "local[4]", shufflePartitions = 4,
    appName = "graft-ivf-skew-test")

  test("IVF assignment occupancy is spread: skew and pair-work share bounded at sf0.1") {
    val e = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
    val h = graft.queries.SimilarityOps.cellHistogram(e)
      .select(org.apache.spark.sql.functions.col("n"))
      .collect().map(_.getLong(0))
    assert(h.length > 1, s"quantizer collapsed to ${h.length} cell(s)")
    val n = h.sum
    val mean = n.toDouble / h.length
    val skew = h.max / mean
    // 3x mean is the alarm threshold a production run would re-seed at;
    // the synthetic labels cluster nearly uniformly (measured ~1.1x)
    assert(skew <= 3.0, s"max cell ${h.max} vs mean $mean (skew $skew)")
    val pairWork = h.map(c => c.toDouble * c).sum
    val maxShare = h.max.toDouble * h.max / pairWork
    assert(maxShare <= 0.5,
      s"one cell owns ${maxShare * 100}%% of pair work (max=${h.max}, n=$n)")
  }

  test("v16 exemplar quantizer occupancy is spread at its derived K (sf0.1)") {
    // v16 no longer rides the label quantizer: K = ceil(n/64) md5-rank
    // exemplars. md5 order is arbitrary, so spread is an empirical claim
    // that needs its own gate — a degenerate Voronoi cell would turn the
    // kNN self-join quadratic regardless of the K formula.
    val e = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
    val n0 = e.count()
    val k = math.max(1, math.ceil(
      n0.toDouble / graft.queries.SimilarityOps.KnnCellTarget).toInt)
    val h = graft.queries.SimilarityOps.knnCellHistogram(e, k)
      .select(org.apache.spark.sql.functions.col("n"))
      .collect().map(_.getLong(0))
    assert(h.length > 1, s"exemplar quantizer collapsed to ${h.length} cell(s)")
    val n = h.sum
    assert(n == n0, s"assignment lost rows: $n vs $n0")
    // Voronoi occupancy over random exemplars is unevener than the
    // near-uniform label clusters; 8x mean is the re-seed alarm here
    val mean = n.toDouble / h.length
    val skew = h.max / mean
    assert(skew <= 8.0, s"max cell ${h.max} vs mean $mean (skew $skew)")
    val pairWork = h.map(c => c.toDouble * c).sum
    val maxShare = h.max.toDouble * h.max / pairWork
    assert(maxShare <= 0.5,
      s"one cell owns ${maxShare * 100}%% of pair work (max=${h.max}, n=$n)")
  }
}
