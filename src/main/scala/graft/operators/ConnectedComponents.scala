package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list —
  * the clustering step of near-duplicate deduplication (each cluster
  * keeps one survivor). Labels every node with its component's minimum
  * node id.
  *
  * Algorithm: min-label propagation with POINTER JUMPING. Each round is
  *   1. propagation — one equi-join + hash aggregate over the edge list:
  *      lbl(v) <- min(lbl(v), min over neighbors u of lbl(u));
  *   2. jump — compose the label map with itself: lbl(v) <- lbl(lbl(v)).
  *      Label values are always node ids (inductively: they start as ids
  *      and every update takes a min over existing label values), so the
  *      map is defined on its own range and the composition is total.
  * Naive propagation needs rounds ~ component diameter; the jump halves
  * the remaining label-to-root distance each round, so convergence is
  * O(log diameter) — the practical difference between a 30-round and a
  * 6-round job on chain-shaped duplicate clusters at 100 TB.
  *
  * Both steps are monotone non-increasing and stay within the component,
  * so the fixpoint argument of plain propagation carries over: when a
  * full round changes nothing, every edge (u,v) has lbl(u) = lbl(v), the
  * label is constant per component, and the minimum node labels itself —
  * i.e. lbl = component min, identical to naive propagation's answer.
  *
  * Lineage discipline: every round ends in a `localCheckpoint` (lazy —
  * the round's changed-count job materializes it, so each round runs
  * exactly one job), so round k+1 plans from a materialized leaf instead
  * of a logical plan that embeds round k's four times over (the jump
  * self-joins the propagation result — under plain `cache()` the LOGICAL
  * plan still grows ~4x per round and analysis cost explodes long before
  * the data does). Checkpointing also scopes memory: the per-round
  * `prop` cache is explicitly unpersisted, the edge cache is released
  * before returning, and each superseded round's checkpoint blocks
  * become unreachable (the next round's plan is a fresh leaf) so Spark's
  * ContextCleaner frees them. No `cache()` this operator takes outlives
  * the call.
  *
  * The only driver-side value per round is the single changed-count
  * scalar (computed from the `prev` label carried through the round —
  * no join back against the previous labels); labels and edges never
  * collect.
  */
object ConnectedComponents {

  /** Label each node with its component-minimum id.
    *
    * @param edges     undirected edges as columns `d1`, `d2`
    * @param maxRounds hard stop (convergence is `require`d, so this only
    *                  bounds a malformed input's runtime)
    * @return (labels as columns `id`, `lbl`; rounds executed)
    */
  def label(edges: DataFrame, maxRounds: Int = 25): (DataFrame, Int) = {
    val e = edges.select(col("d1"), col("d2")).cache()
    val bi = e.union(e.select(col("d2").as("d1"), col("d1").as("d2")))
    var labels = e.select(col("d1").as("id"))
      .union(e.select(col("d2").as("id")))
      .distinct().withColumn("lbl", col("id"))
      .localCheckpoint(true)
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < maxRounds) {
      // 1. neighbor-min propagation (left joins keep isolated-in-this-
      //    direction nodes; least/min both null-skip). The node's own
      //    previous label rides along as `prev` (min over the duplicated
      //    join rows of a per-id-constant value), so the convergence
      //    check below needs no join back against `labels`.
      val prop = labels.as("l")
        .join(bi.as("e"), col("l.id") === col("e.d1"), "left")
        .join(labels.as("nb"), col("e.d2") === col("nb.id"), "left")
        .groupBy(col("l.id").as("id"))
        .agg(least(min(col("l.lbl")), min(col("nb.lbl"))).as("lbl"),
          min(col("l.lbl")).as("prev"))
        .cache() // referenced twice by the jump's self-join
      // 2. pointer jump: lbl <- prop(lbl). Every label value is a node id
      //    (see scaladoc), so the left join always matches; coalesce is
      //    belt-and-braces. The LAZY checkpoint is materialized by the
      //    changed-count job right below — one materialization per round
      //    (an eager checkpoint plus a count would do two), and the next
      //    round still plans from a leaf.
      val next = prop.as("a")
        .join(prop.select(col("id").as("jid"), col("lbl").as("jlbl")).as("j"),
          col("a.lbl") === col("jid"), "left")
        .select(col("a.id").as("id"), coalesce(col("jlbl"), col("a.lbl")).as("lbl"),
          col("a.prev").as("prev"))
        .localCheckpoint(false)
      changed = next.filter(col("lbl") =!= col("prev")).count()
      prop.unpersist()
      labels = next.select(col("id"), col("lbl"))
      rounds += 1
    }
    require(changed == 0, s"label propagation did not converge in $rounds rounds")
    e.unpersist()
    (labels, rounds)
  }
}
