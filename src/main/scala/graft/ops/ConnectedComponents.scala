package graft.ops

import graft.ops.Ckpt.RichCkpt
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected pair list via iterative
  * min-label propagation — the standard distributed CC recurrence (cf.
  * GraphX's `ConnectedComponents`, label = min reachable vertex id):
  * every node starts labeled with itself; each round every node takes the
  * min of its own and its neighbors' labels; fixpoint = component-wide
  * min id.
  *
  * Scale shape per round: one shuffle joining labels onto the edge key +
  * one min-aggregate shuffle on the node key — no driver-side graph state
  * ever; the only driver action is the convergence count. Rounds are
  * bounded by component DIAMETER (min labels move one hop per round), not
  * component size — LSH duplicate clusters are shallow (the all-identical
  * degenerate corpus is a 2-round star), and termination is guaranteed:
  * labels decrease monotonically over a finite order, so `changed` hits 0.
  * Each round localCheckpoints the label frontier, keeping lineage flat
  * across iterations.
  */
object ConnectedComponents {

  /** Min-reachable-label per node of the undirected graph given as a
    * (src, dst) pair list (either orientation; symmetrized internally).
    * Output: (id, lbl) for every node that appears in `pairs` — callers
    * default absent singletons to their own id.
    */
  def minLabel(pairs: DataFrame): DataFrame = {
    val p = pairs.toDF("src", "dst")
    val edges = p
      .union(p.select(col("dst"), col("src")))
      .ckpt()
    var labels = edges
      .select(col("src").as("id"))
      .distinct()
      .select(col("id"), col("id").as("lbl"))
      .ckpt()
    var changed = 1L
    while (changed > 0L) {
      val nbr = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("nid"))
        .agg(min(col("lbl")).as("nlbl"))
      // carry the previous label through the round: the convergence check
      // is then a filter over the just-checkpointed frame instead of an
      // extra join against the old labels
      val next = labels
        .join(nbr, col("id") === col("nid"), "left")
        .select(
          col("id"),
          col("lbl").as("prev"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl")
        )
        .ckpt()
      changed = next.filter(col("lbl") =!= col("prev")).count()
      labels = next.drop("prev")
    }
    labels
  }
}
