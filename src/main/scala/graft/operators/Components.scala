package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by minimum-label propagation (the
  * hash-min pattern): each iteration every vertex adopts the smallest
  * label among itself and its neighbours — one equi-join + one aggregation
  * per round, converging in O(component diameter) rounds. This is the
  * transitive-closure step a dedup pipeline needs on top of pairwise
  * near-dup output: pairs (a,b),(b,c) collapse to ONE cluster with one
  * survivor, which per-pair min-id logic cannot do.
  *
  * Scale posture: every round shuffles only (vertex, label) pairs and the
  * edge list on vertex id; `localCheckpoint` truncates lineage so the plan
  * stays flat across iterations. Skewed hub vertices aggregate via
  * map-side partial min.
  */
object Components {

  /** @param edges undirected edge list
    * @return (id, cluster) — cluster = smallest vertex id reachable
    */
  def connected(edges: DataFrame, a: String = "a_id", b: String = "b_id"): DataFrame = {
    val sym = edges.select(col(a).cast("long").as("u"), col(b).cast("long").as("v"))
      .union(edges.select(col(b).cast("long").as("u"), col(a).cast("long").as("v")))
      .distinct()
      .persist()
    var lbl = sym.select(col("u").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      // every vertex u hears the current label of each neighbour v; the
      // joined frame is lazily checkpointed so the ONE action per round
      // (the convergence count) also materializes next round's input
      val heard = sym
        .join(lbl.select(col("id").as("v"), col("lbl").as("nlbl")), "v")
        .groupBy(col("u").as("id")).agg(min(col("nlbl")).as("nmin"))
      val joined = lbl.join(heard, Seq("id"), "left")
        .select(col("id"), col("lbl"), col("nmin"))
        .localCheckpoint(eager = false)
      changed = joined.filter(col("nmin") < col("lbl")).count()
      lbl = joined.select(col("id"),
        least(col("lbl"), coalesce(col("nmin"), col("lbl"))).as("lbl"))
    }
    sym.unpersist()
    lbl.select(col("id"), col("lbl").as("cluster"))
  }
}
