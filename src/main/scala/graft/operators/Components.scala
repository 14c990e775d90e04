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
    val spark = edges.sparkSession
    val sym = edges.select(col(a).cast("long").as("u"), col(b).cast("long").as("v"))
      .union(edges.select(col(b).cast("long").as("u"), col(a).cast("long").as("v")))
      .distinct()
      .persist()
    // Lineage truncation with explicit block bookkeeping: each round's
    // frame is snapped to a persisted RDD we hold a handle to, so every
    // superseded round is unpersisted when the loop ends — localCheckpoint
    // would strand O(rounds) block sets that neither Dataset.unpersist nor
    // the SQL cache manager can free. Only the FINAL labels (one row per
    // paired vertex) stay pinned for the caller's action.
    var kept: List[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]] = Nil
    def snap(df: DataFrame): DataFrame = {
      val rdd = df.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      kept = rdd :: kept
      spark.createDataFrame(rdd, df.schema)
    }
    var lbl = snap(sym.select(col("u").as("id")).withColumn("lbl", col("id")).distinct())
    var changed = 1L
    while (changed > 0) {
      // every vertex u hears the current label of each neighbour v; ONE
      // action per round (the convergence count) materializes the snap
      val heard = sym
        .join(lbl.select(col("id").as("v"), col("lbl").as("nlbl")), "v")
        .groupBy(col("u").as("id")).agg(min(col("nlbl")).as("nmin"))
      val joined = snap(lbl.join(heard, Seq("id"), "left")
        .select(col("id"), col("lbl"), col("nmin")))
      changed = joined.filter(col("nmin") < col("lbl")).count()
      lbl = joined.select(col("id"),
        least(col("lbl"), coalesce(col("nmin"), col("lbl"))).as("lbl"))
    }
    sym.unpersist()
    kept.drop(1).foreach(_.unpersist(blocking = false)) // all but the final round
    lbl.select(col("id"), col("lbl").as("cluster"))
  }
}
