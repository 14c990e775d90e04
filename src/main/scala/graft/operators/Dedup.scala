package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Survivor materialization — the end product of a dedup pipeline: given
  * the corpus and the (id, cluster) map from [[Components.connected]],
  * keep every unclustered row plus each cluster's representative. The
  * representative needs no extra aggregation: hash-min labels each cluster
  * with its smallest member id, so the representative is exactly the row
  * whose own id equals its cluster label.
  *
  * Scale posture: one left equi-join of the corpus against the (tiny
  * relative to corpus) cluster map plus a narrow filter — no shuffle
  * beyond the join's, no window, no driver involvement. The cluster map is
  * corpus-dependent, so no broadcast hint: size-based planning/AQE choose.
  */
object Dedup {

  /** @param docs     corpus table
    * @param clusters (id, cluster) pairs — only clustered ids appear
    * @param idCol    corpus id column matching `clusters.id`
    * @return the deduplicated corpus: unclustered rows + one
    *         representative (min id) per cluster, original schema
    */
  def survivors(docs: DataFrame, clusters: DataFrame, idCol: String = "doc_id"): DataFrame = {
    // collision-proof internal name: a corpus carrying its own "cluster"
    // column must survive untouched (no ambiguous-reference failure)
    val c = "__graft_cluster"
    docs.join(clusters.select(col("id").as(idCol), col("cluster").as(c)), Seq(idCol), "left")
      .where(col(c).isNull || col(c) === col(idCol))
      .drop(c)
  }
}
