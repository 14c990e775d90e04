package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k-nearest-neighbour majority-vote classification over an embedding
  * table — the composition of the similarity-search operators (SURVEY.md
  * §2.10: `sim_topk` + `topk_per_group` + `agg_group`, no new semantics).
  *
  * Exact brute-force: for bulk classification at 100 TB swap the all-pairs
  * join for the IVF candidate generation of `sim_ann_ivf` — the vote/argmax
  * tail of the pipeline is unchanged.
  */
object Knn {

  /** @param emb (vec_id: long, embedding: array, label) table
    * @return (vec_id, pred, votes) — majority label among the k nearest
    *         neighbours by cosine; ties break to the smaller label.
    */
  def classify(emb: DataFrame, k: Int = 5): DataFrame = {
    val v = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("e"),
        col("label"))
      .withColumn("nrm", sqrt(expr("graft_dot(e, e)")))
    val a = v.select(col("vec_id").as("a_id"), col("e").as("ea"), col("nrm").as("na"))
    val b = v.select(col("vec_id").as("b_id"), col("e").as("eb"), col("nrm").as("nb"),
      col("label").as("b_label"))
    val wk = Window.partitionBy("a_id").orderBy(col("sim").desc, col("b_id").asc)
    val neighbours = a.join(b, col("a_id") =!= col("b_id"))
      .withColumn("sim", expr("graft_dot(ea, eb)") / (col("na") * col("nb")))
      .withColumn("rn", row_number().over(wk))
      .where(col("rn") <= k)
      .select(col("a_id"), col("b_label"))
    val wv = Window.partitionBy("a_id").orderBy(col("votes").desc, col("b_label").asc)
    neighbours.groupBy("a_id", "b_label").agg(count(lit(1)).as("votes"))
      .withColumn("rk", row_number().over(wv))
      .where(col("rk") === 1)
      .select(col("a_id").as("vec_id"), col("b_label").as("pred"), col("votes"))
      .orderBy("vec_id")
  }
}
