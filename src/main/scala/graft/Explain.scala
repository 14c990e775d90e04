package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for representative queries so
  * plan quality (filter pushdown, column pruning, broadcast selection,
  * whole-stage codegen spans) can be reviewed and regression-checked.
  * Usage: runMain graft.Explain <sfDir> [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    // source_* queries are excluded from the default list: their
    // constructors eagerly WRITE the round-trip files, so a plan-dump run
    // would execute real jobs (pass them explicitly to accept that)
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "agg_group", "filter_pred", "project_select", "join_broadcast",
      "join_inner", "join_asof", "sim_cosine_pairs", "sim_topk",
      "dedup_jaccard", "dedup_minhash", "dedup_simhash", "caim_candidates",
      "disc_equal_freq", "sessionize", "topk_per_group", "sort_limit",
      "join_salted", "stream_join", "knn_classify")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n==================== $n ====================")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
