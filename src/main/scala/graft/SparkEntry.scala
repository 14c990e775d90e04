package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Aggregates, Caim, Events, Graph, Llm, Media, Relational, Scalars, Sources, Stats, Streams, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` exposes one entry per implemented operator from SURVEY.md §2;
  * `oracleSql` carries the DuckDB-dialect equivalent for every declared
  * (hash-checked) query. Capability rows (approx sketches, LSH, top-k with
  * float-rank ties) appear in `queries` only — the driver records a
  * rows-only check for those, and the ScalaTest suite validates them.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("agg_group")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Aggregates.queries ++ Scalars.queries ++
      Caim.queries ++ Llm.queries ++ Streams.queries ++ TextAnalysis.queries ++
      Sources.queries ++ Media.queries ++ Events.queries ++ Graph.queries ++
      Stats.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Aggregates.oracle ++ Scalars.oracle ++
      Caim.oracle ++ Llm.oracle ++ Streams.oracle ++ TextAnalysis.oracle ++
      Sources.oracle ++ Media.oracle ++ Events.oracle ++ Graph.oracle ++
      Stats.oracle
}
