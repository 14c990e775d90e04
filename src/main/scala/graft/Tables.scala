package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the query library.
  *
  * Determinism discipline (SURVEY.md §5.4): money-like doubles in the corpus
  * carry <=4 decimal places, so we sum them as exact DECIMAL and cast the
  * exact total back to double — bit-identical to DuckDB's reading of the same
  * arithmetic, independent of partial-aggregation order. Timestamps are
  * always emitted as epoch microseconds (BIGINT) to sidestep parquet
  * timestamp physical-type differences between writers.
  */
object T {
  type Q = (SparkSession, String) => DataFrame

  /** Load one corpus table (TESTDATA.md): `$sf/$name.parquet`.
    *
    * `events.ts` is parquet TIMESTAMP(NANOS) which Spark 4 refuses natively;
    * with `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as a long
    * of epoch nanos, which we truncate to microseconds — the same ns→µs
    * truncation DuckDB applies (SURVEY.md §7 R1).
    */
  def t(s: SparkSession, sf: String, n: String): DataFrame = {
    val df = s.read.parquet(s"$sf/$n.parquet")
    df.schema.fields.find(f => f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType)
      .map(_ => df.withColumn("ts", timestamp_micros(expr("ts div 1000"))))
      .getOrElse(df)
  }

  /** Exact order-independent sum of a fixed-scale double column. */
  def dsum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Exact average: decimal sum over bigint count, one IEEE division. */
  def davg(c: Column, scale: Int): Column =
    dsum(c, scale) / count(lit(1))
}
