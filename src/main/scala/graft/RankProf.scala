package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool (round 15): GlobalRank two-pass kernel vs the single-partition
  * global window it replaced, on synthetic distinct-value frames of
  * growing size — the measured evidence that the rewired CDF family's
  * plan survives scale (r14 verdict item 1's "parallel Prof point").
  *
  * Usage: runMain graft.RankProf [rows...]  (default 1e6 1e7 5e7)
  * Prints one line per size: kernel seconds, window seconds, and the
  * window stage's task parallelism for each.
  */
object RankProf {
  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args.map(_.toLong).toSeq
      else Seq(1000000L, 10000000L, 50000000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-rankprof")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    try {
      for (n <- sizes) {
        // distinct ordered keys with a small payload — the byV shape the
        // CDF family feeds the kernel
        val df = spark.range(n)
          .select((col("id") * 2654435761L % (n * 4)).as("v"),
            (col("id") % 97 + 1).as("c"))
          .groupBy("v").agg(sum(col("c")).as("c"))
        def time(f: => Long): (Double, Long) = {
          val t0 = System.nanoTime(); val r = f
          ((System.nanoTime() - t0) / 1e9, r)
        }
        val (tk, rk) = time {
          graft.operators.GlobalRank
            .prefix(df, Nil, Seq("v"), Seq("c" -> "cum"), inclusive = true)
            .agg(max(col("cum"))).head().getLong(0)
        }
        val (tw, rw) = time {
          df.withColumn("cum", sum(col("c")).over(Window.orderBy("v")
              .rowsBetween(Window.unboundedPreceding, 0)))
            .agg(max(col("cum"))).head().getLong(0)
        }
        require(rk == rw, s"kernel/window disagree: $rk vs $rw")
        println(f"[rankprof] n=$n%-10d kernel=$tk%7.2fs window=$tw%7.2fs " +
          f"speedup=${tw / tk}%5.2fx (values agree: $rk)")
      }
    } finally spark.stop()
  }
}
