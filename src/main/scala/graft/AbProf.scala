package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (r19): interleaved A/B timing of two frame builders in ONE
  * JVM — the only honest way to compare aggregate implementations on this
  * box, whose ambient speed drifts ±15% across minutes. Usage:
  * runMain graft.AbProf <sfDir> <reps> <case>
  * Cases are hard-coded experiment pairs; output is per-rep seconds for
  * A and B alternating, so load transients hit both sides equally.
  */
object AbProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val which = args(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32m")
      .config("spark.sql.files.minPartitionNum", (2 * cpus.toInt).toString)
      .config("spark.sql.files.openCostInBytes", "131072")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.warmup(spark, sfDir)

    def cents(s: SparkSession) = T.t(s, sfDir, "orders")
      .select(col("o_orderpriority"),
        expr("CAST(rint(o_totalprice * 100) AS BIGINT)").as("c"))

    // mcdf staging A/B: build the CDC fixture into a FRESH dir per rep,
    // sequential deleteWhere+upsertMor vs the fused one-scan op; the
    // returned frame is the head read (forces nothing heavy)
    def stageMcdf(fused: Boolean): DataFrame = {
      import graft.operators.ManifestTable
      val dir = s"${sys.props("java.io.tmpdir")}/graft_abmcdf_" +
        java.util.UUID.randomUUID().toString.take(8)
      val e = T.t(spark, sfDir, "events")
      (0 to 1).foreach(r => ManifestTable.commit(spark, dir,
        e.filter(pmod(col("event_id"), lit(2)) === r)))
      val upd = e.filter(col("event_type") === "purchase")
        .withColumn("value",
          expr("CAST(CAST(value AS DECIMAL(18,2)) + 100.00 AS DOUBLE)"))
      val ins = e.filter(col("event_type") === "view" &&
          pmod(col("event_id"), lit(50)) === 0)
        .withColumn("event_id", col("event_id") + lit(1000000000L))
        .withColumn("event_type", lit("backfill"))
      if (fused)
        ManifestTable.deleteThenUpsertMor(spark, dir,
          col("event_type") === "click", upd.unionByName(ins), Seq("event_id"))
      else {
        ManifestTable.deleteWhere(spark, dir, col("event_type") === "click")
        ManifestTable.upsertMor(spark, dir, upd.unionByName(ins), Seq("event_id"))
      }
      spark.range(1).toDF("x")
    }
    // driver-side microbench of the D2U slow path (r19): the shipped
    // integer-rounding conversion vs the former BigDecimal chain, over
    // the same slow-path-heavy product values agg_group's
    // sum_disc/sum_charge convert per row
    def d2uMicro(useBigDecimal: Boolean): DataFrame = {
      val rnd = new java.util.Random(11)
      val xs = Array.fill(2000000)(
        (rnd.nextDouble() * 1e6) * (1.0 - rnd.nextDouble() * 0.1))
      var acc = 0L
      var i = 0
      while (i < xs.length) {
        acc += (if (useBigDecimal)
          java.math.BigDecimal.valueOf(xs(i))
            .setScale(4, java.math.RoundingMode.HALF_UP)
            .unscaledValue().longValueExact()
        else graft.functions.D2U.unscaled(xs(i), 4))
        i += 1
      }
      if (acc == 42L) println("") // keep the loop observable
      spark.range(1).toDF("x")
    }
    val cases: Map[String, (String, () => DataFrame, String, () => DataFrame)] = Map(
      "d2u_micro" -> ((
        "bigdecimal_chain", () => d2uMicro(useBigDecimal = true),
        "integer_rounding", () => d2uMicro(useBigDecimal = false))),
      "mcdf_staging" -> ((
        "sequential", () => stageMcdf(fused = false),
        "fused", () => stageMcdf(fused = true))),
      "ttest_sums" -> ((
        "builtin_dec38",
        () => cents(spark).groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum(col("c").cast("decimal(38,0)")).as("sv"),
            sum((col("c") * col("c")).cast("decimal(38,0)")).as("sq")),
        "dsumd_128",
        () => cents(spark).groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            T.dsumDec(col("c").cast("decimal(18,0)")).as("sv"),
            T.dsumDec((col("c") * col("c")).cast("decimal(18,0)")).as("sq"))))
    )
    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.mode("overwrite").format("noop").save()
      spark.sharedState.cacheManager.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    val (na, fa, nb, fb): (String, () => DataFrame, String, () => DataFrame) =
      if (which == "conf") {
        // conf A/B over a declared query: runMain graft.AbProf <sf> <reps>
        // conf <query> <confKey> <valueA> <valueB> — each timed run
        // rebuilds the frame under the alternated session conf
        val (q, key, va, vb) = (args(3), args(4), args(5), args(6))
        val fn = SparkEntry.queries(q)
        (s"$key=$va",
          () => { spark.conf.set(key, va); fn(spark, sfDir) },
          s"$key=$vb",
          () => { spark.conf.set(key, vb); fn(spark, sfDir) })
      } else cases(which)
    // warm both plans once (codegen compile outside the timed reps)
    time(fa); time(fb)
    val as = Array.newBuilder[Double]; val bs = Array.newBuilder[Double]
    (1 to reps).foreach { _ => as += time(fa); bs += time(fb) }
    def fmt(v: Array[Double]) = v.map(x => f"$x%.3f").mkString(" ")
    println(s"[ab] $which A=$na: ${fmt(as.result())}")
    println(s"[ab] $which B=$nb: ${fmt(bs.result())}")
    spark.stop()
  }
}
