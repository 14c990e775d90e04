package graft

import org.apache.spark.sql.functions._

/** ANN scaling sweep (round 14, r13 verdict item 2) — dev tool: measures
  * the IVF / IVF-PQ approximate-neighbour tier at composed corpus scales
  * (sf0.1 → 10× → 100× via tools/scale10.py, which now composes jittered
  * unit-norm embedding replicas), reporting wall time (noop-forced, the
  * honest contract) and RECALL against an exact brute-force ground truth
  * over a ~200-query deterministic sample — at 100× a full brute ground
  * truth is the quadratic non-starter the ANN tier exists to avoid, and a
  * sampled one is exactly how published ANN benchmarks (e.g. the
  * ann-benchmarks protocol) measure recall.
  *
  * Sizing under test: nCells = max(16, ⌈√n⌉) — the standard IVF heuristic
  * (cells ≈ √n balances cell-scan cost n/nCells per probe against probe
  * count) — with an nprobe sweep {4, 8, 16}. The fitted exponents and the
  * derived nprobe sizing rule land in PLANS.md; RecallSpec asserts the
  * floor at the composed corpus when present.
  *
  * Usage: `sbt "runMain graft.AnnSweep <sfDir> [ops]"` — ops default
  * "brute,ivf,ivfpq".
  */
object AnnSweep {

  /** Exact (a_id, b_id) top-k pairs for the deterministic query sample
    * `vec_id % step == 0` — sample × corpus via the codegen'd graft_dot
    * inside map tasks (the broadcast keeps it ONE scan of the corpus:
    * |sample| × n dots, linear in n — the sampled-ground-truth protocol
    * published ANN benchmarks use, because a full brute truth is the
    * quadratic non-starter the ANN tier exists to avoid). Shared with
    * RecallSpec's composed-corpus floor. */
  private[graft] def sampledExactTopK(emb: org.apache.spark.sql.DataFrame,
      k: Int, step: Long): org.apache.spark.sql.DataFrame = {
    val v = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("e"))
      .withColumn("nrm", sqrt(expr("graft_dot(e, e)")))
    val sampleQ = v.where(col("vec_id") % step === 0)
      .select(col("vec_id").as("a_id"), col("e").as("ea"),
        col("nrm").as("na"))
    graft.ml.Sim.topKHits(
      v.select(col("vec_id").as("b_id"), col("e").as("eb"),
          col("nrm").as("nb"))
        .join(broadcast(sampleQ), col("a_id") =!= col("b_id"))
        .withColumn("sim",
          expr("graft_dot(ea, eb)") / (col("na") * col("nb"))),
      k).select("a_id", "b_id")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ops = args.drop(1).headOption.getOrElse("brute,ivf,ivfpq")
      .split(",").toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.warmup(spark, dir)

    val emb = graft.T.t(spark, dir, "embeddings")
    val n = emb.count()
    val nCells = math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)
    val k = 5
    // deterministic ~200-query sample
    val step = math.max(1L, n / 200L)
    def r2(v: Double) = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)

    val t0 = System.nanoTime()
    val exact = sampledExactTopK(emb, k, step).persist()
    val nExact = exact.count()
    val bruteSec = (System.nanoTime() - t0) / 1e9
    val nQ = nExact / k
    if (ops("brute"))
      println(s"[annsweep] dir=$dir n=$n op=brute_sampled queries=$nQ " +
        s"sec=${r2(bruteSec)}")

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def recallOf(approx: org.apache.spark.sql.DataFrame): Double = {
      val hit = approx.select("a_id", "b_id")
        .join(exact, Seq("a_id", "b_id")).count()
      hit.toDouble / nExact
    }

    if (ops("ivf")) Seq(4, 8, 16).foreach { np =>
      val t1 = System.nanoTime()
      force(graft.ml.Sim.ivfTopK(emb, k, nCells = nCells, nprobe = np,
        nRows = n))
      val sec = (System.nanoTime() - t1) / 1e9
      val rec = recallOf(graft.ml.Sim.ivfTopK(emb, k, nCells = nCells,
        nprobe = np, nRows = n).where(col("a_id") % step === 0))
      println(s"[annsweep] dir=$dir n=$n op=ivf nCells=$nCells nprobe=$np " +
        s"sec=${r2(sec)} recall=${r2(rec)}")
    }

    // refine sweep: on a near-duplicate-heavy corpus the ADC shortlist
    // must cover the local duplicate multiplicity (quantization error >
    // the sibling margin), so recall is a function of k·refine vs the
    // duplicate-cluster size — the sizing rule PLANS.md documents
    if (ops("ivfpq")) Seq(4, 16, 32).foreach { rf =>
      val t1 = System.nanoTime()
      force(graft.ml.Sim.ivfpqTopK(emb, k, nCells = nCells, nprobe = 8,
        m = 8, refine = rf))
      val sec = (System.nanoTime() - t1) / 1e9
      val rec = recallOf(graft.ml.Sim.ivfpqTopK(emb, k, nCells = nCells,
        nprobe = 8, m = 8, refine = rf).where(col("a_id") % step === 0))
      println(s"[annsweep] dir=$dir n=$n op=ivfpq nCells=$nCells " +
        s"nprobe=8 m=8 refine=$rf sec=${r2(sec)} recall=${r2(rec)}")
    }
    spark.stop()
  }
}
