package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sampled-source betweenness at composed-corpus scale (dev tool, the
  * AnnSweep pattern): the declared graph_betweenness query rides the
  * 25-node trade graph, which never scales — this sweep drives the
  * DISTRIBUTED branch of [[graft.operators.Betweenness]] over the real
  * co-occurrence census graph (millions of edges at the 100× corpus)
  * with a K-node uniform source sample (Brandes & Pich 2007), unit hop
  * costs, measuring what the 100 TB deployment shape actually costs:
  * every stage keyed by the sampled s, composite frames
  * |sources|·|reachable|.
  *
  * Usage: runMain graft.GraphSweep <sfDir> [sources=16] [rounds=3]
  */
object GraphSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val k = if (args.length > 1) args(1).toInt else 16
    val rounds = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = T.t(spark, sfDir, "events")
    val (edges, m) = graft.operators.Triangles.cooccurEdges(ev)
    val e = edges.select(col("u1").as("src"), col("u2").as("dst"))
      .unionByName(edges.select(col("u2").as("src"), col("u1").as("dst")))
      .withColumn("cost", lit(1L))
    val nodes = edges.select(col("u1").as("node"))
      .unionByName(edges.select(col("u2").as("node"))).distinct()
    val nNodes = nodes.count()
    // deterministic uniform-ish sample: lowest k ids of an md5 ordering
    val sources = nodes
      .orderBy(md5(col("node").cast("string")), col("node")).limit(k)
    val t0 = System.nanoTime()
    val bc = graft.operators.Betweenness.run(nodes, e, rounds,
      distributedMinEdges = 0L, sources = sources).persist()
    bc.write.mode("overwrite").format("noop").save()
    val sec = (System.nanoTime() - t0) / 1e9
    val nonZero = bc.where(col("betweenness") > 0).count()
    bc.unpersist()
    println(f"[graphsweep] sf=${new java.io.File(sfDir).getName} " +
      f"nodes=$nNodes edges=$m sources=$k rounds=$rounds " +
      f"sec=$sec%.1f nonzero_bc=$nonZero")
    spark.stop()
  }
}
