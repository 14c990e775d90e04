package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The shared supervised-discretization histogram (round 11 — extracted
  * verbatim from [[CAIMDiscretizer.fit]] so MDLP and any further
  * discretizer reuse the same distributed contract): ONE distributed
  * aggregation builds, for all features at once, the per-(feature, value,
  * class) count histogram — map-side combined, one shuffle on the
  * compound key. Features whose distinct-value count exceeds
  * `maxCandidates` are first compressed onto a DISTRIBUTED
  * equal-frequency value grid (range-partition + per-slice local ranks +
  * exact global-rank recomposition from per-slice offsets — no
  * per-feature single-task sort; see the round-8 notes inline). Only the
  * compressed histogram (≤ maxCandidates × classes cells per feature)
  * crosses the executor→driver boundary.
  */
private[ml] object SupervisedHistogram {

  /** @return (sorted class labels,
    *          per-feature-index (sorted distinct values, values × classes counts)) */
  def collect(df0: DataFrame, feats: Array[String], labelCol: String,
      maxCandidates: Int): (Array[String], Map[Int, (Array[Double], Array[Array[Long]])]) = {

    // One distributed pass for ALL features: long format (fidx, value, label)
    // with map-side partial counts before the single shuffle.
    val arr = array(feats.map(c => col(c).cast("double")): _*)
    val hist0 = df0
      .select(posexplode(arr).as(Seq("fidx", "v")), col(labelCol).cast("string").as("y"))
      .where(col("v").isNotNull)
      .groupBy("fidx", "v", "y").agg(count(lit(1)).as("cnt"))

    // Candidate compression: features whose distinct-value count exceeds
    // maxCandidates get an equal-frequency value grid (ntile semantics
    // over the DISTINCT values, represented by each bucket's max).
    //
    // DISTRIBUTED equal-frequency (round 8): a plain
    // `ntile().over(Window.partitionBy("fidx").orderBy("v"))` funnels every
    // distinct value of one feature through a single task's sort — at
    // 100 TB a high-cardinality double feature has billions of distinct
    // values, a one-task sort before the compression that exists to avoid
    // exactly that. Instead: range-partition the distinct values on
    // (fidx, v), rank locally per partition, and recompose EXACT global
    // ranks from per-(fidx, partition) row-count offsets (a tiny driver
    // aggregate, ≤ partitions × features rows — the same bounded-collect
    // discipline as the histogram itself). The ntile bucket is then pure
    // arithmetic on (rank, nDistinct): first nd % n buckets get
    // ⌈nd/n⌉ values, the rest ⌊nd/n⌋ — byte-identical to the window
    // ntile, so fitted boundaries are unchanged, but the widest stage is
    // now a per-range-slice sort instead of a per-feature one.
    val nDistinct = hist0.groupBy("fidx").agg(countDistinct(col("v")).as("nd"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val needsCap = nDistinct.exists(_._2 > maxCandidates)
    // the range-partitioned distinct-value frame feeds two jobs (slice
    // counts, then the ranked grid inside the histogram collect below) —
    // persisted across both, freed right after the collect
    var toFree: Option[DataFrame] = None
    val hist =
      if (!needsCap) hist0
      else {
        val parted = hist0.select("fidx", "v").distinct()
          .repartitionByRange(col("fidx"), col("v"))
          .withColumn("pid", spark_partition_id())
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // per-(fidx, pid) counts → cumulative offset of each slice within
        // its feature's global (fidx, v) order
        val sliceCounts = parted.groupBy("fidx", "pid").count().collect()
          .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2))
        val offsets: Map[Long, Long] = sliceCounts.groupBy(_._1._1).flatMap {
          case (f, slices) =>
            var acc = 0L
            slices.sortBy(_._1._2).map { case ((_, p), c) =>
              val o = acc; acc += c; ((f.toLong << 32) | p.toLong, o)
            }
        }
        val offMap = typedLit(offsets)
        val ndMap = typedLit(nDistinct.map { case (f, nd) => (f, nd) })
        val localW = Window.partitionBy("fidx", "pid").orderBy("v")
        val n = maxCandidates.toLong
        val rep = parted
          .withColumn("r", row_number().over(localW).cast("long") +
            element_at(offMap, shiftleft(col("fidx").cast("long"), 32)
              .bitwiseOR(col("pid").cast("long"))))
          .withColumn("nd", element_at(ndMap, col("fidx")))
          .withColumn("b", expr(
            s"""CASE WHEN r <= (nd % $n) * ((nd DIV $n) + 1)
                THEN (r - 1) DIV ((nd DIV $n) + 1) + 1
                ELSE (nd % $n) + (r - 1 - (nd % $n) * ((nd DIV $n) + 1)) DIV (nd DIV $n) + 1
                END"""))
          .withColumn("vrep", max("v").over(Window.partitionBy("fidx", "b")))
          .select("fidx", "v", "vrep")
        toFree = Some(parted)
        hist0.join(rep, Seq("fidx", "v"))
          .groupBy(col("fidx"), col("vrep").as("v"), col("y"))
          .agg(sum("cnt").as("cnt"))
      }

    // Executor→driver boundary: only the compressed histogram crosses.
    val rows = hist.collect()
    toFree.foreach(_.unpersist(blocking = false))
    val labels = rows.map(_.getString(2)).distinct.sorted
    val labelIdx = labels.zipWithIndex.toMap
    val byFeat = rows.groupBy(_.getInt(0)).map { case (fi, mine) =>
      val values = mine.map(_.getDouble(1)).distinct.sorted
      val vIdx = values.zipWithIndex.toMap
      val counts = Array.ofDim[Long](values.length, labels.length)
      mine.foreach { r =>
        counts(vIdx(r.getDouble(1)))(labelIdx(r.getString(2))) += r.getLong(3)
      }
      fi -> (values, counts)
    }
    (labels, byFeat)
  }
}
