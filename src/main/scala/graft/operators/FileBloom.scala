package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-file BLOOM-FILTER sidecars for the manifest protocol (round 15) —
  * the point-lookup half of file skipping, complementing `_stats.tsv`
  * min/max ranges: on an UNSORTED high-cardinality column every file's
  * [min, max] spans the whole domain and range stats prune NOTHING, while
  * a per-file bloom filter answers "could this file contain key = v?" in
  * O(k) bit probes — the Delta/Iceberg bloom-index feature, here at FILE
  * granularity (skip opening the file at all), one level above parquet's
  * own row-group blooms.
  *
  * Build is fully distributed and scale-safe: one pass over the batch
  * grouped by physical file; the per-(file, column) bitmap accumulates in
  * a typed [[Aggregator]] (fixed `mBits/8` bytes of state per group —
  * never a collected value set), and only the finished bitmaps (m/8 bytes
  * per file-column) cross to the driver for the sidecar write. Membership
  * hashes ride Spark's own `xxhash64` over the NATIVE column type; the
  * k probe positions derive from one hash by Kirsch–Mitzenmacher double
  * hashing (h + i·h2 mod m, h2 odd — *Less Hashing, Same Performance*,
  * ESA 2006). The prune side re-computes the predicate value's hash with
  * the same `xxhash64` expression, cast to the RECORDED column type so
  * the bytes hashed match the build exactly.
  *
  * Contract mirrors the stats sidecar: written before the manifest CAS
  * (a crash window degrades readers to keep-all, never wrong rows),
  * immutable beside its files, inherited by referencing manifests,
  * vacuumed with the batch; pruning is a SUPERSET guarantee (false
  * positives keep a file; false negatives are impossible), the residual
  * row filter is the semantics.
  */
object FileBloom {

  private[operators] val BloomName = "_bloom.tsv"

  /** k probe positions for hash `h` in an m-bit filter. */
  private def positions(h: Long, mBits: Int, k: Int): Array[Int] = {
    val h2 = java.lang.Long.rotateLeft(h, 31) | 1L
    Array.tabulate(k)(i =>
      java.lang.Math.floorMod(h + i.toLong * h2, mBits.toLong).toInt)
  }

  private[operators] def mightContain(bits: Array[Byte], mBits: Int, k: Int,
      h: Long): Boolean =
    positions(h, mBits, k).forall(p => (bits(p >> 3) & (1 << (p & 7))) != 0)

  /** Distributed per-group bloom build: input = xxhash64 of the value,
    * state = the fixed-size bitmap. */
  private class BloomAgg(mBits: Int, k: Int)
      extends Aggregator[Long, Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = Array.ofDim[Byte](mBits / 8)
    override def reduce(b: Array[Byte], h: Long): Array[Byte] = {
      val ps = positions(h, mBits, k)
      var i = 0
      while (i < ps.length) {
        val p = ps(i)
        b(p >> 3) = (b(p >> 3) | (1 << (p & 7))).toByte
        i += 1
      }
      b
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
      a
    }
    override def finish(r: Array[Byte]): Array[Byte] = r
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Build + write the `_bloom.tsv` sidecar for the batch at
    * `dir/dataRel`. One distributed scan PER COLUMN (the per-column
    * null filter keeps null rows out of the filter without polluting a
    * shared pass; bloomCols is one or two key columns in practice, and
    * the batch was just written so the re-reads are page-cache-warm);
    * driver state is files × columns bitmaps. */
  private[operators] def write(spark: SparkSession, fs: FileSystem,
      dir: String, dataRel: String, bloomCols: Seq[String], mBits: Int,
      k: Int): Unit = {
    require(mBits > 0 && mBits % 8 == 0, s"mBits must be a multiple of 8")
    require(k >= 1, "k must be >= 1")
    val bdf = spark.read.parquet(s"$dir/$dataRel")
    val fields = bdf.schema.fields.map(f => f.name -> f.dataType).toMap
    val cols = bloomCols.distinct
    cols.foreach(c => require(fields.contains(c),
      s"bloomCols column $c not in batch schema ${fields.keys.toSeq.sorted}"))
    val agg = udaf(new BloomAgg(mBits, k))
    val b64 = java.util.Base64.getEncoder
    val lines = cols.flatMap { c =>
      bdf.where(col(c).isNotNull)
        .select(input_file_name().as("f"), xxhash64(col(c)).as("h"))
        .groupBy("f").agg(agg(col("h")).as("bits"))
        .collect()
        .map { r =>
          val base = r.getAs[String]("f").split('/').last
          val bits = b64.encodeToString(r.getAs[Array[Byte]]("bits"))
          s"$base\t$c\t${fields(c).typeName}\t$mBits\t$k\t$bits"
        }
    }
    if (lines.nonEmpty) {
      val out = fs.create(new Path(s"$dir/$dataRel/$BloomName"), true)
      try out.write((lines.mkString("\n") + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
  }

  /** Sidecar entries for `files` (manifest-relative or absolute — clone
    * entries resolve to the SOURCE batch dir): file -> col ->
    * (typeName, mBits, k, bits). Batches without a sidecar simply have no
    * entries — their files are never bloom-pruned. */
  private[operators] def forFiles(fs: FileSystem, dir: String,
      files: Seq[String], resolve: (String, String) => String)
      : Map[String, Map[String, (String, Int, Int, Array[Byte])]] = {
    val dec = java.util.Base64.getDecoder
    val batches = files.map(_.split('/').dropRight(1).mkString("/")).distinct
    batches.flatMap { b =>
      val p = new Path(s"${resolve(dir, b)}/$BloomName")
      if (!fs.exists(p)) Nil
      else {
        val in = fs.open(p)
        val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().map(_.trim).filter(_.nonEmpty).toList finally in.close()
        lines.flatMap(_.split('\t') match {
          case Array(f, c, tn, m, kk, bits) =>
            Some((s"$b/$f", c, (tn, m.toInt, kk.toInt, dec.decode(bits))))
          case _ => None
        })
      }
    }.groupBy(_._1).map { case (f, es) =>
      f -> es.map(e => e._2 -> e._3).toMap }
  }

  /** The predicate value's hash AS THE COLUMN TYPE — one tiny local job
    * through the public xxhash64 expression, so build and probe hash the
    * exact same bytes. None when the value cannot cast to the recorded
    * type (unknowable -> caller keeps the file). */
  private[operators] def hashOf(spark: SparkSession, typeName: String,
      v: Any): Option[Long] =
    try {
      val r = spark.range(1)
        .select(xxhash64(lit(v).cast(typeName)).as("h")).head()
      if (r.isNullAt(0)) None else Some(r.getLong(0))
    } catch { case _: org.apache.spark.sql.AnalysisException => None }
}
