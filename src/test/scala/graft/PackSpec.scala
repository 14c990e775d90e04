package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.operators.Pack

/** Sequence packing: capacity respected, every doc packed once,
  * determinism under input repartitioning, oversize isolation, and a fill
  * bound that makes the operator worth running. */
class PackSpec extends AnyFunSuite with SparkFixture with Matchers {

  private val capacity = 512L

  // expr, not functions.size: scalatest Matchers shadows `size`
  private def lengths = T.t(spark, sf001, "documents")
    .select(col("doc_id"), expr("CAST(size(split(text, ' ')) AS BIGINT)").as("n_toks"))

  test("no bin exceeds capacity; every doc packed exactly once") {
    val packed = Pack.firstFit(lengths, "doc_id", "n_toks", capacity, partitions = 8)
    val perBin = packed.groupBy("bin").agg(sum("n_tokens").as("t"), count(lit(1)).as("d"))
    // corpus docs are all under capacity, so every bin must respect it
    perBin.where(col("t") > capacity).count() shouldBe 0L
    packed.select("doc_id").distinct().count() shouldBe lengths.count()
    packed.count() shouldBe lengths.count()
  }

  test("assignment is deterministic and invariant to input partitioning") {
    val a = Pack.firstFit(lengths, "doc_id", "n_toks", capacity, partitions = 8)
      .collect().sortBy(_._1)
    val b = Pack.firstFit(lengths.repartition(3), "doc_id", "n_toks", capacity,
        partitions = 8)
      .collect().sortBy(_._1)
    a shouldBe b
  }

  test("fill factor is high enough to matter") {
    val packed = Pack.firstFit(lengths, "doc_id", "n_toks", capacity, partitions = 8)
    val (bins, docs, toks, fill) = Pack.fill(packed.toDF(), capacity)
    info(s"bins=$bins docs=$docs tokens=$toks fill=${math.round(fill * 100)}%")
    docs shouldBe 500L
    // per-partition FFD wastes at most ~the last bin of each of the 8
    // partitions on this corpus
    fill should be > 0.7
  }

  test("oversize docs get a bin of their own") {
    import spark.implicits._
    val docs = Seq((1L, 600L), (2L, 100L), (3L, 700L), (4L, 100L))
      .toDF("doc_id", "n_toks")
    val packed = Pack.firstFit(docs, "doc_id", "n_toks", capacity, partitions = 2)
      .collect().map(r => r._1 -> r._3).toMap
    // the two oversize docs may not share a bin with anything
    val binsOf = packed.groupBy(_._2).view.mapValues(_.keys.toSet).toMap
    binsOf(packed(1L)) shouldBe Set(1L)
    binsOf(packed(3L)) shouldBe Set(3L)
  }

  test("fill excludes oversize singleton bins from the ratio") {
    import spark.implicits._
    // two oversize docs (their bins are the chunker's leftovers, not
    // packing waste) + two that pack one bin exactly full: fill must be
    // computed over the non-oversize bins only → exactly 1.0 here, while
    // bins/docs/sum_tokens still count everything
    val docs = Seq((1L, 600L), (2L, 900L), (3L, 300L), (4L, 212L))
      .toDF("doc_id", "n_toks")
    val packed = Pack.firstFit(docs, "doc_id", "n_toks", capacity, partitions = 1)
    val (bins, nDocs, toks, fill) = Pack.fill(packed.toDF(), capacity)
    bins shouldBe 3L
    nDocs shouldBe 4L
    toks shouldBe 2012L
    fill shouldBe 1.0
    // all-oversize packing: no packable waste to measure → fill = 1.0
    val allBig = Seq((1L, 600L), (2L, 900L)).toDF("doc_id", "n_toks")
    Pack.fill(Pack.firstFit(allBig, "doc_id", "n_toks", capacity,
      partitions = 1).toDF(), capacity)._4 shouldBe 1.0
  }

  test("property: invariants hold on random corpora, capacities, partitionings") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    // random doc-length distributions (uniform short, heavy-tailed, with
    // oversize spikes), random capacities and partition counts: capacity
    // respected for non-oversize bins, every doc packed exactly once,
    // oversize docs isolated, assignment deterministic
    val caseGen: Gen[(List[Long], Long, Int)] = for {
      cap <- Gen.choose(16L, 400L)
      n <- Gen.choose(1, 120)
      docs <- Gen.listOfN(n, Gen.frequency(
        7 -> Gen.choose(1L, cap),
        2 -> Gen.choose(1L, math.max(1L, cap / 8)),
        1 -> Gen.choose(cap, cap * 3)))
      parts <- Gen.choose(1, 6)
    } yield (docs, cap, parts)
    val params = Gen.Parameters.default
    var run = 0
    var seedNo = 0L
    while (run < 25 && seedNo < 500) {
      caseGen.apply(params, Seed(seedNo)).foreach { case (docLens, cap, parts) =>
        val df = docLens.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "n_toks")
        val packed = Pack.firstFit(df, "doc_id", "n_toks", cap, partitions = parts)
          .collect()
        withClue(s"seed=$seedNo cap=$cap parts=$parts: ") {
          // exactly once
          packed.map(_._1).sorted shouldBe docLens.indices.map(_.toLong).toArray
          val byBin = packed.groupBy(_._3)
          byBin.values.foreach { bin =>
            val tot = bin.map(_._2).sum
            if (bin.exists(_._2 >= cap)) bin.length shouldBe 1 // oversize isolated
            else tot should be <= cap
          }
          // deterministic under re-partitioned input
          Pack.firstFit(df.repartition(3), "doc_id", "n_toks", cap,
            partitions = parts).collect().sortBy(_._1) shouldBe packed.sortBy(_._1)
        }
        run += 1
      }
      seedNo += 1
    }
    run should be >= 20
  }

  test("null and non-positive lengths are dropped, not packed") {
    import spark.implicits._
    val docs = Seq((1L, Some(10L)), (2L, None), (3L, Some(0L)), (4L, Some(-5L)))
      .toDF("doc_id", "n_toks")
    val packed = Pack.firstFit(docs, "doc_id", "n_toks", capacity, partitions = 2)
    packed.collect().map(_._1) shouldBe Array(1L)
  }
}
