package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.operators.Split

/** Deterministic hash-split utility (train/test + k-fold). */
class SplitSpec extends AnyFunSuite with SparkFixture with Matchers {

  private def docs = T.t(spark, sf001, "documents")

  test("split is disjoint, complete, and roughly the requested fraction") {
    val (train, test) = Split.byHash(docs, col("doc_id"), 0.2)
    val n = docs.count()
    val nTrain = train.count()
    val nTest = test.count()
    nTrain + nTest shouldBe n
    train.select("doc_id").intersect(test.select("doc_id")).count() shouldBe 0L
    nTest.toDouble / n shouldBe 0.2 +- 0.06
  }

  test("assignment is stable across runs and repartitioning") {
    val (_, test1) = Split.byHash(docs, col("doc_id"), 0.2)
    val (_, test2) = Split.byHash(docs.repartition(7), col("doc_id"), 0.2)
    val ids1 = test1.select("doc_id").collect().map(_.getLong(0)).sorted
    val ids2 = test2.select("doc_id").collect().map(_.getLong(0)).sorted
    ids1 shouldBe ids2
  }

  test("rows sharing a key land on the same side (no leakage)") {
    // key on text content: exact-duplicate docs must not straddle the split
    val (train, test) = Split.byHash(docs, col("text"), 0.3)
    val trainTexts = train.select("text").distinct()
    trainTexts.intersect(test.select("text").distinct()).count() shouldBe 0L
  }

  test("k-fold assignment covers all folds and is key-deterministic") {
    val folded = docs.withColumn("fold", Split.fold(col("doc_id"), 5))
    val dist = folded.groupBy("fold").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    dist.keySet shouldBe Set(0L, 1L, 2L, 3L, 4L)
    // no fold wildly over/under-represented on 500 docs
    dist.values.foreach(_.toDouble should be(100.0 +- 45.0))
    val again = docs.withColumn("fold", Split.fold(col("doc_id"), 5))
    again.collect() shouldBe folded.collect()
  }

  test("null keys are not dropped and land in the fixed bucket-0 side") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, null), (3L, "c"), (4L, null)).toDF("id", "key")
    val (train, test) = Split.byHash(df, col("key"), 0.5)
    train.count() + test.count() shouldBe 4L
    // bucket 0 < cut for any testFrac > 0 → nulls are always test-side,
    // regardless of seed
    Seq(1, 42, 7777).foreach { seed =>
      val (_, t) = Split.byHash(df, col("key"), 0.5, seed)
      t.filter(col("key").isNull).count() shouldBe 2L
    }
  }

  test("stratified hash sample: per-stratum rates, stable, subset-monotone") {
    val fr = Map("en" -> 0.5, "es" -> 0.1)
    val s = Split.sampleByHash(docs, col("doc_id"), col("lang"), fr)
    val by = s.groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tot = docs.groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // only listed strata survive (defaultFrac = 0), at ≈ their fractions
    by.keySet.subsetOf(fr.keySet) shouldBe true
    fr.foreach { case (l, f) =>
      by.getOrElse(l, 0L).toDouble / tot(l) shouldBe f +- 0.12
    }
    // stable across repartitioning (pure function of key+seed)
    val s2 = Split.sampleByHash(docs.repartition(7), col("doc_id"), col("lang"), fr)
    s2.select("doc_id").collect().map(_.getLong(0)).sorted shouldBe
      s.select("doc_id").collect().map(_.getLong(0)).sorted
    // lowering a fraction yields a SUBSET (hash membership is monotone in
    // the cut — the property that makes downsampling reproducible and
    // incrementally adjustable)
    val smaller = Split.sampleByHash(docs, col("doc_id"), col("lang"), Map("en" -> 0.25))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val enIds = s.where(col("lang") === "en")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    smaller.subsetOf(enIds) shouldBe true
    // null keys are dropped, never kept at 100% via the bucket-0 rule
    val withNulls = docs.withColumn("k",
      when(col("doc_id") % 2 === 0, col("doc_id")))
    Split.sampleByHash(withNulls, col("k"), col("lang"), Map("en" -> 1.0))
      .filter(col("k").isNull).count() shouldBe 0L
    // a NULL STRATUM matches no listed stratum → samples at defaultFrac:
    // dropped under the default 0.0, fully kept under defaultFrac = 1.0
    val nullStrata = docs.withColumn("ls",
      when(col("doc_id") % 2 === 0, col("lang")))
    val nNullStratum = nullStrata.filter(col("ls").isNull).count()
    Split.sampleByHash(nullStrata, col("doc_id"), col("ls"), fr)
      .filter(col("ls").isNull).count() shouldBe 0L
    Split.sampleByHash(nullStrata, col("doc_id"), col("ls"), fr, defaultFrac = 1.0)
      .filter(col("ls").isNull).count() shouldBe nNullStratum
  }

  test("portable md5 split: fraction, determinism, monotone cuts, null drop") {
    import spark.implicits._
    val n = docs.count()
    // ~25% of keys pass the 0.25 cut
    val kept = docs.where(Split.portableKeep(col("doc_id"), 0.25))
    kept.count().toDouble / n shouldBe 0.25 +- 0.08
    // assignment is a pure key function: stable under repartitioning
    val again = docs.repartition(7).where(Split.portableKeep(col("doc_id"), 0.25))
    again.select("doc_id").collect().map(_.getLong(0)).sorted shouldBe
      kept.select("doc_id").collect().map(_.getLong(0)).sorted
    // monotone: a smaller fraction keeps a subset
    val smaller = docs.where(Split.portableKeep(col("doc_id"), 0.1))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    smaller.subsetOf(kept.select("doc_id").collect().map(_.getLong(0)).toSet) shouldBe true
    // the bucket prefix matches a from-first-principles md5 (the property
    // that makes the split auditable outside Spark — and oracle-able)
    val row = docs.select(col("doc_id"), Split.portableBucket(col("doc_id")).as("hb"))
      .orderBy("doc_id").head()
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(row.getLong(0).toString.getBytes("UTF-8"))
    f"${md(0) & 0xff}%02x" shouldBe row.getString(1)
    // boundary fractions and null keys
    val withNull = Seq(Some(1L), None, Some(3L)).toDF("k")
    withNull.where(Split.portableKeep(col("k"), 1.0)).count() shouldBe 2L
    withNull.where(Split.portableKeep(col("k"), 0.0)).count() shouldBe 0L
    // portable split is narrow too: pure predicate, no exchange
    kept.queryExecution.executedPlan.toString should not include "Exchange"
  }

  test("split plan is narrow: no exchange") {
    val (train, _) = Split.byHash(docs, col("doc_id"), 0.2)
    val plan = train.queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }

  test("weighted keep: exact md5 membership, monotone in weight, boundaries") {
    import spark.implicits._
    val rows = (1L to 2000L).map(k => (k, (k % 50 + 1).toDouble)).toDF("k", "w")
    val kept = rows.where(Split.keepWeighted(col("k"), col("w"), 50.0))
      .select("k").collect().map(_.getLong(0)).toSet
    // exact driver-side md5 recompute of the acceptance rule
    val md = java.security.MessageDigest.getInstance("MD5")
    (1L to 2000L).foreach { k =>
      val w = (k % 50 + 1).toDouble
      val cut = math.ceil(w * 256.0 / 50.0).toInt
      val hb = f"${md.digest(k.toString.getBytes("UTF-8"))(0) & 0xff}%02x"
      val want = cut >= 256 || hb < f"$cut%02x"
      kept.contains(k) shouldBe want
    }
    // subset-monotone: every key kept at weight w is kept at any w' >= w
    val low = rows.where(Split.keepWeighted(col("k"), col("w"), 100.0))
      .select("k").collect().map(_.getLong(0)).toSet
    low.subsetOf(kept) shouldBe true
    // boundaries: max weight keeps everything, non-positive drops, null drops
    rows.where(Split.keepWeighted(col("k"), lit(50.0), 50.0)).count() shouldBe 2000L
    rows.where(Split.keepWeighted(col("k"), lit(0.0), 50.0)).count() shouldBe 0L
    Seq[Option[Long]](Some(1L), None).toDF("k")
      .where(Split.keepWeighted(col("k"), lit(50.0), 50.0)).count() shouldBe 1L
    // narrow plan: pure predicate
    rows.where(Split.keepWeighted(col("k"), col("w"), 50.0))
      .queryExecution.executedPlan.toString should not include "Exchange"
  }
}
