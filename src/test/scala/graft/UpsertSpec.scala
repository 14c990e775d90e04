package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.operators.Upsert

/** MERGE-style upsert (round 9): delta wins on key collision, new keys
  * append, untouched rows survive byte-identical, reapplication is
  * idempotent, and the plan is the anti-join + union shape (never a
  * nested loop; the target side joins the delta's key set only).
  */
class UpsertSpec extends AnyFunSuite with SparkFixture with Matchers {

  private def base = {
    import spark.implicits._
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "name", "bal")
  }

  test("delta rows replace same-key rows and new keys append") {
    import spark.implicits._
    val delta = Seq((2L, "b2", 99.0), (9L, "i", 1.0)).toDF("k", "name", "bal")
    val out = Upsert.merge(base, delta, Seq("k"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    out.keySet shouldBe Set(1L, 2L, 3L, 4L, 9L)
    out(2L) shouldBe ("b2", 99.0) // update wins
    out(9L) shouldBe ("i", 1.0)   // insert appended
    out(1L) shouldBe ("a", 10.0)  // untouched survives
  }

  test("merge is idempotent under delta reapplication") {
    import spark.implicits._
    val delta = Seq((3L, "c9", 7.0)).toDF("k", "name", "bal")
    val once = Upsert.merge(base, delta, Seq("k"))
    val twice = Upsert.merge(once, delta, Seq("k"))
    twice.orderBy("k").collect().toSeq shouldBe once.orderBy("k").collect().toSeq
  }

  test("applyChanges deletes D keys, upserts the rest") {
    import spark.implicits._
    val changes = Seq((1L, "x", 0.0, "D"), (2L, "b2", 99.0, "U"), (9L, "i", 1.0, "I"))
      .toDF("k", "name", "bal", "op")
    val out = Upsert.applyChanges(base, changes, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.keySet shouldBe Set(2L, 3L, 4L, 9L) // 1 deleted, 9 inserted
    out(2L) shouldBe "b2"
  }

  test("plan: target anti-joins the key set, no nested loop, no target-payload shuffle of the delta") {
    import spark.implicits._
    val delta = Seq((2L, "b2", 99.0)).toDF("k", "name", "bal")
    val plan = Upsert.merge(base, delta, Seq("k")).queryExecution.executedPlan.toString
    plan should include("LeftAnti")
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }

  test("scd2: delta closes the current version, appends the new one, history immutable") {
    import spark.implicits._
    // key 1 has a closed v1 and an open v2; key 2 has one open version
    val history = Seq(
      (1L, "v1", 100L, Some(200L)),
      (1L, "v2", 200L, None),
      (2L, "w1", 150L, None)
    ).toDF("k", "payload", "valid_from_us", "valid_to_us")
    val delta = Seq((1L, "v3", 500L)).toDF("k", "payload", "eff_us")
    val out = Upsert.scd2(history, delta, Seq("k"), "eff_us")
    val rows = out.collect().map(r => (r.getLong(0), r.getString(1),
      r.getLong(2), Option(r.getAs[java.lang.Long]("valid_to_us")).map(_.toLong)))
    rows.length shouldBe 4
    // the open v2 closed at the delta's effective ts
    rows should contain ((1L, "v2", 200L, Some(500L)))
    // the new version is open from the effective ts
    rows should contain ((1L, "v3", 500L, None))
    // closed history and untouched keys byte-identical
    rows should contain ((1L, "v1", 100L, Some(200L)))
    rows should contain ((2L, "w1", 150L, None))
    // invariant: at most one open version per key
    out.where(col("valid_to_us").isNull).groupBy("k").count()
      .collect().foreach(_.getLong(1) shouldBe 1L)
    // point-in-time read at t=300 sees v2 for key 1
    val asOf300 = out.where(col("valid_from_us") <= 300L &&
        (col("valid_to_us").isNull || col("valid_to_us") > 300L))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    asOf300 shouldBe Map(1L -> "v2", 2L -> "w1")
  }

  test("scd2 monotone apply: retries and late deltas are no-ops, not corruption") {
    import spark.implicits._
    val history = Seq((1L, "v2", 200L, None: Option[Long]))
      .toDF("k", "payload", "valid_from_us", "valid_to_us")
    val delta = Seq((1L, "v3", 500L)).toDF("k", "payload", "eff_us")
    val once = Upsert.scd2(history, delta, Seq("k"), "eff_us")
    // a job retry re-applies the identical delta: eff == open valid_from
    // is NOT strictly newer, so nothing closes and nothing appends
    val retried = Upsert.scd2(once, delta, Seq("k"), "eff_us")
    retried.orderBy("valid_from_us").collect().toSeq shouldBe
      once.orderBy("valid_from_us").collect().toSeq
    // a late delta older than the open version is ignored — no inverted
    // validity range, no version that was never current
    val late = Seq((1L, "v1-late", 100L)).toDF("k", "payload", "eff_us")
    val afterLate = Upsert.scd2(once, late, Seq("k"), "eff_us")
    afterLate.orderBy("valid_from_us").collect().toSeq shouldBe
      once.orderBy("valid_from_us").collect().toSeq
    // sanity: validity ranges are never inverted
    afterLate.where(col("valid_to_us").isNotNull &&
      col("valid_to_us") <= col("valid_from_us")).count() shouldBe 0L
  }

  test("applyChanges: only a literal D deletes — a NULL op upserts, never silently drops") {
    import spark.implicits._
    val changes = Seq((2L, "b2", 99.0, null.asInstanceOf[String]))
      .toDF("k", "name", "bal", "op")
    val out = Upsert.applyChanges(base, changes, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.keySet shouldBe Set(1L, 2L, 3L, 4L) // key 2 upserted, NOT deleted
    out(2L) shouldBe "b2"
  }

  test("composite keys merge on the full key tuple") {
    import spark.implicits._
    val t2 = Seq((1L, "en", 1.0), (1L, "de", 2.0)).toDF("k", "lang", "v")
    val d2 = Seq((1L, "de", 9.0)).toDF("k", "lang", "v")
    val out = Upsert.merge(t2, d2, Seq("k", "lang"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    out shouldBe Map((1L, "en") -> 1.0, (1L, "de") -> 9.0)
  }
}
