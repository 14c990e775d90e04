package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[graft.functions.SumUnscaled128]] (the r18 `T.dsum` rewiring)
  * VALUE-IDENTICAL to the built-in decimal sum it replaces:
  * `sum(CAST(x AS DECIMAL(18, s))).cast("double")`. The equivalence is the
  * whole optimization contract — every oracle hash that rode dsum must be
  * byte-identical, so the comparison here is exact (==), never tolerance.
  */
class ExactSumSpec extends AnyFunSuite with SparkFixture {

  private def builtin(c: org.apache.spark.sql.Column, s: Int) =
    sum(c.cast(DecimalType(18, s))).cast("double")

  test("dsum == built-in decimal sum on corpus money columns, per group") {
    val o = T.t(spark, sf01c, "orders")
    val a = o.groupBy("o_orderpriority")
      .agg(T.dsum(col("o_totalprice"), 2).as("v"))
      .orderBy("o_orderpriority").collect().map(r => r.getString(0) -> r.getDouble(1))
    val b = o.groupBy("o_orderpriority")
      .agg(builtin(col("o_totalprice"), 2).as("v"))
      .orderBy("o_orderpriority").collect().map(r => r.getString(0) -> r.getDouble(1))
    assert(a.toSeq == b.toSeq)
  }

  test("dsum carry paths: sums crossing 2^63 of unscaled magnitude, both signs") {
    // 40 values of ±9.2e17 unscaled (scale 2): |running sum| crosses the
    // 64-bit boundary repeatedly in update AND merge (8 partitions)
    val big = 9.2e15 // cast to DECIMAL(18,2) -> unscaled 9.2e17
    val df = spark.range(0, 40, 1, 8)
      .select(when(col("id") % 3 === 0, -big).otherwise(big).as("x"))
    val got = df.agg(T.dsum(col("x"), 2)).head.getDouble(0)
    val want = df.agg(builtin(col("x"), 2)).head.getDouble(0)
    assert(got == want)
    // negative-dominant variant (hi limb stays negative throughout)
    val dfn = df.select(negate(col("x")).as("x"))
    assert(dfn.agg(T.dsum(col("x"), 2)).head.getDouble(0) ==
      dfn.agg(builtin(col("x"), 2)).head.getDouble(0))
  }

  test("dsum null semantics: nulls ignored, all-null group yields NULL") {
    val df = spark.range(0, 10, 1, 4).select(col("id").cast("long").as("g"),
        when(col("id") % 2 === 0, col("id").cast("double") + 0.25).as("x"))
      .withColumn("g", col("g") % 2)
    val r = df.groupBy("g").agg(T.dsum(col("x"), 2).as("v"), count(lit(1)))
      .orderBy("g").collect()
    val want = df.groupBy("g").agg(builtin(col("x"), 2).as("v"), count(lit(1)))
      .orderBy("g").collect()
    assert(r.map(_.isNullAt(1)).toSeq == want.map(_.isNullAt(1)).toSeq)
    assert(r.zip(want).forall { case (a, b) =>
      a.isNullAt(1) || a.getDouble(1) == b.getDouble(1) })
    // one group is all-null (odd ids): the built-in yields NULL there
    assert(r.exists(_.isNullAt(1)))
  }

  test("dsum empty input yields NULL like the built-in") {
    val df = spark.range(0).select(col("id").cast("double").as("x"))
    assert(df.agg(T.dsum(col("x"), 2)).head.isNullAt(0))
  }

  test("dsum random fuzz vs built-in, grouped, 4-decimal scale") {
    val df = spark.range(0, 20000, 1, 16).select(
      (col("id") % 7).as("g"),
      (rand(42) * 2e9 - 1e9).as("x"))
    val a = df.groupBy("g").agg(T.dsum(col("x"), 4).as("v")).orderBy("g")
      .collect().map(_.getDouble(1))
    val b = df.groupBy("g").agg(builtin(col("x"), 4).as("v")).orderBy("g")
      .collect().map(_.getDouble(1))
    assert(a.toSeq == b.toSeq)
  }

  test("D2U fast path == string-repr HALF_UP definition (direct fuzz + adversaries)") {
    // the r18 double fast path must agree with the definitional conversion
    // for EVERY double — fuzz across magnitudes/scales plus the hand-picked
    // half-way adversaries where naive float rounding diverges
    def slow(x: Double, s: Int): Long =
      java.math.BigDecimal.valueOf(x)
        .setScale(s, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
    val rnd = new java.util.Random(7)
    var i = 0
    while (i < 200000) {
      val mag = math.pow(10, rnd.nextInt(12) - 3)
      val x = (rnd.nextDouble() * 2 - 1) * mag
      val s = rnd.nextInt(7)
      assert(graft.functions.D2U.unscaled(x, s) == slow(x, s),
        s"x=$x s=$s")
      i += 1
    }
    // exact-representable halves and classic decimal landmines
    for (x <- Seq(0.125, -0.125, 0.135, -0.135, 2.675, 1.005, -1.005,
        0.5, -0.5, 1.5, 2.5, -2.5, 1e14 + 0.5, -(1e14 + 0.5));
        s <- 0 to 4)
      assert(graft.functions.D2U.unscaled(x, s) == slow(x, s), s"x=$x s=$s")
    // guard boundary: |x·10^s| around 2^50 — fast path must hand off
    for (x <- Seq(1.1258999068426239e13, 1.1258999068426251e13, 9.9e12);
        s <- Seq(2, 3))
      assert(graft.functions.D2U.unscaled(x, s) == slow(x, s), s"x=$x s=$s")
  }

  test("dsum(x, s) on computed double products == built-in (slow-path heavy)") {
    // agg_group's sum_disc/sum_charge shape: products of doubles have long
    // binary expansions, so most rows fail the fast-path round-trip check
    // and take the definitional conversion — equality must still be exact
    val li = T.t(spark, sf01c, "lineitem").limit(20000)
      .select((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("x"))
    assert(li.agg(T.dsum(col("x"), 4)).head.getDouble(0) ==
      li.agg(builtin(col("x"), 4)).head.getDouble(0))
    val li6 = T.t(spark, sf01c, "lineitem").limit(20000)
      .select((col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
        (lit(1.0) + col("l_tax"))).as("x"))
    assert(li6.agg(T.dsum(col("x"), 6)).head.getDouble(0) ==
      li6.agg(builtin(col("x"), 6)).head.getDouble(0))
  }

  test("dsum(x, s) non-double children keep the exact Cast path") {
    // integer/long inputs: dsum must equal the decimal-cast sum exactly
    val df = spark.range(0, 5000, 1, 8).select(col("id").as("x"))
    assert(df.agg(T.dsum(col("x"), 2)).head.getDouble(0) ==
      df.agg(builtin(col("x"), 2)).head.getDouble(0))
    val dec = spark.range(0, 5000, 1, 8)
      .select((col("id").cast("decimal(12,2)") / 7).as("x"))
    assert(dec.agg(T.dsum(col("x"), 2)).head.getDouble(0) ==
      dec.agg(builtin(col("x"), 2)).head.getDouble(0))
  }

  test("dsum refuses non-compact decimal input") {
    val e = intercept[Exception] {
      spark.range(1).select(col("id").cast("decimal(28,4)").as("x"))
        .agg(graft.T.dsumDecimal(col("x"))).collect()
    }
    assert(e.getMessage.contains("compact decimal"))
  }
}
