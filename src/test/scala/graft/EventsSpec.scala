package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-9 event-analytics and text-quality queries: semantic invariants
  * the hash oracle cannot express (ordering within a row, density of the
  * gap-filled grid, information-theoretic bounds).
  */
class EventsSpec extends AnyFunSuite with SparkFixture with Matchers {

  test("events_funnel: stage timestamps are strictly ordered and stage matches nulls") {
    val rows = SparkEntry.queries("events_funnel")(spark, sf001).collect()
    rows should not be empty
    rows.foreach { r =>
      val s1 = Option(r.getAs[java.lang.Long]("signup_us"))
      val s2 = Option(r.getAs[java.lang.Long]("view_us"))
      val s3 = Option(r.getAs[java.lang.Long]("purchase_us"))
      val stage = r.getAs[Long]("stage")
      // each stage requires the previous one, strictly later, within 24h
      if (s2.isDefined) { s1.isDefined shouldBe true; s2.get should be > s1.get
        (s2.get - s1.get) should be <= 86400000000L }
      if (s3.isDefined) { s2.isDefined shouldBe true; s3.get should be > s2.get
        (s3.get - s2.get) should be <= 86400000000L }
      stage shouldBe Seq(s1, s2, s3).count(_.isDefined).toLong
    }
    // the 24h conversion windows must actually discriminate on the corpus
    rows.map(_.getAs[Long]("stage")).distinct.length should be > 1
  }

  test("ts_fill_gaps: per-user day grid is dense and totals are preserved") {
    val out = SparkEntry.queries("ts_fill_gaps")(spark, sf001).collect()
    val byUser = out.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (_, rs) =>
      val days = rs.map(_.getAs[Long]("d")).sorted
      days shouldBe (days.min to days.max) // contiguous, no holes
      rs.filter(_.getAs[Long]("n_events") == 0L)
        .foreach(_.getAs[Double]("sum_value") shouldBe 0.0)
    }
    out.map(_.getAs[Long]("n_events")).sum shouldBe
      T.t(spark, sf001, "events").count()
  }

  test("retention_cohort: week 0 holds every cohort member and offsets are bounded") {
    val rows = SparkEntry.queries("retention_cohort")(spark, sf001).collect()
    rows should not be empty
    val users = T.t(spark, sf001, "events").select("user_id").distinct().count()
    val wk0 = rows.filter(_.getAs[Long]("wk") == 0L).map(_.getAs[Long]("n_users")).sum
    wk0 shouldBe users // everyone's first event is in their own week 0
    rows.foreach { r =>
      r.getAs[Long]("wk") should be >= 0L
      r.getAs[Long]("n_users") should be <= users
    }
  }

  test("text_entropy: bounded by log2 of distinct and total token counts") {
    val rows = SparkEntry.queries("text_entropy")(spark, sf001).collect()
    rows should not be empty
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy")
      val nd = r.getAs[Long]("n_distinct").toDouble
      h should be >= 0.0
      h should be <= (math.log(nd) / math.log(2) + 1e-6)
    }
  }

  test("quality_lm: surprisal positive, bounded by log2(corpus tokens), rare-token doc scores higher") {
    val rows = SparkEntry.queries("quality_lm")(spark, sf001).collect()
    rows should not be empty
    val total = rows.map(_.getAs[Long]("n_tokens")).sum.toDouble
    rows.foreach { r =>
      val sLm = r.getAs[Double]("avg_surprisal")
      sLm should be > 0.0
      sLm should be <= (math.log(total) / math.log(2) + 1e-6)
    }
  }

  test("new round-9 queries are distribution invariant (shuffle partitions)") {
    val names = Seq("events_funnel", "retention_cohort", "ts_fill_gaps",
      "ts_rolling_avg", "text_entropy", "quality_lm", "agg_winsorize",
      "agg_moments", "upsert_merge")
    val before = names.map(n =>
      n -> SparkEntry.queries(n)(spark, sf001).collect().toSeq).toMap
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      names.foreach { n =>
        SparkEntry.queries(n)(spark, sf001).collect().toSeq shouldBe before(n)
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", old)
  }
}
