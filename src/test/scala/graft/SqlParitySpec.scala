package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** SURVEY.md §5.3 oracle-parity pre-check as a systematic spec (round 8,
  * verdict item 8): every declared oracle statement is written in the
  * ANSI-leaning intersection of the DuckDB and Spark dialects wherever the
  * query allows it — so for those queries the SAME SQL text must run under
  * `spark.sql` and reproduce the DSL variant's result exactly. This
  * catches dialect drift (an edit that silently changes semantics between
  * the Spark DSL and the oracle text) locally, before the driver's DuckDB
  * run does.
  *
  * Oracle statements using DuckDB-only constructs (list comprehensions,
  * `string_split` + `unnest`, recursive CTE closures, md5-prefix string
  * slicing quirks) fail Spark analysis and are skipped — the floor
  * assertion pins that the dual-dialect set stays ≥ 20 queries wide, so
  * the check cannot silently erode.
  */
class SqlParitySpec extends AnyFunSuite with SparkFixture with Matchers {

  test("oracle SQL texts run under spark.sql and agree with the DSL variants") {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach(tb => T.t(spark, sf001, tb).createOrReplaceTempView(tb))
    var compared = List.empty[String]
    var skipped = List.empty[String]
    // literal array subscripts are the one construct that PARSES in both
    // dialects but means different elements (DuckDB indexes from 1, Spark
    // from 0) — those oracle texts are intentionally DuckDB-dialect and
    // comparing them here would be comparing two different queries
    val oneBased = "\\[\\s*\\d+\\s*\\]".r
    val mismatches = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) if oneBased.findFirstIn(sql).isDefined =>
        skipped ::= (name + " (1-based index)"); None
      case (name, sql) =>
        val parsed =
          try {
            val df = spark.sql(sql)
            df.queryExecution.analyzed // force analysis
            Some(df)
          } catch { case _: Exception => skipped ::= name; None }
        parsed.flatMap { sdf =>
          try {
            val dsl = SparkEntry.queries(name)(spark, sf001)
            if (sdf.columns.sorted.toSeq != dsl.columns.sorted.toSeq) {
              compared ::= name
              Some(s"$name: columns ${sdf.columns.sorted.mkString(",")} vs ${dsl.columns.sorted.mkString(",")}")
            } else {
              val cols = sdf.columns.sorted
              // the driver compares column-name-sorted values; row order is
              // already total per §5.4 but sort stringified rows anyway so
              // the comparison is an order-free multiset equality
              val a = sdf.select(cols.head, cols.tail: _*).collect().map(_.toString).sorted
              val b = dsl.select(cols.head, cols.tail: _*).collect().map(_.toString).sorted
              compared ::= name
              if (a.sameElements(b)) None
              else Some(s"$name: ${a.length}/${b.length} rows, first diff " +
                a.zip(b).find { case (x, y) => x != y }.map(_.toString).getOrElse("(length)"))
            }
          } catch { case e: Exception => skipped ::= (name + " (runtime)"); None }
        }
    }
    info(s"${compared.size} compared, ${skipped.size} DuckDB-only skipped")
    info(s"skipped: ${skipped.sorted.mkString(", ")}")
    mismatches shouldBe empty
    compared.size should be >= 20
  }
}
