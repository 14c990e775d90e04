package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{AdcTable, CharNGrams, DotProduct, NearestCells, PqEncode}

/** Engine extension point, installed via
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` — the public
  * Spark API for registering native Catalyst expressions (SURVEY.md §4:
  * custom work beyond built-ins is confined to here and the CAIM estimator).
  *
  * Functions:
  *  - `graft_dot(array<double>, array<double>) -> double` — codegen'd dot
  *    product ([[graft.functions.DotProduct]]), the hot inner loop of the
  *    similarity-search operators.
  *  - `graft_char_ngrams(string, n) -> rows of ngram` — custom table
  *    generator ([[graft.functions.CharNGrams]]).
  *
  * Optimizer rules:
  *  - [[graft.plans.RangeJoinRewrite]] — rewrites naive interval joins
  *    into the banded equi-join shape (OFF by default; enable with
  *    `spark.graft.rangeJoin.rewrite=true`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "graft_dot takes exactly 2 arguments")
        DotProduct(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_char_ngrams"),
      new ExpressionInfo(classOf[CharNGrams].getName, "graft_char_ngrams"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "graft_char_ngrams takes exactly 2 arguments")
        CharNGrams(children(0), children(1))
      }))
    // the IVF/IVF-PQ quantizer kernels (round 11 — see PqKernels for why
    // these are native expressions rather than Catalyst array algebra)
    ext.injectFunction((
      new FunctionIdentifier("graft_nearest_cells"),
      new ExpressionInfo(classOf[NearestCells].getName, "graft_nearest_cells"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 3, "graft_nearest_cells takes exactly 3 arguments")
        NearestCells(children(0), children(1), children(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "graft_pq_encode"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "graft_pq_encode takes exactly 2 arguments")
        PqEncode(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_adc_table"),
      new ExpressionInfo(classOf[AdcTable].getName, "graft_adc_table"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "graft_adc_table takes exactly 2 arguments")
        AdcTable(children(0), children(1))
      }))
    // the runtime-filter bloom pair (round 12): Spark ships these exact
    // Catalyst expressions for its own AQE runtime filtering but does not
    // register them in the public FunctionRegistry — exposing them makes
    // the build-bloom-on-the-dim / prefilter-the-fact-before-the-shuffle
    // pattern (the join_bloom query) first-class user surface instead of
    // an optimizer-internal. graft_bloom_agg(xxhash64(k), estItems,
    // numBits) -> binary; graft_bloom_contains(bloom, xxhash64(k)) ->
    // boolean (no false negatives by construction).
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 3, "graft_bloom_agg takes exactly 3 arguments")
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          children(0), children(1), children(2))
      }))
    // exact 128-bit fixed-point sum (r18 optimization): the codegen'd
    // replacement for sum(CAST(x AS DECIMAL(18,s))).cast("double") —
    // value-identical, no per-row BigDecimal (see functions.SumUnscaled128)
    ext.injectFunction((
      new FunctionIdentifier("graft_dsum"),
      new ExpressionInfo(classOf[graft.functions.SumUnscaled128].getName, "graft_dsum"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        // 1-arg: pre-cast compact-decimal input (scale read off the type).
        // 2-arg (r18): graft_dsum(x, s) — scale declared by the caller, the
        // double fast path (see functions.SumUnscaledFixed / D2U).
        children match {
          case Seq(c) => graft.functions.SumUnscaled128(c)
          case Seq(c, s) =>
            // a foldable NULL or non-numeric literal must surface as the
            // intended contract error, not an NPE/ClassCastException
            val scale = s match {
              case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
              case other if other.foldable => other.eval() match {
                case n: Number => n.intValue()
                case _ => throw new IllegalArgumentException(
                  "graft_dsum(x, s): s must be a literal int scale")
              }
              case _ => throw new IllegalArgumentException(
                "graft_dsum(x, s): s must be a literal int scale")
            }
            graft.functions.SumUnscaledFixed(c, scale)
          case _ => throw new IllegalArgumentException(
            "graft_dsum takes 1 or 2 arguments")
        }
      }))
    // r19 siblings of graft_dsum (see functions.ExactSum):
    //  - graft_dxsum(x, y, sx, sy): exact cross-moment sum — value-
    //    identical to sum(CAST(x AS DEC(18,sx)) * CAST(y AS DEC(18,sy)))
    //    .cast("double"), per row one 128-bit integer multiply instead of
    //    two string-path casts + a BigDecimal multiply.
    //  - graft_dsumd(x): the 128-bit sum finished as DECIMAL(38, s) for
    //    consumers that keep doing exact decimal arithmetic on the sum.
    ext.injectFunction((
      new FunctionIdentifier("graft_dxsum"),
      new ExpressionInfo(classOf[graft.functions.SumUnscaledProduct].getName,
        "graft_dxsum"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 4,
          "graft_dxsum takes exactly 4 arguments: x, y, sx, sy")
        def scaleOf(e: org.apache.spark.sql.catalyst.expressions.Expression,
            what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other if other.foldable => other.eval() match {
            case n: Number => n.intValue()
            case _ => throw new IllegalArgumentException(
              s"graft_dxsum: $what must be a literal int scale")
          }
          case _ => throw new IllegalArgumentException(
            s"graft_dxsum: $what must be a literal int scale")
        }
        graft.functions.SumUnscaledProduct(children(0), children(1),
          scaleOf(children(2), "sx"), scaleOf(children(3), "sy"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_dsumd"),
      new ExpressionInfo(classOf[graft.functions.SumUnscaled128Dec].getName,
        "graft_dsumd"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "graft_dsumd takes exactly 1 argument")
        graft.functions.SumUnscaled128Dec(children(0))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_bloom_contains"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "graft_bloom_contains takes exactly 2 arguments")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children(0), children(1))
      }))
  }
}
