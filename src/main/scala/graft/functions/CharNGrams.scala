package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst table-generating function (`Generator`): character
  * n-grams of a string column — one output row per n-gram, executed by
  * `GenerateExec` exactly like the built-in `explode` (SURVEY.md §2.12
  * documented this as the stretch beyond `posexplode`). Registered as
  * `graft_char_ngrams(text, n)` by [[graft.GraftExtensions]]; `n` must be a
  * foldable positive integer.
  */
case class CharNGrams(child: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, n)

  override def elementSchema: StructType =
    StructType(StructField("ngram", StringType, nullable = false) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("graft_char_ngrams expects a string column")
    else if (n.dataType != IntegerType || !n.foldable)
      TypeCheckResult.TypeCheckFailure("graft_char_ngrams expects a literal int n")
    else if (n.eval().asInstanceOf[Int] < 1)
      TypeCheckResult.TypeCheckFailure("graft_char_ngrams expects n >= 1")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val k: Int = n.eval().asInstanceOf[Int]

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val s = v.asInstanceOf[UTF8String].toString
      if (s.length < k) Nil
      else (0 to s.length - k).map(i => InternalRow(UTF8String.fromString(s.substring(i, i + k))))
    }
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CharNGrams =
    copy(child = newChildren(0), n = newChildren(1))
}
