package graft.gen

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace-token statistics of one document in ONE pass — the
  * native form of q_quality_gate's rule inputs:
  *
  *   n  = size(split(text, ' '))              (empties included)
  *   sl = Σ length(token)                     (code points)
  *   nd = size(array_distinct(tokens))
  *   mx = max token multiplicity
  *
  * The Column formulation computed mx as
  * `array_max(transform(array_distinct(t), u -> size(filter(t, x = u))))`
  * — QUADRATIC in tokens per row (distinct × n comparisons), the one
  * per-row superlinear term in the inventory: a 100k-token document
  * pays ~10^9 comparisons. One hashmap pass is O(n) and computes all
  * four stats together. Equivalence with the Column chain is pinned by
  * BpeEncodeEquivalenceSpec's token-stats test on the corpus plus
  * adversarial strings (empties from space runs, non-ASCII,
  * supplementary code points).
  */
case class TokenStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TokenStatsExpr.Schema
  override def prettyName: String = "graft_token_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING input, got ${child.dataType.sql}")

  override protected def nullSafeEval(s: Any): Any =
    TokenStatsImpl.stats(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.gen.TokenStatsImpl.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenStatsExpr =
    copy(child = newChild)
}

object TokenStatsExpr {
  val Schema: StructType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sl", LongType, nullable = false),
    StructField("nd", LongType, nullable = false),
    StructField("mx", LongType, nullable = false)))
}

object TokenStatsImpl {

  def stats(text: UTF8String): InternalRow = {
    // split(" ", -1) matches Spark's split(text, " "): literal single-
    // space separator, leading/empty/trailing empties all kept
    val toks = text.toString.split(" ", -1)
    var sl = 0L
    var mx = 0L
    val counts = new java.util.HashMap[String, java.lang.Long](toks.length * 2)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      sl += t.codePointCount(0, t.length)
      val prev = counts.get(t)
      val c = if (prev == null) 1L else prev.longValue() + 1L
      counts.put(t, c)
      if (c > mx) mx = c
      i += 1
    }
    new GenericInternalRow(Array[Any](
      toks.length.toLong, sl, counts.size.toLong, mx))
  }
}
