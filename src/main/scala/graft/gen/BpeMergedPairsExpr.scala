package graft.gen

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Post-merge adjacent symbol pairs of one word for a SINGLE runtime
  * merge (a, b) — the native form of q_bpe_apply's recount stage
  * (expand → one doubled-separator replace → split/filter → adjacent
  * concat), sharing BpeTokenCountImpl's symbol build and merge pass so
  * the two BPE expressions cannot drift. Unlike BpeTokenCountExpr's
  * literal merge table, the pair arrives as runtime child expressions
  * (q_bpe_apply broadcasts the corpus-wide top pair and merges with
  * it), so this is a ternary expression, not a literal-parameterized
  * unary one. Words with fewer than two post-merge symbols yield an
  * empty array — explode() then drops the row, exactly like the
  * size >= 2 filter it replaces.
  */
case class BpeMergedPairsExpr(tok: Expression, a: Expression, b: Expression)
  extends TernaryExpression {

  override def first: Expression = tok
  override def second: Expression = a
  override def third: Expression = b

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_merged_pairs"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == StringType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING inputs, got ${children.map(_.dataType.sql).mkString(", ")}")

  override protected def nullSafeEval(t: Any, av: Any, bv: Any): Any =
    BpeMergedPairsImpl.pairs(t.asInstanceOf[UTF8String],
      av.asInstanceOf[UTF8String], bv.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, av, bv) =>
      s"graft.gen.BpeMergedPairsImpl.pairs($t, $av, $bv)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BpeMergedPairsExpr =
    copy(tok = newFirst, a = newSecond, b = newThird)
}

object BpeMergedPairsImpl {

  private val Empty = new GenericArrayData(Array.empty[Any])

  // the merge pair comes from a 1-row broadcast, so every row of a
  // task decodes the SAME two UTF8Strings — memoize the last decode
  // per thread instead of allocating two fresh Strings per token. The
  // memo is retained for the life of the executor thread, so it is
  // size-capped: a pair side larger than MemoMaxBytes (never in
  // practice — BPE pair sides are one or a few symbols) is decoded
  // fresh and NOT retained, bounding per-thread retention at
  // 2×MemoMaxBytes.
  private val MemoMaxBytes = 1024
  private final class Memo { var u: UTF8String = _; var s: String = _ }
  private val memoA = ThreadLocal.withInitial[Memo](() => new Memo)
  private val memoB = ThreadLocal.withInitial[Memo](() => new Memo)
  private def decode(m: Memo, u: UTF8String): String = {
    if (u.numBytes > MemoMaxBytes) return u.toString
    if (m.u == null || !m.u.equals(u)) { m.u = u.clone(); m.s = u.toString }
    m.s
  }

  def pairs(tok: UTF8String, a: UTF8String, b: UTF8String): ArrayData = {
    val s = tok.toString
    val syms = BpeTokenCountImpl.symbols(s, 0, s.length)
    BpeTokenCountImpl.mergePass(syms,
      decode(memoA.get(), a), decode(memoB.get(), b),
      BpeTokenCountImpl.trailingTerminatorSymbol(s, 0, s.length))
    val n = syms.size
    if (n < 2) return Empty
    val out = new Array[Any](n - 1)
    var i = 1
    while (i < n) {
      out(i - 1) = UTF8String.fromString(syms.get(i - 1) + syms.get(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}
