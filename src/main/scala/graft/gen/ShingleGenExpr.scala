package graft.gen

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-shingle generator (UDTF): one output row per shingle of
  * the input text — `graft_shingles(text, 5)` ≡ rows of
  * (pos, substr(text, pos, 5)) for pos in 1..max(length-4, 1).
  *
  * This is the custom-Generator extension point from SURVEY §2.2.11:
  * where a 1→N expansion doesn't fit an array-returning expression +
  * explode (e.g. when materializing the intermediate array per row
  * would dominate memory), a Generator streams its rows straight into
  * the downstream operator. Shingling semantics match
  * [[MinHashSigsExpr]] (codepoints, end-clipped, whole text when
  * shorter than the shingle) and DuckDB's character substr.
  *
  * CodegenFallback: generators sit behind GenerateExec, which is not
  * whole-stage-codegen'd for arbitrary generators anyway; the hot
  * MinHash path keeps its dedicated codegen expression.
  */
case class ShingleGenExpr(child: Expression, shingleLen: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  require(shingleLen > 0, s"shingle length must be positive, got $shingleLen")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("shingle", StringType, nullable = false)))

  override def prettyName: String = "graft_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.sql}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input).asInstanceOf[UTF8String]
    if (t == null) Iterator.empty
    else {
      val n = t.numChars()
      val count = math.max(n - (shingleLen - 1), 1)
      (0 until count).iterator.map { i =>
        InternalRow(i + 1, t.substring(i, math.min(i + shingleLen, n)))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleGenExpr =
    copy(child = newChild)
}
