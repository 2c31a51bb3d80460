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
      // One linear pass precomputes every code-point boundary, then
      // each shingle is a byte-range slice. The previous
      // `t.substring(i, i + len)` re-scanned from byte 0 on EVERY call
      // to locate char i (UTF8String.substring counts code points from
      // the start), making shingling O(chars²) per document — invisible
      // on short rows, a scale-killer on real corpora (a 100k-char doc
      // paid ~10^10 byte steps). Slices are byte-identical to
      // substring's output, so consumers (and the DuckDB oracle) see
      // exactly the same shingles.
      val bytes = t.getBytes
      val n = t.numChars()
      val starts = new Array[Int](n + 1)
      var b = 0
      var c = 0
      while (b < bytes.length) {
        starts(c) = b
        b += UTF8String.numBytesForFirstByte(bytes(b))
        c += 1
      }
      starts(n) = bytes.length
      val count = math.max(n - (shingleLen - 1), 1)
      (0 until count).iterator.map { i =>
        val from = starts(i)
        val until = starts(math.min(i + shingleLen, n))
        InternalRow(i + 1, UTF8String.fromBytes(bytes, from, until - from))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleGenExpr =
    copy(child = newChild)
}
