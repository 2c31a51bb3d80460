package graft.gen

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit md5 key of a string — the engine's cross-engine hash primitive.
  *
  * Semantically identical to
  *   `conv(substring(md5(x), 1, 15), 16, 10).cast("long")`      (Spark)
  *   `('0x' || substr(md5(x), 1, 15))::BIGINT`                  (DuckDB)
  * but computed straight from the digest bytes: the first 15 hex chars
  * are bytes 0..6 big-endian plus the high nibble of byte 7, so the
  * value is `(b0..b6 << 4) | (b7 >>> 4)` — no 32-char hex string, no
  * substring, no BigInteger radix parse per row. Used by the
  * deterministic-sampling and dedup paths where the oracle recomputes
  * the same key in SQL.
  */
case class Md5Hash60Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_60"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING input, got ${child.dataType.sql}")

  override protected def nullSafeEval(s: Any): Any =
    Md5Hash60Impl.hash60(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.gen.Md5Hash60Impl.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60Expr =
    copy(child = newChild)
}

object Md5Hash60Impl {
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  def hash60(s: UTF8String): Long = hash60(s.getBytes)

  def hash60(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }
}
