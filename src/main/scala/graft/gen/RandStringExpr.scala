package graft.gen

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic random-string generator as a native codegen Expression.
  *
  * The built-in formulation (concat of per-character element_at over a
  * hash) stays inside whole-stage codegen but pays one UTF8String
  * allocation + copy per character — ~370 ns/char, which made
  * varchar(50) the entire cost of the 7-column benchmark spec. This
  * expression emits one static call per row into a tight byte loop:
  * one xxhash64 draw per 8 characters, one output buffer, ~5 ns/char.
  *
  * The value stream is bit-identical to the Column formulation it
  * replaced: h_k = xxhash64(id, seedMix + 1000 + k) (Spark's two-arg
  * xxhash64 ≡ XXH64.hashLong(mix, XXH64.hashLong(id, 42))), character
  * j = alphabet[(h_{j/8} >>> 8·(j mod 8)) & 255 mod |alphabet|].
  *
  * `lenDraw >= 0` selects the reference's variable-length text/blob
  * semantics (length = 1 + hash mod maxLen, generate_csv.cpp:76-88);
  * otherwise the length is fixed at maxLen.
  */
case class RandStringExpr(child: Expression, seedMix: Long, maxLen: Int,
                          alphabet: String, lenDraw: Int)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_rand_string"

  @transient private lazy val alphaBytes = alphabet.getBytes("US-ASCII")

  override protected def nullSafeEval(input: Any): Any =
    RandStringImpl.gen(input.asInstanceOf[Long], seedMix, maxLen, alphaBytes, lenDraw)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val alphaRef = ctx.addReferenceObj("alpha", alphaBytes, "byte[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.gen.RandStringImpl.gen($c, ${seedMix}L, $maxLen, $alphaRef, $lenDraw)")
  }

  override protected def withNewChildInternal(newChild: Expression): RandStringExpr =
    copy(child = newChild)
}

object RandStringImpl {
  /** Spark's two-argument xxhash64: second value hashed with the first's
    * hash as seed (seed 42, matching the Column function's default).
    */
  @inline private def h2(id: Long, mix: Long): Long =
    XXH64.hashLong(mix, XXH64.hashLong(id, 42L))

  def gen(id: Long, seedMix: Long, maxLen: Int, alpha: Array[Byte], lenDraw: Int): UTF8String = {
    val n = alpha.length
    val len =
      if (lenDraw >= 0) {
        val r = h2(id, seedMix + lenDraw) % maxLen
        1 + (if (r < 0) r + maxLen else r).toInt
      } else maxLen
    val out = new Array[Byte](len)
    var j = 0
    var h = 0L
    while (j < len) {
      if ((j & 7) == 0) h = h2(id, seedMix + 1000 + (j >> 3))
      out(j) = alpha((((h >>> ((j & 7) << 3)) & 255L) % n).toInt)
      j += 1
    }
    UTF8String.fromBytes(out)
  }
}
