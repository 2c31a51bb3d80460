package graft.gen

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** All MinHash signatures of a text in one pass — native codegen
  * expression for the LSH dedup pipeline (DedupQueries.q_dedup_minhash).
  *
  * Semantics (bit-identical to the DuckDB oracle, which recomputes it
  * with list_transform/list_min):
  *   shingles  = character 5-grams (clipped at the end; whole text if
  *               shorter than 5)
  *   H(sh)     = first 15 hex chars of md5(sh) as a 60-bit integer,
  *               mod P (≡ conv(substr(md5(sh),1,15),16,10) % P)
  *   sig_i     = min over shingles of (a_i·H + b_i) mod P
  *
  * Duplicate shingles don't affect minima, so no distinct pass is
  * needed. The built-in formulation (array_min over 16 interpreted
  * lambda transforms of the shingle array) evaluated ~36M lambdas at
  * sf0.1 (~8 s); this loop runs the same corpus in tens of ms.
  *
  * Shingling is over CODEPOINTS (matching DuckDB's character-based
  * substr): non-ASCII input walks UTF-8 char boundaries; pure-ASCII
  * input (byte count == char count) takes the straight byte path.
  */
case class MinHashSigsExpr(child: Expression, shingleLen: Int, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sigs"

  override protected def nullSafeEval(input: Any): Any =
    MinHashImpl.sigs(input.asInstanceOf[UTF8String], shingleLen, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.gen.MinHashImpl.sigs($c, $shingleLen, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigsExpr =
    copy(child = newChild)
}

object MinHashImpl {
  val P = 1000000007L

  /** Universal-hash family parameters — keep in sync with
    * DedupQueries.hashParams (the oracle generator).
    */
  def hashParams(i: Int): (Long, Long) =
    (1_000_003L * (i + 1) % 900_000_000L + 1, 998_244_353L * (i + 7) % P)

  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  // numHashes is a plan-time constant: compute the family parameters
  // once, not per row (the sigs call is the per-document hot path)
  private val paramCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def params(numHashes: Int): (Array[Long], Array[Long]) =
    paramCache.computeIfAbsent(numHashes, n => {
      val as = new Array[Long](n)
      val bs = new Array[Long](n)
      var i = 0
      while (i < n) { val (a, b) = hashParams(i); as(i) = a; bs(i) = b; i += 1 }
      (as, bs)
    })

  def sigs(text: UTF8String, shingleLen: Int, numHashes: Int): ArrayData = {
    val bytes = text.getBytes
    // Char-start byte offsets, with a sentinel at the end. For ASCII
    // (the common corpus) every byte is a char start and offs(i) == i.
    val nChars = text.numChars()
    val offs = new Array[Int](nChars + 1)
    if (nChars == bytes.length) {
      var i = 0
      while (i <= nChars) { offs(i) = i; i += 1 }
    } else {
      var i = 0; var c = 0
      while (i < bytes.length) {
        if ((bytes(i) & 0xc0) != 0x80) { offs(c) = i; c += 1 }
        i += 1
      }
      offs(nChars) = bytes.length
    }
    val md = digests.get()
    val (as, bs) = params(numHashes)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val nSh = math.max(nChars - (shingleLen - 1), 1)
    var s = 0
    while (s < nSh) {
      val from = offs(s)
      val until = offs(math.min(s + shingleLen, nChars))
      md.reset()
      md.update(bytes, from, until - from)
      val d = md.digest()
      // first 15 hex chars = bytes 0..6 plus the high nibble of byte 7
      var h = 0L
      var j = 0
      while (j < 7) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
      h = (h << 4) | ((d(7) & 0xf0L) >>> 4)
      val h0 = h % P
      var k = 0
      while (k < numHashes) {
        val v = (h0 * as(k) + bs(k)) % P
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }
}
