package graft.gen

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Runtime support for [[CmsEstimateExpr]]: deserialize-once point
  * queries against a serialized count-min sketch.
  *
  * The deserialized sketch is cached per thread keyed on the blob's
  * CONTENT, not its identity: rows materialized from UnsafeRow /
  * column vectors hand back a fresh byte-array copy per getBinary, so
  * an `eq` key would re-deserialize every row. Identity is kept as a
  * fast path; otherwise `Arrays.equals` confirms (short-circuits on
  * length / first differing byte — orders of magnitude cheaper than
  * `CountMinSketch.readFrom`). The expression is evaluated over the
  * tiny POST-aggregation row set (one sketch blob × a handful of keys
  * from a broadcast), so all rows in a partition share one logical
  * blob and deserialization is paid once per task. The cache entry is
  * dropped at task completion so long-lived executor threads don't
  * pin the last blob+sketch.
  */
object CmsOps {
  private val last =
    new ThreadLocal[(Array[Byte], org.apache.spark.util.sketch.CountMinSketch)]

  // observability for the cache-hit contract (incremented per
  // deserialization, i.e. per cache miss — NOT per row)
  private[graft] val deserializations = new java.util.concurrent.atomic.AtomicLong

  def estimate(bytes: Array[Byte], key: Long): Long = {
    val cached = last.get()
    val sk =
      if (cached != null &&
          ((cached._1 eq bytes) || java.util.Arrays.equals(cached._1, bytes)))
        cached._2
      else {
        deserializations.incrementAndGet()
        val s = org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes)
        if (last.get() == null) {
          val tc = org.apache.spark.TaskContext.get()
          if (tc != null) tc.addTaskCompletionListener[Unit](_ => last.remove())
        }
        last.set((bytes, s))
        s
      }
    sk.estimateCount(java.lang.Long.valueOf(key))
  }
}

/** graft_cms_estimate(sketch, key): point-frequency estimate from a
  * `count_min_sketch(...)` aggregate result — the read side Spark
  * ships the sketch WITHOUT (the built-in only produces the binary
  * blob). Long keys hash exactly as CountMinSketchAgg added them, so
  * estimates are comparable with the one-sided CMS guarantee:
  * estimate ≥ true count always, ≤ true + eps·N with the sketch's
  * confidence. Codegen is a static call like the other graft
  * expressions ([[VecMath]] pattern).
  */
case class CmsEstimateExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BINARY sketch, BIGINT key), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override protected def nullSafeEval(sk: Any, key: Any): Any =
    CmsOps.estimate(sk.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.gen.CmsOps.estimate($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CmsEstimateExpr =
    copy(left = l, right = r)
}
