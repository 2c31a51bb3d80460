package graft.gen

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Runtime support for [[CmsEstimateExpr]]: deserialize-once point
  * queries against a serialized count-min sketch.
  *
  * The deserialized sketch is cached per thread keyed on the byte
  * array's identity: the expression is evaluated over the tiny
  * POST-aggregation row set (one sketch blob × a handful of keys from
  * a broadcast), so all rows in a partition share one blob and the
  * deserialization cost is paid once, not per row. Point queries over
  * the raw corpus would be the wrong shape anyway — build the sketch
  * with the aggregate, query it after reduction.
  */
object CmsOps {
  private val last =
    new ThreadLocal[(Array[Byte], org.apache.spark.util.sketch.CountMinSketch)]

  def estimate(bytes: Array[Byte], key: Long): Long = {
    val cached = last.get()
    val sk =
      if (cached != null && (cached._1 eq bytes)) cached._2
      else {
        val s = org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes)
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
