package graft.gen

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen vector math over float-array embedding columns.
  *
  * The HOF formulation (`aggregate(zip_with(a, b, _*_), 0d, _+_)`)
  * evaluates two interpreted lambdas per element — measured as the
  * dominant cost of the similarity queries. These expressions compile
  * to a static-call loop with the SAME association order (ascending
  * index, left fold), so the resulting doubles are bit-identical to
  * both the HOF form and DuckDB's list_reduce/list_transform oracle.
  *
  * Float-array inputs only (the embeddings schema); elements are
  * widened to double before multiply, like the HOF form's casts.
  */
object VecMath {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def norm(a: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val v = a.getFloat(i).toDouble
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }

  def proj(a: ArrayData, plane: Array[Double]): Double = {
    val n = math.min(a.numElements(), plane.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * plane(i)
      i += 1
    }
    acc
  }
}

/** dot(a, b) over two array<float> columns — codegen static call. */
case class DotProductExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecMath.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.gen.VecMath.dot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

/** Projection of an array<float> column onto a constant double plane —
  * the LSH hyperplane-sign hot path. The plane rides into generated
  * code as a reference object; the per-element values must be
  * precomputed EXACTLY as the oracle derives them (k/1000003.0 - 0.5
  * per component) so the fold stays bit-identical.
  */
case class PlaneProjExpr(child: Expression, plane: Array[Double])
  extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_plane_proj"

  override protected def nullSafeEval(a: Any): Any =
    VecMath.proj(a.asInstanceOf[ArrayData], plane)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planeRef = ctx.addReferenceObj("plane", plane, "double[]")
    defineCodeGen(ctx, ev, a => s"graft.gen.VecMath.proj($a, $planeRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): PlaneProjExpr =
    copy(child = newChild)
}

/** L2 norm of an array<float> column — codegen static call. */
case class VecNormExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_norm"

  override protected def nullSafeEval(a: Any): Any =
    VecMath.norm(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.gen.VecMath.norm($a)")

  override protected def withNewChildInternal(newChild: Expression): VecNormExpr =
    copy(child = newChild)
}
