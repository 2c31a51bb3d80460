package graft.gen

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Analysis-time check shared by the vector expressions: every child
  * must be array<float> (the embeddings schema). AbstractDataType /
  * ExpectsInputTypes are private[sql] in Spark 4, so the check is
  * hand-rolled; it fails analysis instead of letting getFloat
  * reinterpret e.g. array<double> bits as floats at runtime.
  */
private[gen] trait FloatArrayInputs { self: Expression =>
  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = self.children.zipWithIndex.collect {
      case (c, i) if (c.dataType match {
        case ArrayType(FloatType, _) => false
        case _                       => true
      }) => s"arg $i is ${c.dataType.sql}"
    }
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${self.prettyName} requires ARRAY<FLOAT> inputs: ${bad.mkString(", ")}")
  }
}

/** Codegen vector math over float-array embedding columns.
  *
  * The HOF formulation (`aggregate(zip_with(a, b, _*_), 0d, _+_)`)
  * evaluates two interpreted lambdas per element — measured as the
  * dominant cost of the similarity queries. These expressions compile
  * to a static-call loop with the SAME association order (ascending
  * index, left fold), so the resulting doubles are bit-identical to
  * both the HOF form and DuckDB's list_reduce/list_transform oracle.
  *
  * Float-array inputs only (the embeddings schema) — enforced by
  * FloatArrayInputs at analysis time so an array<double> column can't
  * silently have its bits reinterpreted as floats; elements are
  * widened to double before multiply, like the HOF form's casts.
  */
object VecMath {
  // getFloat on a null slot reads garbage bits; parquet-read arrays are
  // containsNull=true even when no element ever is, so the guard is a
  // runtime check, not an analysis-time rejection. The check is folded
  // into the compute loop (isNullAt immediately before each getFloat)
  // so the hot path stays single-pass over each array.
  private def nullElement(fn: String, i: Int): Nothing =
    throw new IllegalArgumentException(
      s"$fn: null element at index $i — vector math requires dense float arrays")

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"graft_dot: length mismatch ($n vs ${b.numElements()}) — " +
          "truncating would silently corrupt similarity scores")
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) nullElement("graft_dot", i)
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
      if (a.isNullAt(i)) nullElement("graft_norm", i)
      val v = a.getFloat(i).toDouble
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }

  def proj(a: ArrayData, plane: Array[Double]): Double = {
    val n = a.numElements()
    if (plane.length != n)
      throw new IllegalArgumentException(
        s"graft_plane_proj: vector length $n != plane length ${plane.length}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) nullElement("graft_plane_proj", i)
      acc += a.getFloat(i).toDouble * plane(i)
      i += 1
    }
    acc
  }
}

/** dot(a, b) over two array<float> columns — codegen static call. */
case class DotProductExpr(left: Expression, right: Expression)
  extends BinaryExpression with FloatArrayInputs {

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
  *
  * The plane is a Seq (structural equality), not an Array: Array's
  * referential equality would make two identical expressions compare
  * unequal, defeating canonicalization and subexpression elimination.
  */
case class PlaneProjExpr(child: Expression, plane: Seq[Double])
  extends UnaryExpression with FloatArrayInputs {

  private lazy val planeArr: Array[Double] = plane.toArray

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_plane_proj"

  override protected def nullSafeEval(a: Any): Any =
    VecMath.proj(a.asInstanceOf[ArrayData], planeArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planeRef = ctx.addReferenceObj("plane", planeArr, "double[]")
    defineCodeGen(ctx, ev, a => s"graft.gen.VecMath.proj($a, $planeRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): PlaneProjExpr =
    copy(child = newChild)
}

/** L2 norm of an array<float> column — codegen static call. */
case class VecNormExpr(child: Expression)
  extends UnaryExpression with FloatArrayInputs {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_norm"

  override protected def nullSafeEval(a: Any): Any =
    VecMath.norm(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.gen.VecMath.norm($a)")

  override protected def withNewChildInternal(newChild: Expression): VecNormExpr =
    copy(child = newChild)
}
