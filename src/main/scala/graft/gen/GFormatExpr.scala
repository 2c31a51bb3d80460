package graft.gen

import java.util.Locale

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** C/C++ default float-to-text: `printf("%g")` at precision 6, the
  * format a default-constructed `std::stringstream << x` produces and
  * therefore the reference's CSV float/double text convention
  * (generate_csv.cpp:42-54; sample `-4.23e+08` in the reference
  * README). Spark's CSV sink writes the Java shortest-representation
  * instead (`-4.2300001E8` style) — domain-faithful but not
  * byte-faithful, so this expression exists for the text-parity sink
  * (SqloadGen.writeCsvText).
  *
  * %g semantics implemented exactly: round to 6 significant digits,
  * pick scientific iff the rounded exponent X < -4 or X >= 6, strip
  * trailing fraction zeros (and a bare trailing point), exponent as
  * sign + minimum two digits. Floats widen to double first — the
  * widening is exact, so rounding to 6 significant decimal digits
  * agrees with C++'s float stream.
  */
case class GFormat6Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_gfmt6"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case FloatType | DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_gfmt6 requires FLOAT or DOUBLE input, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val d = child.dataType match {
      case FloatType => input.asInstanceOf[Float].toDouble
      case _         => input.asInstanceOf[Double]
    }
    GFormatImpl.g6(d)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.gen.GFormatImpl.g6((double)$c)")

  override protected def withNewChildInternal(newChild: Expression): GFormat6Expr =
    copy(child = newChild)
}

object GFormatImpl {

  def g6(x: Double): UTF8String = UTF8String.fromString(g6s(x))

  /** `%g` with precision 6, matching glibc printf / C++ defaultfloat. */
  def g6s(x: Double): String = {
    if (java.lang.Double.isNaN(x)) return "nan"
    if (x == java.lang.Double.POSITIVE_INFINITY) return "inf"
    if (x == java.lang.Double.NEGATIVE_INFINITY) return "-inf"
    if (x == 0.0) return if (1.0 / x < 0) "-0" else "0"
    // %.5e rounds to 6 significant digits and exposes the post-rounding
    // exponent — the exponent %g's style choice is defined over.
    val sci = String.format(Locale.ROOT, "%.5e", java.lang.Double.valueOf(x))
    val ei = sci.indexOf('e')
    val exp = Integer.parseInt(sci.substring(ei + 1))
    if (exp < -4 || exp >= 6) {
      val mant = stripTrail(sci.substring(0, ei))
      val sign = if (exp < 0) "-" else "+"
      val a = Math.abs(exp)
      val digits = if (a < 10) "0" + a else String.valueOf(a)
      mant + "e" + sign + digits
    } else {
      // fixed style, precision P-1-X decimals (>= 0 since X <= 5 here)
      stripTrail(String.format(Locale.ROOT, "%." + (5 - exp) + "f",
        java.lang.Double.valueOf(x)))
    }
  }

  /** Drop trailing fraction zeros and a bare trailing '.', if any. */
  private def stripTrail(s: String): String = {
    if (s.indexOf('.') < 0) return s
    var end = s.length
    while (end > 0 && s.charAt(end - 1) == '0') end -= 1
    if (end > 0 && s.charAt(end - 1) == '.') end -= 1
    s.substring(0, end)
  }
}
