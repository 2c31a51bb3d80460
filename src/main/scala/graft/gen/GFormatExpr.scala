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
    // exponent — the exponent %g's style choice is defined over. Both
    // output styles are then LAID OUT from these six digits directly
    // (no second format-and-round pass): %g's fixed style is defined
    // as precision P-1-X over the already-rounded value, so moving the
    // decimal point through the rounded digit string is exact — and
    // ~2× cheaper per value, which matters in the 10M-row CSV sink.
    val sci = String.format(Locale.ROOT, "%.5e", java.lang.Double.valueOf(x))
    val ei = sci.indexOf('e')
    val exp = Integer.parseInt(sci.substring(ei + 1))
    val neg = sci.charAt(0) == '-'
    val ds = sci.indexOf('.')
    // the six rounded significant digits, no sign, no point
    val dig = sci.substring(if (neg) 1 else 0, ds) + sci.substring(ds + 1, ei)
    val sb = new java.lang.StringBuilder(16)
    if (neg) sb.append('-')
    if (exp < -4 || exp >= 6) {
      var last = 5
      while (last > 0 && dig.charAt(last) == '0') last -= 1
      sb.append(dig.charAt(0))
      if (last > 0) sb.append('.').append(dig, 1, last + 1)
      sb.append('e').append(if (exp < 0) '-' else '+')
      val a = Math.abs(exp)
      if (a < 10) sb.append('0')
      sb.append(a)
    } else if (exp >= 0) {
      // point sits after digit position exp; strip trailing frac zeros
      var last = 5
      while (last > exp && dig.charAt(last) == '0') last -= 1
      sb.append(dig, 0, exp + 1)
      if (last > exp) sb.append('.').append(dig, exp + 1, last + 1)
    } else {
      var last = 5
      while (last > 0 && dig.charAt(last) == '0') last -= 1
      sb.append("0.")
      var i = exp + 1
      while (i < 0) { sb.append('0'); i += 1 }
      sb.append(dig, 0, last + 1)
    }
    sb.toString
  }
}
