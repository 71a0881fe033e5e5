package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Scalar numeric kernels shared by the codegen expressions below and
  * (via the static forwarders Scala emits for object methods) by the
  * generated Java. */
object NumericOps {

  /** Top `bits` of the IEEE-754 radix-sortable transform of a double:
    * the sign bit flipped for non-negatives, ALL bits flipped for
    * negatives, then an unsigned right shift. The full 64-bit transform
    * orders doubles totally (−∞ … −0.0, +0.0 … +∞, NaN last — Spark's
    * own NaN-greatest sort order); a prefix of it is therefore MONOTONE
    * NON-STRICTLY in the double: equal doubles always share a bucket and
    * bucket ids ascend with value. That is exactly the property the
    * distributed-selection quantile pass in [[graft.operators.Quantiles]]
    * needs from a data-independent bucketing function. Caveat: −0.0 and
    * +0.0 compare equal in Spark but occupy ADJACENT cells here — rank
    * picks among zeros may return either sign of zero (numerically equal;
    * only the printable sign differs). */
  def orderedPrefix(v: Double, bits: Int): Long = {
    val raw = java.lang.Double.doubleToRawLongBits(v)
    val ordered = if (raw >= 0L) raw ^ java.lang.Long.MIN_VALUE else ~raw
    ordered >>> (64 - bits)
  }
}

object NumericExpressions {

  /** Monotone `bits`-bit bucket id of a double (see
    * [[NumericOps.orderedPrefix]]). Codegen'd; null-in → null-out under
    * both legacy and ANSI modes (nullSafeEval/nullSafeCodeGen). */
  case class OrderedDoublePrefix(child: Expression, bits: Int)
      extends UnaryExpression {
    require(bits >= 1 && bits <= 63, s"prefix bits $bits outside [1,63]")
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      NumericOps.orderedPrefix(v.asInstanceOf[Double], bits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.plans.NumericOps.orderedPrefix($a, $bits);")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  import org.apache.spark.sql.graftglue.ColumnGlue.{column, expression}

  def orderedPrefix(v: Column, bits: Int): Column =
    column(OrderedDoublePrefix(expression(v), bits))
}
