package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** String kernels that need the JDK behind a codegen'd call. */
object StringOps {

  /** Unicode NFC normalization (java.text.Normalizer): canonical
    * composition, e.g. `e + COMBINING ACUTE` → `é`. The canonical-
    * equivalence step before exact/fuzzy dedup — visually identical text
    * must hash identically. Already-normalized input short-circuits via
    * the quick check. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Catalyst wrappers emitting a single static call (whole-stage codegen
  * keeps the surrounding stage — same pattern as VectorExpressions). */
object StringExpressions {

  case class NfcNormalize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      StringOps.nfc(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.plans.StringOps.nfc($a);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  import org.apache.spark.sql.graftglue.ColumnGlue.{column, expression}

  def nfc(c: Column): Column = column(NfcNormalize(expression(c)))
}
