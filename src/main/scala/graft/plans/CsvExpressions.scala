package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC-4180-style CSV line splitting as a codegen'd kernel, for the
  * many-files ingestion path where lines arrive as a string column with
  * file lineage (Ingest.csvLinesPerFileEncoding) and Spark's file-based CSV
  * reader can't be used without losing that lineage.
  *
  * Semantics: `delim` splits outside quotes; a field wrapped in `"` may
  * contain delimiters and newlines-as-data; `""` inside a quoted field is a
  * literal quote; quotes mid-field are kept verbatim (lenient, matching the
  * tolerant readers the reference relies on). Always returns
  * fields.length == delims+1 (trailing empty fields preserved). */
object CsvOps {
  def splitLine(line: UTF8String, delim: Char): Array[UTF8String] = {
    val s = line.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    val cur = new java.lang.StringBuilder
    var inQuotes = false
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < n && s.charAt(i + 1) == '"') { cur.append('"'); i += 1 }
          else inQuotes = false
        } else cur.append(c)
      } else {
        if (c == '"' && cur.length() == 0) inQuotes = true
        else if (c == delim) { out += UTF8String.fromString(cur.toString); cur.setLength(0) }
        else cur.append(c)
      }
      i += 1
    }
    out += UTF8String.fromString(cur.toString)
    out.toArray
  }
}

object CsvExpressions {

  case class CsvSplitLine(child: Expression, delim: Char) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      new GenericArrayData(CsvOps.splitLine(v.asInstanceOf[UTF8String], delim)
        .asInstanceOf[Array[AnyRef]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
          s"(Object[]) graft.plans.CsvOps.splitLine($a, (char) ${delim.toInt}));")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  import org.apache.spark.sql.graftglue.ColumnGlue.{column, expression}

  /** Split a CSV line column into its string fields. */
  def splitCsvLine(line: Column, delim: Char = ','): Column =
    column(CsvSplitLine(expression(line), delim))
}
