package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** C45/C46: the DBD company-document field state machine
  * (pdf_ocr_dbd_to_json.py:198-395) re-expressed as typed group processing:
  * one document's lines in, one structured record out.
  *
  * This is inherently sequential *within* a document (labels may carry
  * their value on the same line or the next; the directors list is a
  * numbered run; the binding rule is a paragraph that continues until the
  * next label) — so the right Spark shape is `groupByKey(doc).mapGroups`:
  * documents parallelize perfectly, lines within one stay ordered. */
object DbdDocParser {

  final case class DocLine(doc_id: String, page: Int, line_no: Int, text: String)
  final case class Director(no: Int, name: String)
  final case class CompanyDoc(
      doc_id: String,
      registration_no: Option[String],
      registered_date: Option[String],
      capital: Option[String],
      directors: Seq[Director],
      binding_rule: Option[String])

  private val labelValue = Map(
    "ทะเบียนเลขที่" -> "registration_no",
    "วันที่จดทะเบียน" -> "registered_date",
    "ทุนจดทะเบียน" -> "capital")
  private val directorsHeader = "กรรมการของบริษัท"
  private val bindingHeader = "กรรมการลงชื่อผูกพัน"
  private val directorLine = "^(\\d+)\\.\\s*(.+)$".r

  /** Parse one document's ordered lines (the state machine). */
  def parseLines(docId: String, lines: Seq[String]): CompanyDoc = {
    val fields = scala.collection.mutable.Map.empty[String, String]
    val directors = scala.collection.mutable.ArrayBuffer.empty[Director]
    val binding = new StringBuilder
    var pendingField: Option[String] = None   // label seen, value on next line
    var mode: String = "fields"               // fields | directors | binding

    lines.map(_.trim).filter(_.nonEmpty).foreach { line =>
      val isLabelStart = labelValue.keys.exists(line.startsWith)
      if (line.startsWith(directorsHeader)) { mode = "directors"; pendingField = None }
      else if (line.startsWith(bindingHeader)) {
        mode = "binding"; pendingField = None
        val rest = line.stripPrefix(bindingHeader).trim
        if (rest.nonEmpty) binding.append(rest)
      } else mode match {
        case "fields" =>
          pendingField match {
            case Some(key) if !isLabelStart =>
              fields.getOrElseUpdate(key, line); pendingField = None
            case _ =>
              labelValue.collectFirst {
                case (th, en) if line.startsWith(th) => (th, en)
              } match {
                case Some((th, en)) =>
                  val v = line.stripPrefix(th).trim.stripPrefix(":").trim
                  if (v.nonEmpty) fields.getOrElseUpdate(en, v)
                  else pendingField = Some(en)
                case None => () // noise between labels
              }
          }
        case "directors" =>
          line match {
            case directorLine(_, name) =>
              // C46: dedupe by name preserving order, renumber 1..n
              val clean = name.trim
              if (!directors.exists(_.name == clean))
                directors += Director(directors.length + 1, clean)
            case _ => mode = "fields" // numbered run ended
          }
        case "binding" =>
          if (isLabelStart) mode = "fields"
          else { if (binding.nonEmpty) binding.append(" "); binding.append(line) }
      }
    }
    CompanyDoc(docId,
      fields.get("registration_no"), fields.get("registered_date"),
      fields.get("capital"), directors.toSeq,
      if (binding.isEmpty) None else Some(binding.toString))
  }

  /** Distributed driver: lines (any partitioning) → one record per doc. */
  def parse(lines: Dataset[DocLine]): Dataset[CompanyDoc] = {
    import lines.sparkSession.implicits._
    lines.groupByKey(_.doc_id).mapGroups { (docId, it) =>
      val ordered = it.toSeq.sortBy(l => (l.page, l.line_no)).map(_.text)
      parseLines(docId, ordered)
    }
  }

  /** C47 title-card merge: fill registered_date (and friends) from the
    * scraped title card when the parsed doc lacks them — left join +
    * coalesce (pdf_ocr_dbd_to_json.py:399-419). */
  def mergeTitleCard(docs: DataFrame, titleCards: DataFrame): DataFrame = {
    val t = titleCards.select(col("doc_id"),
      col("registered_date").as("tc_registered_date"),
      col("address").as("tc_address"))
    docs.join(t, Seq("doc_id"), "left")
      .withColumn("registered_date",
        coalesce(col("registered_date"), col("tc_registered_date")))
      .withColumn("address", col("tc_address"))
      .drop("tc_registered_date", "tc_address")
  }
}
