package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** The reference's HTTP query surface as DataFrame functions
  * (PublicApiController.php — SURVEY.md §3.3).
  *
  * At scale the financial tables are partitioned by `fiscal_year`
  * (replacing the reference's table-per-year scheme, SURVEY §4), so the
  * range predicate prunes partitions and the tax_id filter rides min/max
  * parquet stats down to row groups. */
object CompanyQueries {

  /** P3 `onlyCols` projection: exactly the listed columns, cast double,
    * missing → null (PublicApiController.php:870-882). */
  def onlyCols(df: DataFrame, cols: Seq[String], keep: Seq[String] = Nil): DataFrame = {
    val have = df.columns.toSet
    df.select(keep.map(col) ++ cols.map(c =>
      (if (have(c)) col(c) else lit(null)).cast("double").as(c)): _*)
  }

  /** F9 point lookup: one company-year row
    * (PublicApiController.php:799-801). */
  def companyFinancial(table: DataFrame, taxId: String, year: Int): DataFrame =
    table.where(col("tax_id") === taxId && col("fiscal_year") === year).limit(1)

  /** F10/W7: all years with optional range, ordered by fiscal_year
    * (PublicApiController.php:884-985). */
  def companyFinancialAllYears(table: DataFrame, taxId: String,
                               from: Option[Int] = None,
                               to: Option[Int] = None): DataFrame = {
    val base = table.where(col("tax_id") === taxId)
    val lo = from.map(y => col("fiscal_year") >= y).getOrElse(lit(true))
    val hi = to.map(y => col("fiscal_year") <= y).getOrElse(lit(true))
    base.where(lo && hi).orderBy("fiscal_year")
  }

  /** W4/W5: directors listing — NULLS LAST on director_no, then id, paged,
    * with the full pre-page count as a `total` column (the reference's
    * `paginate(50)` returns `total`, PublicApiController.php:757-776).
    * Stable pagination via row_number; the count rides the SAME
    * single-partition window pass (a paged listing is one company's
    * filtered directors — inherently small; the big-data side is the
    * upstream filter, not the page). */
  def directorsPage(directors: DataFrame, page: Int, pageSize: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("director_no").asc_nulls_last, col("id"))
    val whole = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    directors.withColumn("__rn", row_number().over(w))
      .withColumn("total", count(lit(1)).over(whole))
      .where(col("__rn") > (page - 1) * pageSize && col("__rn") <= page * pageSize)
      .drop("__rn")
  }
}
