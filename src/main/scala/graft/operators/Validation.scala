package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** F6 row-level validation with a reject channel (SURVEY.md §2.2).
  *
  * The reference validates per-row and classifies failures
  * (ImportInvoiceReport.php:95-104,169-190; error taxonomy :199-253). The
  * set-based design: evaluate every rule as a predicate column, keep valid
  * rows on the fast path, route failures (with the list of failed rules) to
  * a side output. Counters come from `observe()` — no second pass, no
  * driver-side loop; the metrics ride along with the action that writes the
  * valid rows. */
object Validation {

  /** A named validation rule: `pred` must be true for a row to be valid. */
  final case class Rule(name: String, pred: Column)

  def notNull(c: String): Rule = Rule(s"${c}_not_null", col(c).isNotNull)
  def numeric(c: String): Rule =
    Rule(s"${c}_numeric", col(c).isNull || col(c).cast("double").isNotNull)
  def dateYmd(c: String): Rule =
    Rule(s"${c}_date", col(c).isNull || try_to_timestamp(col(c), lit("yyyy-MM-dd")).isNotNull)
  def matches(c: String, pattern: String): Rule =
    Rule(s"${c}_format", col(c).isNull || col(c).rlike(pattern))

  /** Split `df` into (valid, rejects). `rejects` carries a `_failed_rules`
    * array naming every violated rule — the bulk equivalent of the
    * reference's per-row error taxonomy. */
  def split(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val failed = array_compact(array(rules.map(r =>
      when(!coalesce(r.pred, lit(false)), lit(r.name))): _*))
    val tagged = df.withColumn("_failed_rules", failed)
    val valid   = tagged.where(size(col("_failed_rules")) === 0).drop("_failed_rules")
    val rejects = tagged.where(size(col("_failed_rules")) > 0)
    (valid, rejects)
  }

  /** Attach live counters (rows seen / rows invalid) to a plan via
    * `observe` — read them from the QueryExecutionListener or
    * `Observation` after the action completes. */
  def observed(df: DataFrame, rules: Seq[Rule], name: String = "validation"): DataFrame = {
    val anyFail = rules.map(r => !coalesce(r.pred, lit(false))).reduce(_ || _)
    df.observe(name, count(lit(1)).as("rows_seen"),
      sum(when(anyFail, 1L).otherwise(0L)).as("rows_invalid"))
  }

  /** Data-quality census: per-column row/null/distinct counts in ONE
    * aggregation (exact distincts expand the scan n_cols ways — the
    * standard profiling trade; swap in approx_count_distinct when a
    * 100 TB census only needs estimates). The single result row unpivots
    * into one row per column, all-BIGINT so the profile is engine- and
    * type-agnostic. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"__nn_$c"),
      countDistinct(col(c)).as(s"__nd_$c")))
    val full = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val entries = cols.map(c => struct(
      lit(c).as("col_name"),
      col("__n").as("n_rows"),
      (col("__n") - col(s"__nn_$c")).as("n_null"),
      col(s"__nd_$c").as("n_distinct")))
    full.select(explode(array(entries: _*)).as("p")).select("p.*")
  }

  /** Schema-drift detection for semi-structured feeds: the per-group key
    * inventory of an old batch full-outer-joined against a new batch's,
    * classifying each (group, key) as added / removed / stable. The
    * reference guards against exactly this drift by introspecting the
    * live table schema and intersecting incoming keys with it per batch
    * (`ImportInvoiceReport.php:59-65,149-152`); this is the monitoring
    * view of the same concern — what changed between feeds, before the
    * importer silently drops it.
    *
    * Scale shape: the wide exchange carries (group, key, count) rows
    * after map-side combine — key inventories, never payloads; the
    * full-outer join runs on inventory-sized tables (|groups| × |keys|).
    * Presence COUNTS ride along so partial drift (a key present in only
    * half the new batch) is visible, not just binary presence. */
  /** Referential-integrity audit over declared FK relationships: per
    * relationship, the child row count and the orphan count (child keys
    * with no parent — a left-anti join, the F11/J1 existence guard
    * inverted into a metric). `orphan_key_sum` rides along as a cheap
    * content witness so two runs finding "5 orphans" can be compared.
    * Each relationship costs one anti-join on its key — the parent side
    * is distinct-projected first, so the join input is key-sized. */
  def fkAudit(rels: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame =
    rels.map { case (name, child, fk, parent, pk) =>
      val c = child.select(col(fk).cast("long").as("k")).where(col("k").isNotNull)
      val orphans = c.join(parent.select(col(pk).cast("long").as("k")).distinct(),
        Seq("k"), "left_anti")
      c.agg(count(lit(1)).as("n_child")).crossJoin(
        orphans.agg(count(lit(1)).as("n_orphans"),
          coalesce(sum("k"), lit(0L)).cast("long").as("orphan_key_sum")))
        .select(lit(name).as("relationship"), col("n_child"),
          col("n_orphans"), col("orphan_key_sum"))
    }.reduce(_ unionByName _)

  def jsonKeyDrift(oldBatch: DataFrame, newBatch: DataFrame,
                   groupCols: Seq[String], jsonCol: String): DataFrame = {
    import org.apache.spark.sql.types.{MapType, StringType}
    def inventory(df: DataFrame): DataFrame =
      df.select(groupCols.map(col) :+
          explode(map_keys(from_json(col(jsonCol),
            MapType(StringType, StringType)))).as("key"): _*)
        .groupBy((groupCols :+ "key").map(col): _*)
        .agg(count(lit(1)).as("n"))
    val keys = groupCols :+ "key"
    inventory(oldBatch).withColumnRenamed("n", "n_old")
      .join(inventory(newBatch).withColumnRenamed("n", "n_new"), keys, "full_outer")
      .select(keys.map(col) :+
        coalesce(col("n_old"), lit(0L)).as("n_old") :+
        coalesce(col("n_new"), lit(0L)).as("n_new"): _*)
      .withColumn("status",
        when(col("n_old") === 0, lit("added"))
          .when(col("n_new") === 0, lit("removed"))
          .otherwise(lit("stable")))
  }
}
