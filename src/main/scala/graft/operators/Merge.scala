package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Upsert / replace-all-sync semantics on plain DataFrames
  * (SURVEY.md §2.1 K6, §2.3 J2/J3).
  *
  * The reference upserts row-at-a-time (`updateOrCreate`,
  * PublicApiController.php:158-167; BolApiController.php:332-401). The
  * set-based equivalent is a keyed MERGE:
  *   upsert      = updates ∪ (existing ⟕anti updates)
  *   replaceAll  = incoming, plus the delete-set (existing ⟕anti incoming)
  *
  * Scale notes: both sides shuffle on the natural key once; with the target
  * table bucketed/partitioned by the key (SURVEY §7.4.6 — partition by
  * fiscal_year/date), only affected partitions need rewriting. When `updates`
  * is small (an incremental batch) Spark broadcasts it in the anti-join
  * automatically under AQE; the big `existing` side never shuffles. */
object Merge {

  /** J3/K6 keyed upsert: rows from `updates` win over `existing` on `keys`;
    * unmatched existing rows are kept. Columns are aligned by name. */
  def upsert(existing: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val kept = existing.join(updates.select(keys.map(col): _*).distinct(),
      keys, "left_anti")
    kept.unionByName(updates.select(existing.columns.map(col): _*))
  }

  /** J2 replace-all sync: returns (synced, deleted) — `synced` is the new
    * table state (incoming replaces everything for matched keys; existing
    * keys absent from incoming are dropped), `deleted` is the drop-set the
    * reference logs before deleting (BolApiController.php:233-246,288-300). */
  def replaceAllSync(existing: DataFrame, incoming: DataFrame,
                     keys: Seq[String]): (DataFrame, DataFrame) = {
    val deleted = existing.join(incoming.select(keys.map(col): _*).distinct(),
      keys, "left_anti")
    (incoming, deleted)
  }

  /** J2 scoped replace-all sync: deletes apply only WITHIN the parent keys
    * present in `incoming` — the reference's actual shape: a sync payload
    * for one company replaces that company's directors
    * (BolApiController.php:233-246) or its fiscal years (:405-409) and
    * leaves every other company untouched.
    *
    * Returns (synced, deleted): for in-scope parents the new state is
    * exactly `incoming`; out-of-scope existing rows pass through; `deleted`
    * is the in-scope drop-set. Scale: the scope semi/anti joins broadcast
    * the (small) incoming parent-key set; with the table partitioned by a
    * scope key only affected partitions rewrite. */
  def replaceAllSyncScoped(existing: DataFrame, incoming: DataFrame,
                           scopeKeys: Seq[String],
                           keys: Seq[String]): (DataFrame, DataFrame) = {
    val parents = incoming.select(scopeKeys.map(col): _*).distinct()
    val inScope  = existing.join(parents, scopeKeys, "left_semi")
    val outScope = existing.join(parents, scopeKeys, "left_anti")
    val fullKeys = (scopeKeys ++ keys).distinct
    val deleted = inScope.join(
      incoming.select(fullKeys.map(col): _*).distinct(), fullKeys, "left_anti")
    val synced = outScope.unionByName(
      incoming.select(existing.columns.map(col): _*))
    (synced, deleted)
  }
}
