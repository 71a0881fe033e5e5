package graft

import org.apache.spark.sql.functions._

/** Plan-shape audit over the whole query suite: the properties that make
  * a plan survive a 100× scale-up are asserted here as invariants, so a
  * refactor that silently loses a pushdown or introduces an all-pairs
  * join fails CI, not the cluster.
  *
  * Queries whose builder runs machinery (streaming drains, sink
  * round-trips, upserts) return materialized results — their final plans
  * are local scans and the assertions hold trivially; the cost of
  * building them here is the machinery itself, so they are skipped to
  * keep the suite fast (each has its own oracle gate + spec). */
class PlanAuditSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  // machinery queries: building the DataFrame executes work (streaming
  // drain / sink write / upsert); plan-shape asserts add nothing there
  private val machinery = Set(
    "q22_merge_upsert", "q33_stream_tumbling", "q36_dbd_financial_pipeline",
    "q43_company_financial", "q50_stream_sliding", "q51_stream_sessions",
    "q68_csv_sink_roundtrip", "q70_stream_interval_join",
    "q121_stream_hll_window", "q129_orc_sink_roundtrip",
    "q130_stream_static_enrich", "q133_stream_outer_join",
    "q145_bucketed_join", "q150_incremental_agg", "q151_stream_cdc_apply",
    "q157_stream_semi_join", "q202_partition_pruned_read")

  private lazy val plans: Map[String, String] =
    SparkEntry.queries.filterNot(q => machinery(q._1)).map { case (name, fn) =>
      name -> fn(spark, d).queryExecution.executedPlan.toString
    }

  test("no unbounded cartesian product anywhere in the suite") {
    val offenders = plans.collect {
      case (name, plan) if plan.contains("CartesianProduct") => name
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("single-row cross joins stay broadcast, never shuffled") {
    // every crossJoin in the suite is a single-row aggregate or snippet:
    // it must appear as BroadcastNestedLoopJoin, whose build side is tiny
    val shuffledCross = plans.collect {
      case (name, plan)
        if plan.contains("CartesianProduct") ||
           plan.contains("ShuffledNestedLoop") => name
    }
    assert(shuffledCross.isEmpty, s"non-broadcast cross joins in: $shuffledCross")
  }

  test("filters reach the parquet scan (pushdown spot checks)") {
    // plan.toString truncates long FileScan lines before PushedFilters;
    // DataFilters on the scan node carries the same signal
    val q01 = plans("q01_pricing_summary")
    assert(q01.contains("DataFilters: [isnotnull(l_shipdate"),
      "q01 lost the l_shipdate scan pushdown")
    val q12 = plans("q12_big_orders_no_deep_discount")
    assert(q12.contains("DataFilters: [isnotnull(l_discount") ||
           q12.contains("DataFilters: [isnotnull(o_totalprice"),
      "q12 lost its scan pushdowns")
  }

  test("column pruning: wide tables are never scanned in full") {
    // q02 touches lineitem(3 cols of 16): ReadSchema must be a subset
    val q02 = plans("q02_revenue_by_nation")
    val read = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(q02).map(_.group(1)).toList
    assert(read.nonEmpty && read.forall(_.split(",").length <= 6),
      s"q02 reads too many columns: $read")
  }

  test("broadcast joins where a side is dimension-sized") {
    // q02 (TPC-H Q5 family): customer/nation/region ride as broadcasts
    val q02 = plans("q02_revenue_by_nation")
    assert(q02.contains("BroadcastHashJoin"), "q02 lost its dim broadcasts")
    // q110: df + query map broadcast, corpus never broadcast
    val q110 = plans("q110_bm25_topk")
    assert(q110.contains("BroadcastHashJoin"), "q110 lost its broadcast joins")
  }

  test("no ungrouped collect_list anywhere in the suite") {
    // an ungrouped (keys=[]) collect_list materializes its ENTIRE input
    // in one task — the exact shape that OOMs at row cardinality (the
    // round-5 PageRank dangling fold). Grouped collect_lists stay legal:
    // their state is bounded by the group's fan-in (in-degree, basket
    // size), which each operator documents. This is the CI form of that
    // review finding: any refactor reintroducing a global collect_list
    // fails here, not on the cluster.
    val ungrouped = "keys=\\[\\], functions=\\[[^\\]]*collect_list".r
    // SKETCH-WIDTH-bounded digests, explicitly exempt: these global
    // collects fold a table whose size is a pipeline CONSTANT, never the
    // data — q123 digests the 4x1024 CMS counter table, q119 the <=2048
    // -word Bloom mask, q60 the requested year-range dict. The exemption
    // list is asserted EXACTLY, so a new global collect_list (or one of
    // these growing past its bound into a different plan shape) fails.
    val boundedDigests = Set("q60_financial_response",
      "q119_bloom_membership", "q123_cms_frequency")
    val offenders = plans.collect {
      case (name, plan) if ungrouped.findFirstIn(plan).isDefined => name
    }.toSet
    assert(offenders == boundedDigests,
      s"ungrouped collect_list drift: unexpected ${offenders -- boundedDigests}, " +
        s"stale exemptions ${boundedDigests -- offenders}")
  }

  test("year-partitioned read-back prunes DIRECTORIES, not just row groups") {
    // the q202 shape: a year filter on a partitioned table must land in
    // the scan's PartitionFilters (directory-level pruning — at 100 TB
    // the other years' files are never even listed into tasks), and the
    // partition count read must be exactly the one matching directory
    val dir = java.nio.file.Files.createTempDirectory("graft_prune").toString
    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"), col("l_shipdate"),
        year(col("l_shipdate")).as("ship_year"))
    graft.sources.Sinks.writePartitionedByYear(li, dir, "ship_year")
    val back = spark.read.parquet(dir).where(col("ship_year") === 1995)
      .groupBy("ship_year").agg(count(lit(1)).as("n"))
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(ship_year"),
      s"ship_year filter fell off PartitionFilters:\n$plan")
    assert(!plan.contains("PartitionFilters: []"),
      "scan lists every partition — pruning lost")
    // prune actually excludes the other years' rows
    val total = spark.read.parquet(dir)
      .where(year(col("l_shipdate")) === 1995).count()
    assert(back.collect().map(_.getLong(1)).sum == total)
  }

  test("sketch plans: model sides broadcast, bounded aggregate in place") {
    // q119: the <= 2048-row bloom filter must ride as a broadcast into
    // the probe join — the corpus side never shuffles for the probe
    val q119 = plans("q119_bloom_membership")
    assert(q119.contains("BroadcastHashJoin"), "q119 bloom probe lost its broadcast")
    // q113: the boilerplate line set is a broadcast anti-probe
    val q113 = plans("q113_line_boilerplate")
    assert(q113.contains("BroadcastHashJoin"), "q113 boiler set lost its broadcast")
    // q118: the KMV sketches must come from the bounded-state custom
    // aggregate (object-hash path), not a window/distinct fallback
    val q118 = plans("q118_kmv_overlap")
    assert(q118.contains("bounded_min_k"), "q118 lost the BoundedMinK aggregate")
    assert(q118.contains("ObjectHashAggregate"),
      "q118 BoundedMinK fell off the object-hash aggregation path")
  }

  test("multi-consumer frames stay materialized (plan fan-out net)") {
    // The round-8 scan-audit regression net: a multi-consumer frame
    // whose upstream subtree Catalyst inlines into every branch re-runs
    // its derivation once per consumer (ReuseExchange only merges
    // identical exchanges). Pinned here are the operator fixes:
    //  - triangleCounts cuts its edge list + oriented ranking (q161's
    //    plan carried 31 same-source scans pre-fix, re-running the
    //    co-occurrence backbone per branch);
    //  - duplicatePassages persists its gram table (tokenize+md5 once);
    //  - applyChangelog cuts the compacted changelog (the row_number
    //    window ran twice pre-fix);
    //  - incrementalNearDupDrops cuts the fresh batch index (the
    //    delivery was re-tokenized per consumer pre-fix).
    def maxSamePath(plan: String): Int = {
      val p = "[\\w./-]+\\.parquet".r.findAllIn(plan).toSeq
      if (p.isEmpty) 0 else p.groupBy(identity).values.map(_.size).max
    }
    val q161 = maxSamePath(plans("q161_triangle_count"))
    assert(q161 <= 6,
      s"q161 re-scans one source $q161 times - triangleCounts lost its cuts (31 pre-fix)")
    assert(plans("q117_dup_passages").contains("InMemoryRelation"),
      "q117 plan has no cache marker - duplicatePassages lost its gram-table persist")
    val q143Windows = "row_number".r.findAllIn(plans("q143_cdc_apply")).length
    assert(q143Windows <= 1,
      s"q143 runs the changelog compaction window $q143Windows times - applyChangelog lost its cut")
    val q140 = maxSamePath(plans("q140_incremental_dedup"))
    assert(q140 <= 8,
      s"q140 re-scans one source $q140 times - the batch-index cut is gone (27 pre-fix)")
  }
}
