package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The box-speed canary: a fixed pure-CPU codegen job whose seconds move
  * with host load/CPU weather and with NOTHING this repo changes — no
  * I/O, no graft code — so its cur/prev ratio across two artifacts
  * isolates box drift from code drift (see [[graft.Bench.driftEstimate]]).
  *
  * Round-11 rework: the previous canary ended in a global aggregate whose
  * final exchange made it CONF-SENSITIVE in practice (the round-10 width
  * harness read the wide-512 arms' canaries at 3.3–5.8 s vs the narrow
  * arms' 1.3–1.7 s — the instrument moved with the very
  * `spark.sql.shuffle.partitions` under test, falsifying the "identical
  * bytecode, box-only by construction" claim across conf changes). This
  * one is exchange-free by construction: range → xxhash64 projection →
  * noop sink. No aggregate, no shuffle, no node whose width follows any
  * session conf — `CanarySpec` pins the executed plan as exchange-free
  * and byte-identical under 64 vs 512 shuffle partitions.
  *
  * Comparability contract: seconds are comparable across runs only at
  * the same executor-thread count (`SPARK_GRAFT_CPUS`) AND the same
  * canary generation — artifacts record [[Kind]] and the gate refuses to
  * ratio canaries of different kinds (an old agg-based `canary_sec`
  * against this one would read the implementation change as box drift).
  */
object Canary {

  /** Canary generation tag recorded in bench artifacts. Bump whenever
    * the canary's WORK changes — cur/prev ratios are only meaningful
    * within one generation. (Unversioned artifacts are the round-10
    * agg-based canary.) */
  val Kind = "xxhash_noop_v2"

  /** Default work: 2e9 xxhash64 evaluations over a fixed 32-way range
    * split (≈0.5–1.5 s on this box at 32 threads) — identical to the
    * round-10 canary's work term so the magnitude stays familiar, minus
    * its aggregate. */
  val DefaultRows: Long = 2000000000L

  /** The canary plan: range → xxhash64 projection. Exposed (rather than
    * inlined in [[seconds]]) so specs can assert the executed plan
    * contains no exchange under any shuffle-width conf. */
  def frame(spark: SparkSession, rows: Long = DefaultRows): DataFrame =
    spark.range(0L, rows, 1, 32)
      .select(org.apache.spark.sql.functions.expr("xxhash64(id)").as("h"))

  /** Wall seconds for one canary run, consumed through the noop sink
    * (rows are materialized and discarded; nothing is exchanged or
    * collected beyond the commit message). */
  def seconds(spark: SparkSession, rows: Long = DefaultRows): Double = {
    val t0 = System.nanoTime()
    frame(spark, rows).write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }
}
