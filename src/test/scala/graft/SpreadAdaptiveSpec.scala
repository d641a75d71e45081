package graft

import org.apache.spark.sql.functions._
import graft.core.Tables

/** r21 optimization pins: the scale-adaptive widening and the probe
  * -geometry clamp.
  *
  *  - [[Tables.spreadIfNarrow]] must widen a single-split (narrow)
  *    input to the session parallelism — the small-file bench case —
  *    and must be a NO-OP (no exchange) on an input already at or
  *    above it, which is the 100 TB case where the old unconditional
  *    `repartition(parallelism)` forced a full-corpus shuffle.
  *  - [[graft.operators.Similarity.adaptiveLshProbeGeometry]] must
  *    compute a geometry (not throw) when poolSize and maxFlips both
  *    exceed `bits` (the r20 advisor's clamp finding).
  */
class SpreadAdaptiveSpec extends SparkSpec {

  test("spreadIfNarrow widens a narrow input to the session parallelism") {
    val narrow = spark.range(0, 1000).toDF("id").coalesce(1)
    val out = Tables.spreadIfNarrow(narrow)
    assert(out.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    assert(out.count() == 1000L)
  }

  test("spreadIfNarrow is a no-op on an already-wide scan (no exchange)") {
    val target = spark.sparkContext.defaultParallelism
    // a wide LEAF input (the 100 TB-scan shape: many splits, no
    // upstream shuffle) — probed and left alone
    val wide = spark.range(0, 1000, 1, target * 4).toDF("id")
    val out = Tables.spreadIfNarrow(wide)
    // partition count preserved — the old form would have REDUCED it
    // to `target` through a fresh round-robin exchange
    assert(out.rdd.getNumPartitions == target * 4)
    // plan object unchanged: no repartition node was added at all
    assert(out eq wide)
  }

  test("spreadIfNarrow keeps the unconditional widening above a shuffle") {
    // a plan containing an exchange cannot be partition-probed without
    // executing it (AQE materializes its stages) — those keep the
    // pre-r21 behavior: one round-robin widening, parallelism-neutral
    val target = spark.sparkContext.defaultParallelism
    val shuffled = spark.range(0, 1000).toDF("id")
      .groupBy((col("id") % 7).as("k")).count()
    val out = Tables.spreadIfNarrow(shuffled)
    assert(out.rdd.getNumPartitions == target)
    assert(out.count() == 7L)
  }

  test("adaptiveLshProbeGeometry clamps flips to the clamped pool") {
    import spark.implicits._
    // bits = 4 < poolSize = 8, maxFlips = 6 > bits: pre-fix this threw
    // probeCapacity's `maxFlips <= poolSize` require (f was clamped to
    // poolSize, not to the bits-clamped pool)
    val corpus = (0L until 64L).map(i => (i, i % 2)).toDF("vec_id", "label")
    val (np, p, f) = graft.operators.Similarity.adaptiveLshProbeGeometry(
      corpus, col("label") === 0, bits = 4, baseNprobe = 1,
      poolSize = 8, maxFlips = 6)
    assert(p <= 4 && f <= p && np >= 1)
  }
}
