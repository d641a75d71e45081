package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classic warehouse / product-analytics operators the reference's
  * ETL layer would grow into: slowly-changing-dimension history,
  * changelog (CDC) application, sweep-line interval coverage, cohort
  * retention, funnel conversion, and rows-bounded moving aggregates.
  *
  * Every operator is one-or-two keyed shuffles on the entity key —
  * no per-group state ever leaves the executors, no driver loops —
  * so each plan survives a 1000-executor / 100 TB deployment
  * unchanged: the shuffle volume is O(rows) with short keys, and the
  * per-key window state is bounded by a single entity's history.
  */
object Warehouse {

  /** SCD Type-2 history build: collapse an ordered change stream into
    * versioned (eff_from, eff_to] rows per key, one row per value
    * change, open-ended current row.
    *
    * Plan: one hash exchange on `keyCol`; the change-detect lag, the
    * eff_to lead and the version row_number all share the same
    * (partitioning, ordering), so Catalyst plans a single
    * Exchange+Sort reused by every window. (`tieCol` makes the order
    * total — same-timestamp changes stay deterministic.) */
  def scd2(df: DataFrame, keyCol: String, attrCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val changed = df
      .select(col(keyCol), col(attrCol).as("attr"), col(tsCol).as("eff_from"),
        col(tieCol).as("_tie"))
      .withColumn("_prev", lag(col("attr"), 1).over(
        Window.partitionBy(keyCol).orderBy(col("eff_from"), col("_tie"))))
      .filter(col("_prev").isNull || col("_prev") =!= col("attr"))
    val wVer = Window.partitionBy(keyCol).orderBy(col("eff_from"), col("_tie"))
    // open rows close at the classic SCD2 sentinel, not NULL — sorts,
    // range-joins ("as of T") and engine hash comparisons all stay
    // total without null-handling special cases
    val sentinel = lit("9999-12-31 00:00:00").cast("timestamp")
    changed
      .withColumn("eff_to",
        coalesce(lead(col("eff_from"), 1).over(wVer), sentinel))
      .withColumn("version", row_number().over(wVer))
      .withColumn("is_current", col("eff_to") === sentinel)
      .drop("_prev", "_tie")
  }

  /** Apply a CDC changelog (upserts + deletes) onto a base snapshot —
    * the MERGE INTO / table-format compaction primitive. Latest
    * `seqCol` wins per key; op 'D' removes the row, anything else
    * upserts `payload` columns (insert when the key is absent from
    * base).
    *
    * Plan: one window on the changelog (keyed, tiny state) + one
    * full-outer shuffle join on the key — at scale the changelog side
    * is a small fraction of base, and AQE picks the join strategy. */
  def cdcApply(base: DataFrame, changes: DataFrame, keyCol: String,
      seqCol: String, opCol: String, payloadCols: Seq[String]): DataFrame = {
    val wLatest = Window.partitionBy(keyCol)
      .orderBy(desc(seqCol))
    val latest = changes
      .withColumn("_rn", row_number().over(wLatest))
      .filter(col("_rn") === 1)
      .select(col(keyCol) +: col(opCol).as("_op") +:
        payloadCols.map(c => col(c).as(s"_c_$c")): _*)
    base.join(latest, Seq(keyCol), "full_outer")
      .filter(col("_op").isNull || col("_op") =!= "D")
      .select(
        col(keyCol) +:
          payloadCols.map(c => coalesce(col(s"_c_$c"), col(c)).as(c)) :+
          coalesce(col("_op"), lit("base")).as("src"): _*)
  }

  /** Total covered time per key from possibly-overlapping half-open
    * integer intervals [startCol, endCol) — the sweep-line union. The
    * +1/−1 endpoint deltas collapse per (key, t), a keyed running sum
    * gives the active count, and gaps where active > 0 sum to the
    * union length. Exact integer arithmetic end-to-end.
    *
    * Plan: one groupBy(key, t) partial-agg shuffle + one keyed window
    * sharing the key — per-key state is the sorted endpoint list,
    * bounded by that key's own event count. */
  def intervalCoverage(df: DataFrame, keyCol: String,
      startCol: Column, endCol: Column): DataFrame = {
    val iv = df.select(col(keyCol), startCol.cast("long").as("_s"),
      endCol.cast("long").as("_e"))
    val pts = iv.select(col(keyCol),
      explode(array(
        struct(col("_s").as("t"), lit(1L).as("d")),
        struct(col("_e").as("t"), lit(-1L).as("d")))).as("p"))
      .select(col(keyCol), col("p.t").as("t"), col("p.d").as("d"))
    val byT = pts.groupBy(col(keyCol), col("t")).agg(sum(col("d")).as("delta"))
    val w = Window.partitionBy(keyCol).orderBy(col("t"))
    val swept = byT
      .withColumn("active", sum(col("delta")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("gap", lead(col("t"), 1).over(w) - col("t"))
    val covered = swept.groupBy(col(keyCol))
      .agg(sum(when(col("active") > 0, col("gap")).otherwise(0L))
        .cast("long").as("covered_sec"))
    val counts = iv.groupBy(col(keyCol)).agg(count(lit(1)).as("n_intervals"))
    covered.join(counts, Seq(keyCol))
  }

  /** Cohort retention: cohort = ISO week of each user's first event,
    * cell = distinct users from that cohort active in week
    * cohort + offset. Exact date arithmetic (week-truncated dates
    * differ by multiples of 7 days).
    *
    * Plan: user-keyed min-agg, user-keyed join back (both sides
    * partition on the user key — one exchange each), then a
    * (cohort, offset)-keyed distinct-count — cohort×offset cells are
    * tiny regardless of corpus size. */
  def cohortRetention(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val first = df.groupBy(col(userCol))
      .agg(min(col(tsCol)).as("_first_ts"))
      .withColumn("cohort_week", date_trunc("week", col("_first_ts")).cast("date"))
      .select(col(userCol), col("cohort_week"))
    df.select(col(userCol), date_trunc("week", col(tsCol)).cast("date").as("_wk"))
      .join(first, Seq(userCol))
      .withColumn("week_offset",
        (datediff(col("_wk"), col("cohort_week")) / 7).cast("int"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** Ordered funnel conversion: users reaching stage k must emit
    * stage k's event STRICTLY AFTER their first stage-(k−1) event.
    * Returns one row per stage with the surviving user count.
    *
    * Plan: per stage one filtered user-keyed min-agg joined to the
    * previous stage's result on the user key — k stages = k short
    * keyed shuffles over progressively shrinking sets; no windows, no
    * per-user event lists. */
  def funnelCounts(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    var reached = df.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))
    def stageCount(idx: Int, name: String, r: DataFrame): DataFrame =
      r.agg(count(lit(1)).as("n_users"))
        .select(lit(idx).as("stage_idx"), lit(name).as("stage"), col("n_users"))
    var out = stageCount(1, stages.head, reached)
    stages.zipWithIndex.drop(1).foreach { case (stage, i) =>
      reached = df.filter(col(typeCol) === stage)
        .join(reached.select(col(userCol), col("_t").as("_prev_t")), Seq(userCol))
        .filter(col(tsCol) > col("_prev_t"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))
      out = out.unionByName(stageCount(i + 1, stage, reached))
    }
    out
  }

  /** Per-key ordered event sequence ("user history") — the
    * sequence-model training-prep shape: all of a key's events
    * gathered into one deterministically-ordered list (ts, then tie
    * key), rendered as a delimited string. collect_list runs as
    * ObjectHashAggregate with map-side partials, so the single
    * shuffle carries O(rows) keyed by user and per-key state is one
    * user's own history — the bounded-entity assumption every
    * sequence featurizer makes.
    *
    * The sort happens INSIDE each group after aggregation
    * (sort_array on (ts, tie, value) structs) — no global sort, no
    * window. */
  def eventHistory(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: Column): DataFrame =
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        concat_ws("|",
          transform(
            sort_array(collect_list(struct(col(tsCol), col(tieCol),
              valueCol.as("_v")))),
            x => x.getField("_v"))).as("history"))

  /** Time-weighted average per key: each observation's value holds
    * until the next observation, TWA = Σ(vᵢ·dtᵢ)/Σdtᵢ (last point
    * carries no interval). The products accumulate as exact BIGINT
    * cents×seconds — no float running sums — and only the final
    * division is floating point (rounded 6dp, engine-agreed).
    *
    * Plan: one keyed window (lead) + one keyed partial agg, both on
    * `keyCol` — a single Exchange+Sort feeds both. Zero-span series
    * (all points at one instant) yield a NULL average, never a
    * divide-by-zero (ANSI mode throws on those). */
  def timeWeightedAvg(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: Column): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val spans = df
      .select(col(keyCol), col(tsCol), col(tieCol),
        floor(valueCol * 100 + 0.5).cast("long").as("_cents"))
      .withColumn("_dt",
        unix_timestamp(lead(col(tsCol), 1).over(w)) - unix_timestamp(col(tsCol)))
      .filter(col("_dt").isNotNull)
    spans.groupBy(col(keyCol))
      .agg(sum(col("_cents") * col("_dt")).cast("long").as("_num"),
        sum(col("_dt")).cast("long").as("total_sec"))
      .select(col(keyCol),
        when(col("total_sec") > 0,
          round(col("_num").cast("double") / col("total_sec"), 6))
          .as("twa_cents"),
        col("total_sec"))
  }

  /** 2-D skyline (Pareto frontier), both dimensions minimized: a
    * point survives iff no other point is ≤ in both dims and < in at
    * least one. Classic distributed shape: (1) per-partition prune —
    * after an in-partition (x, y) sort, a single running-min scan
    * keeps only that partition's frontier (dominated points can never
    * rejoin the global frontier); (2) the survivors — O(parts ·
    * frontier) rows, frontier ~ O(log n) on random data — go through
    * one small global ordered scan. The full-data stages are one
    * distinct shuffle + an in-partition sort; only frontier
    * candidates reach the single-partition window.
    *
    * Duplicate points are collapsed first so "q dominates p" can be
    * decided by the prefix-min alone: after distinct, prev-min ≤ y
    * implies a strictly-dominating predecessor. */
  def skyline2D(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pts = df.select(xCol.cast("double").as("x"), yCol.cast("long").as("y"))
      .distinct()
    val local = pts.sortWithinPartitions("x", "y").as[(Double, Long)]
      .mapPartitions { it =>
        var best = Long.MaxValue
        it.flatMap { case (x, y) =>
          if (y < best) { best = y; Iterator.single((x, y)) } else Iterator.empty
        }
      }.toDF("x", "y")
    val w = Window.orderBy("x", "y")
      .rowsBetween(Window.unboundedPreceding, -1)
    local.withColumn("_pm", min(col("y")).over(w))
      .filter(col("_pm").isNull || col("y") < col("_pm"))
      .select(col("x"), col("y"))
  }

  /** Per-user furthest funnel stage reached (same strict-order
    * semantics as [[funnelCounts]], returning the per-user stage
    * index instead of aggregate counts — 0 = never entered). Users
    * come from `df` itself, so the left joins keep non-entrants. */
  def funnelStage(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    var reached = df.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))
    var levels = List(reached.select(col(userCol), lit(1).as("_stage")))
    stages.zipWithIndex.drop(1).foreach { case (stage, i) =>
      reached = df.filter(col(typeCol) === stage)
        .join(reached.select(col(userCol), col("_t").as("_prev_t")), Seq(userCol))
        .filter(col(tsCol) > col("_prev_t"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))
      levels = reached.select(col(userCol), lit(i + 1).as("_stage")) :: levels
    }
    val users = df.select(col(userCol)).distinct()
    users.join(
      levels.reduce(_ unionByName _)
        .groupBy(col(userCol)).agg(max(col("_stage")).as("funnel_stage")),
      Seq(userCol), "left")
      .select(col(userCol),
        coalesce(col("funnel_stage"), lit(0)).as("funnel_stage"))
  }

  /** Per-key ordinary-least-squares trend (slope + intercept) in
    * closed form from five exact sums: slope = (nΣxy − ΣxΣy)/(nΣx² −
    * (Σx)²), intercept = (ΣyΣx² − ΣxΣxy)/(same denominator). The
    * inputs quantize to integers (x = epoch seconds − `xOffset`, y =
    * cents), per-row products stay within long range (bounded x·y),
    * and the SUMS accumulate as DECIMAL(38,0) — exact in any order
    * and any engine, with 100 TB of rows of headroom where a BIGINT
    * sum of squares would overflow past ~10⁶ rows × (10⁶s window)².
    *
    * Precision contract (the real bound is the closed-form PRODUCTS,
    * not the sums): n·Σx², (Σx)², Σy·Σx² etc. are DECIMAL(38,0)
    * arithmetic too, so exactness requires n²·X·max(X,Y) < 10³⁸ for
    * |x| ≤ X, |y_cents| ≤ Y — e.g. a 10⁶-second x-window and
    * 10⁹-cent values still allow ~10¹¹ rows PER KEY. Past that the
    * products overflow: ANSI mode (Spark 4 default) throws loudly;
    * legacy mode would NULL the fit while a HUGEINT engine keeps
    * going. For wider windows, rebase `xOffset` per window (shrinking
    * X is quadratic relief) before reaching for a mean-centered
    * two-pass form, which would cost a second shuffle.
    *
    * Only the final two divisions are floating point (correctly
    * rounded int→double conversions + one IEEE division, identical
    * everywhere; 6dp rounding at the edge). Degenerate keys (all x
    * equal) yield NULL slope/intercept, never a divide-by-zero.
    *
    * Plan: ONE partial-agg shuffle keyed by `keyCol` — map-side
    * combine reduces every partition to five numbers per key, the
    * textbook "aggregate then solve in closed form" regression shape
    * (no iteration, no matrix, no second pass). */
  def groupedOls(df: DataFrame, keyCol: String, xCol: Column, yCol: Column,
      xOffset: Long): DataFrame = {
    val x = (xCol.cast("long") - xOffset)
    val y = floor(yCol * 100 + 0.5).cast("long")
    val dec = "decimal(38,0)"
    val g = df
      .select(col(keyCol), x.as("_x"), y.as("_y"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col("_x").cast(dec)).as("_sx"),
        sum(col("_y").cast(dec)).as("_sy"),
        sum((col("_x") * col("_y")).cast(dec)).as("_sxy"),
        sum((col("_x") * col("_x")).cast(dec)).as("_sxx"))
    val den = col("n") * col("_sxx") - col("_sx") * col("_sx")
    val slopeNum = col("n") * col("_sxy") - col("_sx") * col("_sy")
    val interNum = col("_sy") * col("_sxx") - col("_sx") * col("_sxy")
    g.select(col(keyCol), col("n"),
      when(den =!= 0,
        round(slopeNum.cast("double") / den.cast("double"), 6))
        .as("slope_cents_per_sec"),
      when(den =!= 0,
        round(interNum.cast("double") / den.cast("double"), 6))
        .as("intercept_cents"))
  }

  /** Rows-bounded moving aggregate + quartile bucketing per key:
    * 3-row moving sum over cents-quantized values (exact BIGINT — no
    * float accumulation order to disagree on) and ntile(4) position
    * buckets, both over the same deterministic (ts, tie) total order.
    *
    * Plan: every window shares one (key, order) pair — single
    * Exchange+Sort; per-row state is a 3-element frame. */
  def movingAgg(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: Column): DataFrame = {
    val ord = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val frame = ord.rowsBetween(-2, Window.currentRow)
    df.select(col(tieCol), col(keyCol), col(tsCol),
      floor(valueCol * 100 + 0.5).cast("long").as("_cents"))
      .withColumn("mov_sum_c", sum(col("_cents")).over(frame))
      .withColumn("mov_n", count(lit(1)).over(frame))
      .withColumn("quartile", ntile(4).over(ord))
      .drop("_cents", tsCol)
  }
}
