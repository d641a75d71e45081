package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{ScaleOps, Warehouse => W}

/** Warehouse / product-analytics query surface (SURVEY §2.9a
  * X77–X85, X87, X90, X93–X94): weighted PPS sampling, interval
  * coverage, SCD2 history + point-in-time lookup, CDC apply, cohort
  * retention, funnel conversion, moving aggregates, time-weighted
  * averages, 2-D skyline, per-user event sequences, and the composed
  * per-user rollup — each hash-verified against a DuckDB oracle
  * running the identical deterministic recurrence (integer cents /
  * epoch-seconds / BIGINT cumsums everywhere a float accumulation
  * order could diverge).
  */
object WarehouseQueries {

  type Q = (SparkSession, String) => DataFrame

  // ---- X77: weighted systematic (PPS) sample over documents ----

  val weightedSample: Q = (s, d) =>
    ScaleOps.weightedSystematicSample(
      Tables.documents(s, d), "doc_id", col("n_chars"), k = 40)

  val weightedSampleSql: String =
    "WITH w AS (SELECT doc_id, n_chars AS w FROM documents), " +
      "c AS (SELECT doc_id, w, CAST(sum(w) OVER (ORDER BY doc_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum FROM w), " +
      "s AS (SELECT CAST(greatest(CAST(sum(w) AS BIGINT) // 40, 1) AS BIGINT) AS stride FROM w) " +
      "SELECT doc_id, w, cum, cum // stride - (cum - w) // stride AS n_hits " +
      "FROM c, s WHERE cum // stride > (cum - w) // stride"

  // ---- X78: sweep-line interval coverage per user ----
  // Interval = [epoch(ts), epoch(ts) + 60 + event_id % 240) seconds —
  // a deterministic synthetic duration, exercised purely for the
  // union-of-overlaps semantics.

  val intervalCover: Q = (s, d) => {
    val start = unix_timestamp(col("ts"))
    W.intervalCoverage(Tables.events(s, d), "user_id",
      start, start + lit(60L) + col("event_id") % 240)
  }

  val intervalCoverSql: String =
    "WITH iv AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS st, " +
      "CAST(floor(epoch(ts)) AS BIGINT) + 60 + (event_id % 240) AS en FROM events), " +
      "pts AS (SELECT user_id, st AS t, 1 AS d FROM iv " +
      "UNION ALL SELECT user_id, en AS t, -1 AS d FROM iv), " +
      "g AS (SELECT user_id, t, sum(d) AS delta FROM pts GROUP BY user_id, t), " +
      "r AS (SELECT user_id, t, sum(delta) OVER (PARTITION BY user_id ORDER BY t " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS active, " +
      "lead(t) OVER (PARTITION BY user_id ORDER BY t) AS nxt FROM g), " +
      "cov AS (SELECT user_id, CAST(sum(CASE WHEN active > 0 THEN nxt - t ELSE 0 END) AS BIGINT) " +
      "AS covered_sec FROM r GROUP BY user_id), " +
      "cnt AS (SELECT user_id, count(*) AS n_intervals FROM iv GROUP BY user_id) " +
      "SELECT cov.user_id, covered_sec, n_intervals FROM cov JOIN cnt ON cov.user_id = cnt.user_id"

  // ---- X79: SCD Type-2 history of each user's event_type ----
  // The declared query emits eff_to as TZ-PROOF epoch-seconds BIGINT
  // (the repo's integer-time convention, cf. X78/X87): round 4's naive
  // TIMESTAMP sentinel was rows-green but hash-red because Spark writes
  // the 9999-12-31 instant as isAdjustedToUTC parquet micros while the
  // oracle literal is naive — whether they render identically depends
  // on the compare environment's session TZ / DuckDB version. Epoch
  // integers compare identically everywhere.

  /** epoch seconds of 9999-12-31 00:00:00 UTC — the open-row sentinel. */
  val SCD2_SENTINEL_EPOCH = 253402214400L

  /** In-operator SCD2 history with timestamp eff_to (pit filters on it);
    * the declared q_scd2 converts eff_to to epoch before emitting. */
  private def scd2Hist(s: SparkSession, d: String): DataFrame =
    W.scd2(Tables.events(s, d), "user_id", "event_type", "ts", "event_id")
      .withColumnRenamed("attr", "status")

  val scd2: Q = (s, d) =>
    scd2Hist(s, d)
      // is_current keys the sentinel branch so the epoch literal never
      // round-trips through a session-TZ-dependent string cast
      .withColumn("eff_to_s",
        when(col("is_current"), lit(SCD2_SENTINEL_EPOCH))
          .otherwise(unix_timestamp(col("eff_to"))))
      .drop("eff_to")

  /** Naive-timestamp history CTE shared by the q_scd2 and q_scd2_pit
    * oracles (DuckDB-internal only — never hash-compared directly). */
  private val scd2HistSql: String =
    "WITH m AS (SELECT user_id, event_type AS attr, ts, event_id, " +
      "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM events), " +
      "ch AS (SELECT user_id, attr, ts AS eff_from, event_id FROM m " +
      "WHERE prev IS NULL OR prev <> attr) " +
      "SELECT user_id, attr AS status, eff_from, " +
      "coalesce(lead(eff_from) OVER (PARTITION BY user_id ORDER BY eff_from, event_id), " +
      "TIMESTAMP '9999-12-31 00:00:00') AS eff_to, " +
      "CAST(row_number() OVER (PARTITION BY user_id ORDER BY eff_from, event_id) AS INT) AS version, " +
      "(lead(eff_from) OVER (PARTITION BY user_id ORDER BY eff_from, event_id) IS NULL) AS is_current " +
      "FROM ch"

  val scd2Sql: String =
    s"SELECT user_id, status, eff_from, version, is_current, " +
      s"CASE WHEN is_current THEN $SCD2_SENTINEL_EPOCH " +
      s"ELSE CAST(floor(epoch(eff_to)) AS BIGINT) END AS eff_to_s FROM ($scd2HistSql)"

  // ---- X79b: point-in-time lookup against the SCD2 history ----
  // "What was every user's status as of T" — the query an SCD2 table
  // exists to answer; ranges tile, so each user yields at most one row.

  val SCD2_PIT_T = "2024-01-15 00:00:00"

  val scd2Pit: Q = (s, d) =>
    scd2Hist(s, d)
      .filter(col("eff_from") <= lit(SCD2_PIT_T).cast("timestamp") &&
        lit(SCD2_PIT_T).cast("timestamp") < col("eff_to"))
      .select(col("user_id"), col("status"), col("eff_from"), col("version"))

  val scd2PitSql: String =
    s"SELECT user_id, status, eff_from, version FROM ($scd2HistSql) " +
      s"WHERE eff_from <= TIMESTAMP '$SCD2_PIT_T' AND TIMESTAMP '$SCD2_PIT_T' < eff_to"

  // ---- X80: CDC changelog apply (MERGE INTO semantics) ----
  // The changelog is derived deterministically from orders itself:
  // keys ≡0 (mod 10) delete, ≡1 get two updates (latest seq wins),
  // ≡2 one update, ≡3 (mod 1000) spawn an insert under a fresh
  // negative key. Exercises delete/upsert/insert + last-writer-wins.

  val cdcApply: Q = (s, d) => {
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    def change(pred: org.apache.spark.sql.Column, seq: Long, op: String,
        price: org.apache.spark.sql.Column, st: org.apache.spark.sql.Column) =
      base.filter(pred).select(col("o_orderkey"), lit(seq).as("seq"),
        lit(op).as("op"), price.as("o_totalprice"), st.as("o_orderstatus"))
    val changes =
      change(col("o_orderkey") % 10 === 0, 1L, "D",
        lit(null).cast("double"), lit(null).cast("string"))
        .unionByName(change(col("o_orderkey") % 10 === 1, 1L, "U",
          col("o_totalprice") + 1.0, lit("U1")))
        .unionByName(change(col("o_orderkey") % 10 === 1, 2L, "U",
          col("o_totalprice") + 2.0, lit("U2")))
        .unionByName(change(col("o_orderkey") % 10 === 2, 1L, "U",
          col("o_totalprice") + 1.0, lit("U1")))
        .unionByName(
          base.filter(col("o_orderkey") % 1000 === 3)
            .select((-col("o_orderkey") - 1).as("o_orderkey"), lit(1L).as("seq"),
              lit("I").as("op"), (col("o_totalprice") / 2).as("o_totalprice"),
              lit("INS").as("o_orderstatus")))
    W.cdcApply(base, changes, "o_orderkey", "seq", "op",
      Seq("o_totalprice", "o_orderstatus"))
  }

  val cdcApplySql: String =
    "WITH base AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders), " +
      "ch AS (" +
      "SELECT o_orderkey, 1 AS seq, 'D' AS op, CAST(NULL AS DOUBLE) AS p, CAST(NULL AS VARCHAR) AS st " +
      "FROM base WHERE o_orderkey % 10 = 0 " +
      "UNION ALL SELECT o_orderkey, 1, 'U', o_totalprice + 1.0, 'U1' FROM base WHERE o_orderkey % 10 = 1 " +
      "UNION ALL SELECT o_orderkey, 2, 'U', o_totalprice + 2.0, 'U2' FROM base WHERE o_orderkey % 10 = 1 " +
      "UNION ALL SELECT o_orderkey, 1, 'U', o_totalprice + 1.0, 'U1' FROM base WHERE o_orderkey % 10 = 2 " +
      "UNION ALL SELECT -o_orderkey - 1, 1, 'I', o_totalprice / 2, 'INS' FROM base WHERE o_orderkey % 1000 = 3), " +
      "latest AS (SELECT * FROM (SELECT *, row_number() OVER " +
      "(PARTITION BY o_orderkey ORDER BY seq DESC) AS rn FROM ch) WHERE rn = 1) " +
      "SELECT coalesce(l.o_orderkey, b.o_orderkey) AS o_orderkey, " +
      "coalesce(l.p, b.o_totalprice) AS o_totalprice, " +
      "coalesce(l.st, b.o_orderstatus) AS o_orderstatus, " +
      "coalesce(l.op, 'base') AS src " +
      "FROM base b FULL OUTER JOIN latest l ON b.o_orderkey = l.o_orderkey " +
      "WHERE l.op IS NULL OR l.op <> 'D'"

  // ---- X81: cohort retention matrix ----

  val cohort: Q = (s, d) =>
    W.cohortRetention(Tables.events(s, d), "user_id", "ts")

  val cohortSql: String =
    "WITH f AS (SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week " +
      "FROM events GROUP BY user_id), " +
      "a AS (SELECT e.user_id, f.cohort_week, CAST(date_trunc('week', e.ts) AS DATE) AS wk " +
      "FROM events e JOIN f ON e.user_id = f.user_id) " +
      "SELECT cohort_week, CAST(date_diff('day', cohort_week, wk) // 7 AS INT) AS week_offset, " +
      "count(DISTINCT user_id) AS n_users FROM a GROUP BY cohort_week, week_offset"

  // ---- X82: ordered funnel conversion ----

  val FUNNEL_STAGES: Seq[String] = Seq("view", "click", "purchase")

  val funnel: Q = (s, d) =>
    W.funnelCounts(Tables.events(s, d), "user_id", "event_type", "ts",
      FUNNEL_STAGES)

  val funnelSql: String =
    "WITH s1 AS (SELECT user_id, min(ts) AS t FROM events WHERE event_type = 'view' GROUP BY user_id), " +
      "s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 ON e.user_id = s1.user_id " +
      "WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY e.user_id), " +
      "s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s2 ON e.user_id = s2.user_id " +
      "WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY e.user_id) " +
      "SELECT 1 AS stage_idx, 'view' AS stage, (SELECT count(*) FROM s1) AS n_users " +
      "UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2) " +
      "UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)"

  // ---- X83: rows-bounded moving aggregate + quartile bucketing ----

  val movingAvg: Q = (s, d) =>
    W.movingAgg(Tables.events(s, d), "user_id", "ts", "event_id", col("value"))

  val movingAvgSql: String =
    "WITH c AS (SELECT event_id, user_id, ts, CAST(floor(value*100 + 0.5) AS BIGINT) AS cents FROM events) " +
      "SELECT event_id, user_id, " +
      "CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
      "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS mov_sum_c, " +
      "count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
      "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov_n, " +
      "CAST(ntile(4) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS quartile " +
      "FROM c"

  // ---- X90: per-user ordered event history ----

  val userHistory: Q = (s, d) =>
    W.eventHistory(Tables.events(s, d), "user_id", "ts", "event_id",
      col("event_type"))

  val userHistorySql: String =
    "SELECT user_id, count(*) AS n_events, " +
      "string_agg(event_type, '|' ORDER BY ts, event_id) AS history " +
      "FROM events GROUP BY user_id"

  // ---- X87: time-weighted average per event_type ----

  val twap: Q = (s, d) =>
    W.timeWeightedAvg(Tables.events(s, d), "event_type", "ts", "event_id",
      col("value"))

  val twapSql: String =
    "WITH c AS (SELECT event_type, ts, event_id, CAST(floor(value*100 + 0.5) AS BIGINT) AS cents FROM events), " +
      "sp AS (SELECT event_type, cents, " +
      "CAST(floor(epoch(lead(ts) OVER (PARTITION BY event_type ORDER BY ts, event_id))) AS BIGINT) " +
      "- CAST(floor(epoch(ts)) AS BIGINT) AS dt FROM c), " +
      "g AS (SELECT event_type, CAST(sum(cents*dt) AS BIGINT) AS num, " +
      "CAST(sum(dt) AS BIGINT) AS total_sec FROM sp WHERE dt IS NOT NULL GROUP BY event_type) " +
      "SELECT event_type, CASE WHEN total_sec > 0 THEN round(CAST(num AS DOUBLE)/total_sec, 6) END AS twa_cents, " +
      "total_sec FROM g"

  // ---- X98: grouped OLS trend per event_type ----
  // x = epoch seconds − 2024-01-01 (fixed offset keeps products in
  // long range), y = value cents; five exact DECIMAL sums → closed
  // form. Oracle: identical integer arithmetic, HUGEINT sums.

  val OLS_X0 = 1704067200L // 2024-01-01 00:00:00 UTC

  val groupOls: Q = (s, d) =>
    W.groupedOls(Tables.events(s, d), "event_type",
      unix_timestamp(col("ts")), col("value"), OLS_X0)

  val groupOlsSql: String =
    s"WITH e AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) - $OLS_X0 AS x, " +
      "CAST(floor(value*100 + 0.5) AS BIGINT) AS y FROM events), " +
      "g AS (SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy, " +
      "sum(x*y) AS sxy, sum(x*x) AS sxx FROM e GROUP BY event_type) " +
      "SELECT event_type, n, " +
      "CASE WHEN n*sxx - sx*sx <> 0 THEN round(CAST(n*sxy - sx*sy AS DOUBLE)/CAST(n*sxx - sx*sx AS DOUBLE), 6) END AS slope_cents_per_sec, " +
      "CASE WHEN n*sxx - sx*sx <> 0 THEN round(CAST(sy*sxx - sx*sxy AS DOUBLE)/CAST(n*sxx - sx*sx AS DOUBLE), 6) END AS intercept_cents " +
      "FROM g"

  // ---- X85: 2-D skyline (Pareto frontier) ----
  // "Cheapest AND earliest" orders: minimize (o_totalprice, order
  // date). Oracle = the same prefix-min scan as one window.

  val skyline: Q = (s, d) =>
    W.skyline2D(Tables.orders(s, d),
      col("o_totalprice"), unix_timestamp(col("o_orderdate")))
      .select(col("x").as("total_price"), col("y").as("order_epoch"))

  val skylineSql: String =
    "WITH pts AS (SELECT DISTINCT o_totalprice AS x, " +
      "CAST(floor(epoch(o_orderdate)) AS BIGINT) AS y FROM orders), " +
      "m AS (SELECT x, y, min(y) OVER (ORDER BY x, y " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm FROM pts) " +
      "SELECT x AS total_price, y AS order_epoch FROM m WHERE pm IS NULL OR y < pm"

  // ---- X94: composed per-user analytics rollup ----
  // The q_curate_full pattern for the analytics tranche: four oracled
  // operators (interval coverage, SCD2 change counting, cohort
  // assignment, funnel staging) composed into ONE wide per-user table
  // and hash-verified end-to-end. Every shuffle is keyed by user_id,
  // so Catalyst co-partitions the joins with the aggregations.

  val userRollup: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val start = unix_timestamp(col("ts"))
    val cov = W.intervalCoverage(ev, "user_id",
      start, start + lit(60L) + col("event_id") % 240)
      .select(col("user_id"), col("covered_sec"))
    val base = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        date_trunc("week", min(col("ts"))).cast("date").as("cohort_week"))
    val changes = W.scd2(ev, "user_id", "event_type", "ts", "event_id")
      .groupBy(col("user_id"))
      .agg(max(col("version")).as("n_status_changes"))
    val stage = W.funnelStage(ev, "user_id", "event_type", "ts",
      FUNNEL_STAGES)
    base.join(cov, Seq("user_id"))
      .join(changes, Seq("user_id"))
      .join(stage, Seq("user_id"))
      .select(col("user_id"), col("n_events"), col("covered_sec"),
        col("cohort_week"), col("n_status_changes"), col("funnel_stage"))
  }

  val userRollupSql: String =
    "WITH iv AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS st, " +
      "CAST(floor(epoch(ts)) AS BIGINT) + 60 + (event_id % 240) AS en FROM events), " +
      "pts AS (SELECT user_id, st AS t, 1 AS d FROM iv " +
      "UNION ALL SELECT user_id, en AS t, -1 AS d FROM iv), " +
      "g AS (SELECT user_id, t, sum(d) AS delta FROM pts GROUP BY user_id, t), " +
      "r AS (SELECT user_id, t, sum(delta) OVER (PARTITION BY user_id ORDER BY t " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS active, " +
      "lead(t) OVER (PARTITION BY user_id ORDER BY t) AS nxt FROM g), " +
      "cov AS (SELECT user_id, CAST(sum(CASE WHEN active > 0 THEN nxt - t ELSE 0 END) AS BIGINT) " +
      "AS covered_sec FROM r GROUP BY user_id), " +
      "base AS (SELECT user_id, count(*) AS n_events, " +
      "CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week FROM events GROUP BY user_id), " +
      "m AS (SELECT user_id, event_type, ts, event_id, " +
      "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM events), " +
      "chg AS (SELECT user_id, CAST(count(*) AS INT) AS n_status_changes FROM m " +
      "WHERE prev IS NULL OR prev <> event_type GROUP BY user_id), " +
      "s1 AS (SELECT user_id, min(ts) AS t FROM events WHERE event_type = 'view' GROUP BY user_id), " +
      "s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 ON e.user_id = s1.user_id " +
      "WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY e.user_id), " +
      "s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s2 ON e.user_id = s2.user_id " +
      "WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY e.user_id) " +
      "SELECT b.user_id, b.n_events, cov.covered_sec, b.cohort_week, " +
      "chg.n_status_changes, " +
      "CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3 WHEN s2.user_id IS NOT NULL THEN 2 " +
      "WHEN s1.user_id IS NOT NULL THEN 1 ELSE 0 END AS INT) AS funnel_stage " +
      "FROM base b JOIN cov ON b.user_id = cov.user_id " +
      "JOIN chg ON b.user_id = chg.user_id " +
      "LEFT JOIN s1 ON b.user_id = s1.user_id " +
      "LEFT JOIN s2 ON b.user_id = s2.user_id " +
      "LEFT JOIN s3 ON b.user_id = s3.user_id"

  val queries: Map[String, Q] = Map(
    "q_group_ols" -> groupOls,
    "q_user_rollup" -> userRollup,
    "q_user_history" -> userHistory,
    "q_twap" -> twap,
    "q_skyline" -> skyline,
    "q_weighted_sample" -> weightedSample,
    "q_interval_cover" -> intervalCover,
    "q_scd2" -> scd2,
    "q_scd2_pit" -> scd2Pit,
    "q_cdc_apply" -> cdcApply,
    "q_cohort" -> cohort,
    "q_funnel" -> funnel,
    "q_moving_avg" -> movingAvg)

  val oracles: Map[String, String] = Map(
    "q_group_ols" -> groupOlsSql,
    "q_user_rollup" -> userRollupSql,
    "q_user_history" -> userHistorySql,
    "q_twap" -> twapSql,
    "q_skyline" -> skylineSql,
    "q_weighted_sample" -> weightedSampleSql,
    "q_interval_cover" -> intervalCoverSql,
    "q_scd2" -> scd2Sql,
    "q_scd2_pit" -> scd2PitSql,
    "q_cdc_apply" -> cdcApplySql,
    "q_cohort" -> cohortSql,
    "q_funnel" -> funnelSql,
    "q_moving_avg" -> movingAvgSql)
}
