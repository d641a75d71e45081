package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.{ScaleOps, Warehouse}

class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // -------------------- SCD2 --------------------

  test("scd2 collapses an ordered change stream into versioned ranges") {
    val ev = Seq(
      (1L, "a", ts("2024-01-01 00:00:00"), 1L),
      (1L, "a", ts("2024-01-02 00:00:00"), 2L), // no change -> absorbed
      (1L, "b", ts("2024-01-03 00:00:00"), 3L),
      (1L, "a", ts("2024-01-04 00:00:00"), 4L), // back to a = NEW version
      (2L, "x", ts("2024-01-05 00:00:00"), 5L))
      .toDF("k", "v", "t", "id")
    val got = Warehouse.scd2(ev, "k", "v", "t", "id")
      .select("k", "attr", "eff_from", "eff_to", "version", "is_current")
      .as[(Long, String, Timestamp, Timestamp, Int, Boolean)]
      .collect().toSet
    val open = ts("9999-12-31 00:00:00")
    assert(got == Set(
      (1L, "a", ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00"), 1, false),
      (1L, "b", ts("2024-01-03 00:00:00"), ts("2024-01-04 00:00:00"), 2, false),
      (1L, "a", ts("2024-01-04 00:00:00"), open, 3, true),
      (2L, "x", ts("2024-01-05 00:00:00"), open, 1, true)))
  }

  test("groupedOls recovers an exact linear trend; degenerate x yields NULL") {
    // key "lin": y = 2.5·x + 10 (in value units) at x = 0, 10, 20 s
    // after the offset → slope = 250 cents/s, intercept = 1000 cents.
    // key "flat": all observations at ONE instant → den = 0 → NULLs.
    val x0 = 1704067200L
    def t(off: Long) = new Timestamp((x0 + off) * 1000L)
    val ev = Seq(
      ("lin", t(0), 10.0), ("lin", t(10), 35.0), ("lin", t(20), 60.0),
      ("flat", t(5), 1.0), ("flat", t(5), 2.0))
      .toDF("k", "ts", "value")
    val got = Warehouse.groupedOls(ev, "k",
      unix_timestamp(col("ts")), col("value"), x0)
      .as[(String, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("lin") == ((3L, Some(250.0), Some(1000.0))))
    assert(got("flat") == ((2L, None, None)))
  }

  test("scd2 ranges tile each key's timeline: contiguous, one open row") {
    val ev = core.Tables.events(spark, "/root/testdata/sf0.001")
    val hist = Warehouse.scd2(ev, "user_id", "event_type", "ts", "event_id")
      .cache()
    // exactly one current row per key
    val keys = ev.select("user_id").distinct().count()
    assert(hist.filter(col("is_current")).count() == keys)
    // every non-current row's eff_to equals the next version's eff_from
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("version")
    val gaps = hist
      .withColumn("_next_from", lead(col("eff_from"), 1).over(w))
      .filter(col("_next_from").isNotNull &&
        col("eff_to") =!= col("_next_from"))
      .count()
    assert(gaps == 0L)
    hist.unpersist()
  }

  // -------------------- CDC apply --------------------

  test("cdcApply: delete drops, latest update wins, insert lands") {
    val base = Seq((1L, 10.0, "s1"), (2L, 20.0, "s2"), (3L, 30.0, "s3"))
      .toDF("k", "price", "st")
    val changes = Seq(
      (1L, 1L, "D", Option.empty[Double], Option.empty[String]),
      (2L, 1L, "U", Some(21.0), Some("u1")),
      (2L, 2L, "U", Some(22.0), Some("u2")), // latest seq wins
      (9L, 1L, "I", Some(90.0), Some("new")))
      .toDF("k", "seq", "op", "price", "st")
    val got = Warehouse.cdcApply(base, changes, "k", "seq", "op",
      Seq("price", "st"))
      .as[(Long, Double, String, String)].collect().toSet
    assert(got == Set(
      (2L, 22.0, "u2", "U"),
      (3L, 30.0, "s3", "base"),
      (9L, 90.0, "new", "I")))
  }

  // -------------------- interval coverage --------------------

  test("intervalCoverage equals brute-force union length") {
    // key 1: [0,10) ∪ [5,15) ∪ [20,25) -> 15 + 5 = 20
    // key 2: [0,3) ∪ [3,6) touching -> 6 (no double count, no gap)
    // key 3: [7,8) nested in [0,10) -> 10
    val iv = Seq(
      (1L, 0L, 10L), (1L, 5L, 15L), (1L, 20L, 25L),
      (2L, 0L, 3L), (2L, 3L, 6L),
      (3L, 0L, 10L), (3L, 7L, 8L))
      .toDF("k", "s", "e")
    val got = Warehouse.intervalCoverage(iv, "k", col("s"), col("e"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 20L, 3L), (2L, 6L, 2L), (3L, 10L, 2L)))
  }

  test("intervalCoverage matches per-second brute force on real events") {
    val ev = core.Tables.events(spark, "/root/testdata/sf0.001")
      .limit(200)
    val start = unix_timestamp(col("ts"))
    val got = Warehouse.intervalCoverage(ev, "user_id",
      start, start + lit(60L) + col("event_id") % 240)
      .select("user_id", "covered_sec")
      .as[(Long, Long)].collect().toMap
    // brute force: explode each interval into its covered seconds,
    // distinct-count per key (small slice only — quadratic blowup)
    val brute = ev
      .select(col("user_id"), start.as("s"),
        (start + lit(60L) + col("event_id") % 240).as("e"))
      .withColumn("sec", explode(sequence(col("s"), col("e") - 1)))
      .groupBy("user_id").agg(countDistinct("sec").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got == brute)
  }

  // -------------------- cohort retention --------------------

  test("cohortRetention: offset-0 cell equals cohort size; users conserved") {
    val ev = core.Tables.events(spark, "/root/testdata/sf0.001")
    val ret = Warehouse.cohortRetention(ev, "user_id", "ts").cache()
    // every user is active in their own first week -> the offset-0
    // diagonal counts each cohort's full population
    val cohortSizes = ev.groupBy("user_id").agg(min("ts").as("f"))
      .withColumn("cohort_week", date_trunc("week", col("f")).cast("date"))
      .groupBy("cohort_week").agg(countDistinct("user_id").as("n"))
      .as[(java.sql.Date, Long)].collect().toMap
    val diag = ret.filter(col("week_offset") === 0)
      .select("cohort_week", "n_users")
      .as[(java.sql.Date, Long)].collect().toMap
    assert(diag == cohortSizes)
    // retention never exceeds the cohort size at any offset
    val over = ret.as[(java.sql.Date, Int, Long)].collect()
      .count { case (cw, _, n) => n > cohortSizes(cw) }
    assert(over == 0)
    ret.unpersist()
  }

  // -------------------- funnel --------------------

  test("funnelCounts: strict-order semantics on a hand case") {
    val ev = Seq(
      (1L, "view", ts("2024-01-01 00:00:00")),
      (1L, "click", ts("2024-01-01 01:00:00")),
      (1L, "purchase", ts("2024-01-01 02:00:00")), // full funnel
      (2L, "click", ts("2024-01-01 00:00:00")),
      (2L, "view", ts("2024-01-01 01:00:00")),     // click BEFORE view: no s2
      (3L, "view", ts("2024-01-01 00:00:00")),
      (3L, "click", ts("2024-01-01 00:00:00")))    // tie is not strictly after
      .toDF("u", "et", "t")
    val got = Warehouse.funnelCounts(ev, "u", "et", "t",
      Seq("view", "click", "purchase"))
      .as[(Int, String, Long)].collect().toSet
    assert(got == Set((1, "view", 3L), (2, "click", 1L), (3, "purchase", 1L)))
  }

  test("funnel stage counts are monotonically non-increasing on real data") {
    val ev = core.Tables.events(spark, "/root/testdata/sf0.001")
    val counts = Warehouse.funnelCounts(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .orderBy("stage_idx").select("n_users").as[Long].collect()
    assert(counts.length == 3)
    assert(counts.sliding(2).forall { case Array(a, b) => b <= a })
  }

  // -------------------- moving aggregate --------------------

  test("movingAgg matches a naive per-key scan") {
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00"), 1.00),
      (2L, 10L, ts("2024-01-01 00:01:00"), 2.00),
      (3L, 10L, ts("2024-01-01 00:02:00"), 3.00),
      (4L, 10L, ts("2024-01-01 00:03:00"), 4.00),
      (5L, 20L, ts("2024-01-01 00:00:00"), 9.00))
      .toDF("event_id", "user_id", "ts", "value")
    val got = Warehouse.movingAgg(ev, "user_id", "ts", "event_id", col("value"))
      .select("event_id", "mov_sum_c", "mov_n", "quartile")
      .as[(Long, Long, Long, Int)].collect()
      .map { case (id, s, n, q) => id -> ((s, n, q)) }.toMap
    assert(got(1L) == ((100L, 1L, 1)))
    assert(got(2L) == ((300L, 2L, 2)))
    assert(got(3L) == ((600L, 3L, 3)))
    assert(got(4L) == ((900L, 3L, 4)))  // window slid: 2+3+4
    assert(got(5L) == ((900L, 1L, 1)))
  }

  // -------------------- time-weighted average --------------------

  test("timeWeightedAvg weights each value by its holding interval") {
    // value 100 held 10s, value 200 held 30s -> (100*10 + 200*30)/40 = 175
    val ev = Seq(
      (1L, "k", ts("2024-01-01 00:00:00"), 1.00),
      (2L, "k", ts("2024-01-01 00:00:10"), 2.00),
      (3L, "k", ts("2024-01-01 00:00:40"), 9.99), // last point: no interval
      (4L, "solo", ts("2024-01-01 00:00:00"), 5.0)) // single point: no rows
      .toDF("event_id", "key", "ts", "value")
    val got = Warehouse.timeWeightedAvg(ev, "key", "ts", "event_id", col("value"))
      .as[(String, Option[Double], Long)].collect()
      .map { case (k, v, s) => k -> ((v, s)) }.toMap
    assert(got == Map("k" -> ((Some(175.0), 40L))))
  }

  // -------------------- skyline --------------------

  test("skyline2D equals brute-force dominance filtering") {
    val orders = core.Tables.orders(spark, "/root/testdata/sf0.001")
    val got = Warehouse.skyline2D(orders,
      col("o_totalprice"), unix_timestamp(col("o_orderdate")))
      .as[(Double, Long)].collect().toSet
    val pts = orders
      .select(col("o_totalprice"), unix_timestamp(col("o_orderdate")))
      .as[(Double, Long)].collect().toSet
    val want = pts.filter { case (x, y) =>
      !pts.exists { case (qx, qy) =>
        qx <= x && qy <= y && (qx < x || qy < y)
      }
    }
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("skyline2D survives duplicates and a single-point input") {
    val dup = Seq((1.0, 5L), (1.0, 5L), (2.0, 4L), (2.0, 6L), (0.5, 9L))
      .toDF("x", "y")
    val got = Warehouse.skyline2D(dup, col("x"), col("y"))
      .as[(Double, Long)].collect().toSet
    assert(got == Set((0.5, 9L), (1.0, 5L), (2.0, 4L)))
    val one = Warehouse.skyline2D(Seq((3.0, 3L)).toDF("x", "y"),
      col("x"), col("y")).as[(Double, Long)].collect().toSet
    assert(one == Set((3.0, 3L)))
  }

  // -------------------- weighted systematic sample --------------------

  test("weightedSystematicSample matches the single-partition definition") {
    val docs = core.Tables.documents(spark, "/root/testdata/sf0.001")
    val k = 13
    val got = ScaleOps.weightedSystematicSample(docs, "doc_id", col("n_chars"), k)
      .select("doc_id", "w", "cum", "n_hits")
      .as[(Long, Long, Long, Long)].collect().toSet
    // oracle: driver-side cumsum over the id-sorted weights
    val rows = docs.select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val total = rows.map(_._2).sum
    val stride = math.max(total / k, 1L)
    var cum = 0L
    val want = rows.flatMap { case (id, w) =>
      val before = cum / stride
      cum += w
      val hits = cum / stride - before
      if (hits > 0) Some((id, w, cum, hits)) else None
    }.toSet
    assert(got == want)
    // sample count stays within one of k (systematic sampling property)
    assert(math.abs(got.toSeq.map(_._4).sum - k) <= 1)
  }

  test("weightedSystematicSample: a row heavier than the stride multi-hits") {
    val df = (Seq((1L, 1000L)) ++ (2L to 50L).map(i => (i, 1L))).toDF("id", "w")
    val got = ScaleOps.weightedSystematicSample(df, "id", col("w"), 10)
      .select("id", "n_hits").as[(Long, Long)].collect().toMap
    assert(got(1L) >= 9L) // 1000/1049 of the mass -> most strides hit row 1
  }
  // -------------------- event history --------------------

  test("eventHistory orders by (ts, tie) including same-timestamp ties") {
    val ev = Seq(
      (1L, 2L, ts("2024-01-01 00:00:00"), "b"),
      (1L, 1L, ts("2024-01-01 00:00:00"), "a"), // same ts: tie key orders
      (1L, 3L, ts("2024-01-01 00:01:00"), "c"),
      (2L, 4L, ts("2024-01-01 00:00:00"), "x"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = Warehouse.eventHistory(ev, "user_id", "ts", "event_id",
      col("event_type"))
      .as[(Long, Long, String)].collect()
      .map { case (u, n, h) => u -> ((n, h)) }.toMap
    assert(got == Map(1L -> ((3L, "a|b|c")), 2L -> ((1L, "x"))))
  }
  // -------------------- plan-shape guards --------------------

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int =
    "Exchange (hash|range)partitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).length

  test("scd2 / movingAgg / twap: all windows share ONE keyed exchange") {
    val ev = core.Tables.events(spark, "/root/testdata/sf0.001")
    assert(exchanges(
      Warehouse.scd2(ev, "user_id", "event_type", "ts", "event_id")) == 1)
    assert(exchanges(
      Warehouse.movingAgg(ev, "user_id", "ts", "event_id", col("value"))) == 1)
    assert(exchanges(
      Warehouse.timeWeightedAvg(ev, "event_type", "ts", "event_id",
        col("value"))) == 1)
  }

  test("eventHistory aggregates via ObjectHashAggregate, one exchange") {
    val ev = core.Tables.events(spark, "/root/testdata/sf0.001")
    val df = Warehouse.eventHistory(ev, "user_id", "ts", "event_id",
      col("event_type"))
    assert(df.queryExecution.executedPlan.toString
      .contains("ObjectHashAggregate"))
    assert(exchanges(df) == 1)
  }
  test("funnelStage gives per-user stages consistent with funnelCounts") {
    val ev = core.Tables.events(spark, "/root/testdata/sf0.001")
    val stages = Seq("view", "click", "purchase")
    val perUser = Warehouse.funnelStage(ev, "user_id", "event_type", "ts", stages)
      .as[(Long, Int)].collect().toMap
    // every user appears exactly once
    assert(perUser.size == ev.select("user_id").distinct().count())
    val counts = Warehouse.funnelCounts(ev, "user_id", "event_type", "ts", stages)
      .as[(Int, String, Long)].collect()
      .map { case (i, _, n) => i -> n }.toMap
    // "reached stage >= k" in the per-user view must equal stage k's count
    (1 to 3).foreach { k =>
      assert(perUser.values.count(_ >= k).toLong == counts(k))
    }
  }
}
