package graft

import org.apache.spark.sql.functions._

/** Value-level signal for the HLL sketch path (q_hll_distinct stays
  * rows-only in the driver gate — approximation is engine-specific —
  * so this spec pins it against the exact counts instead). */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("portable HLL within 3·(1.04/√m) of exact, per group") {
    val se = 1.04 / math.sqrt(256) // ≈ 6.5% for p=8
    val li = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact"))
    val got = graft.operators.Sketches.hllDistinct(
      li, Seq("l_returnflag"), "l_partkey")
      .join(exact, "l_returnflag")
      .as[(String, Double, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (flag, est, e) =>
      info(f"$flag: hll=$est%.1f exact=$e rel=${math.abs(est - e) / e}%.4f")
      assert(math.abs(est - e) <= 3 * se * e,
        s"$flag: |$est - $e| > ${3 * se * e}")
    }
  }

  test("portable HLL merges: union of halves == whole-corpus sketch") {
    // register-max merge property: the estimate over A ∪ B equals the
    // estimate computed from the merged per-register maxes, which is
    // exactly what running the operator over the union computes —
    // split-invariance means partitioning never changes the answer
    val li = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val whole = graft.operators.Sketches.hllDistinct(
      li, Seq("l_returnflag"), "l_partkey")
      .as[(String, Double)].collect().toMap
    val a = li.filter(col("l_orderkey") % 2 === 0)
    val b = li.filter(col("l_orderkey") % 2 =!= 0)
    val reunion = graft.operators.Sketches.hllDistinct(
      a.unionByName(b), Seq("l_returnflag"), "l_partkey")
      .as[(String, Double)].collect().toMap
    assert(whole == reunion && whole.nonEmpty)
  }

  test("approx_count_distinct within 3·rsd of exact, per group") {
    // q_hll_distinct emits the bound verdict itself (the oracle pins it
    // as a constant `true`); the spec asserts the verdict holds and the
    // exact counts are sane
    val approx = graft.queries.Relational.hllDistinct(spark, "/root/testdata/sf0.001")
    val rows = approx
      .select(col("l_returnflag"), col("exact_parts"), col("within_bound"))
      .as[(String, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (flag, e, ok) =>
      info(s"$flag: exact=$e within_bound=$ok")
      assert(e > 0, s"$flag: exact distinct count must be positive")
      assert(ok, s"$flag: sketch estimate landed outside 3*rsd (6%) of $e")
    }
  }

  test("binnedQuantiles estimate is the midpoint of the bin holding the ceil(p*n) order statistic") {
    val events = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
    val got = graft.operators.Sketches
      .binnedQuantiles(events, "event_type", "value", binWidth = 1.0,
        ps = Seq(0.5, 0.9, 0.99))
      .as[(String, Double, Double)].collect()
    assert(got.nonEmpty)
    val byType = events.select(col("event_type"), col("value").cast("double"))
      .as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    got.foreach { case (t, p, est) =>
      val vs = byType(t)
      val target = vs(math.ceil(p * vs.length).toInt - 1) // rank-ceil(p*n) value
      val bin = math.floor(target / 1.0)
      assert(est == BigDecimal((bin + 0.5) * 1.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"$t p=$p: est $est vs order-stat $target (bin $bin)")
    }
  }
}
