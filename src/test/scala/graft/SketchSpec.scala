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

  test("cmsFrequency: never underestimates; exact when width >> distinct keys") {
    val li = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val probes = Seq(1L, 2L, 3L, 999999L) // incl. an absent key
    val got = graft.operators.Sketches.cmsFrequency(li, "l_partkey", probes)
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet == probes.toSet)
    got.values.foreach { case (k, est, exact, ok) =>
      assert(ok && est >= exact, s"key $k: est=$est exact=$exact")
    }
    assert(got(999999L)._3 == 0L) // absent key: exact 0, estimate >= 0
    // a wide sketch over a tiny distinct domain has no collisions:
    // estimates become exact
    val tiny = Seq(1L, 1L, 1L, 2L, 2L, 7L).toDF("v")
    val exactWide = graft.operators.Sketches
      .cmsFrequency(tiny, "v", Seq(1L, 2L, 7L), depth = 4, width = 4096)
      .as[(Long, Long, Long, Boolean)].collect()
    exactWide.foreach { case (k, est, exact, _) =>
      assert(est == exact, s"wide sketch must be exact: key $k est=$est exact=$exact")
    }
  }

  test("hllSetOps: register merge equals the sketch of the union, inclusion-exclusion sane") {
    val li = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val a = li.filter(col("l_returnflag") === "A")
    val b = li.filter(col("l_returnflag") === "R")
    val row = graft.operators.Sketches.hllSetOps(a, b, "l_partkey")
      .collect()(0)
    val (ea, eb, eu, ei) = (row.getDouble(0), row.getDouble(1),
      row.getDouble(2), row.getDouble(3))
    // merged registers ARE the union's sketch: estimating A∪B directly
    // from the concatenated rows must give the identical value
    val direct = graft.operators.Sketches.hllDistinct(
      a.unionByName(b).withColumn("_g", lit(1)), Seq("_g"), "l_partkey")
      .select("hll_distinct").collect()(0).getDouble(0)
    assert(eu == direct, s"merged-register estimate $eu != direct $direct")
    assert(eu >= math.max(ea, eb) - 1e-9, "union can't be smaller than a component")
    assert(ei >= 0.0 && ei <= math.min(ea, eb) + 1e-9)
    assert(math.abs(ea + eb - eu - ei) <= 1e-6 || ei == 0.0)
    // estimates stay near exact (m=256 ⇒ ~6.5% rsd; allow 3x)
    def exact(df: org.apache.spark.sql.DataFrame) =
      df.select("l_partkey").distinct().count().toDouble
    assert(math.abs(ea - exact(a)) <= 0.2 * exact(a))
    assert(math.abs(eu - exact(a.unionByName(b))) <= 0.2 * exact(a.unionByName(b)))
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

  test("portable Bloom: no false negatives, merge == built-from-all, fpp sane, guards") {
    import graft.operators.Sketches
    val keys = (1L to 200L).map(_ * 3L)
    val df = keys.toDF("k")
    val bits = 4096
    // EVERY inserted key must probe positive (a Bloom never lies negative)
    val present = Sketches.bloomProbe(
      Sketches.bloomRecords(df, "k", bits), keys, bits)
      .as[(Long, Boolean)].collect().toMap
    assert(present.values.forall(identity),
      s"false negative: ${present.filterNot(_._2)}")
    // merge of halves is BIT-IDENTICAL to the filter over the union
    val a = Sketches.bloomRecords(df.filter(col("k") <= 300L), "k", bits)
    val b = Sketches.bloomRecords(df.filter(col("k") > 300L), "k", bits)
    val merged = Sketches.bloomMerge(a, b)
      .as[(Long, Long)].collect().toSet
    val whole = Sketches.bloomRecords(df, "k", bits)
      .as[(Long, Long)].collect().toSet
    assert(merged == whole)
    // absent keys: some may collide (fpp), but at m/n = 4096/200 with
    // k=4 the false-positive rate is well under 10%
    val absent = (1L to 200L).map(_ * 3L + 1L)
    val fp = Sketches.bloomProbe(
      Sketches.bloomRecords(df, "k", bits), absent, bits)
      .filter(col("might_contain")).count()
    assert(fp <= 20L, s"implausible false-positive count: $fp")
    intercept[IllegalArgumentException] {
      Sketches.bloomRecords(df, "k", bits = 100)
    }
    intercept[IllegalArgumentException] {
      Sketches.bloomRecords(Seq(1.5).toDF("k"), "k")
    }
    intercept[IllegalArgumentException] {
      Sketches.bloomProbe(whole.toSeq.toDF("w", "b"), Seq(1L))
    }
    intercept[IllegalArgumentException] {
      Sketches.bloomMerge(df, df)
    }
  }

  test("bloomProbe: duplicated probe keys dedup — never-false-negative survives") {
    import graft.operators.Sketches
    val df = (1L to 50L).map(_ * 3L).toDF("k")
    val rec = Sketches.bloomRecords(df, "k")
    // a duplicated present key used to expand to 2k position rows and
    // fail the count === k check — might_contain must stay true, one
    // row per DISTINCT probe key
    val got = Sketches.bloomProbe(rec, Seq(3L, 3L, 9L, 3L))
      .as[(Long, Boolean)].collect().toMap
    assert(got.size == 2 && got(3L) && got(9L), s"got $got")
  }
}
