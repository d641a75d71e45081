package graft

import org.apache.spark.sql.functions._

/** Value-level signal for the HLL sketch path (q_hll_distinct stays
  * rows-only in the driver gate — approximation is engine-specific —
  * so this spec pins it against the exact counts instead). */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 3·rsd of exact, per group") {
    val rsd = 0.02
    val li = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact"))
    val approx = graft.queries.Relational.hllDistinct(spark, "/root/testdata/sf0.001")
    val joined = approx.join(exact, "l_returnflag")
      .select(col("l_returnflag"), col("approx_parts"), col("exact"))
      .as[(String, Long, Long)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (flag, a, e) =>
      info(f"$flag: approx=$a exact=$e rel=${math.abs(a - e).toDouble / e}%.4f")
      assert(math.abs(a - e) <= 3 * rsd * e,
        s"$flag: |$a - $e| > ${3 * rsd * e}")
    }
  }
}
