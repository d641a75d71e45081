package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling: with a pathologically skewed key and
  * aggressive skew thresholds, the final adaptive plan must mark the
  * sort-merge join `skew=true` (Spark splits the oversized partition
  * into parallel sub-joins). This is the runtime half of the skew
  * story — `ScaleOps.saltedJoin` is the static half for keys known to
  * be hot in advance. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE marks the skewed sort-merge join and the result is exact") {
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // key 7 carries ~99% of the left side
      val left = spark.range(0, 60000)
        .select(when(col("id") % 100 =!= 0, lit(7L)).otherwise(col("id") % 50).as("k"),
          col("id").as("v"))
      val right = spark.range(0, 50).select(col("id").as("k"), (col("id") * 10).as("w"))
      val joined = left.join(right, Seq("k"))
      // collect() executes THIS QueryExecution (count() would plan a
      // separate one and the inspected plan would never have run)
      val n = joined.collect().length
      // exact expectation: rows with k=7 (59400) match once; the rest
      // (id%100==0 -> k=id%50 in {0}) id multiples of 100 -> k=0: 600 rows
      assert(n == 60000, s"join must be exact under skew splitting, got $n")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE should split the skewed partition:\n${plan.take(2000)}")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
