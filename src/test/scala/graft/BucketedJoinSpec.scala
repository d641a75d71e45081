package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing: both sides bucketed by the join key
  * into the warehouse join WITHOUT a shuffle exchange — the
  * pre-partitioning strategy for repeated 100 TB fact-fact joins. */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables join with zero exchanges") {
    // warehouse dir is a static conf — set in SparkSpec's builder
    val li = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_quantity")
    val o = graft.core.Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderkey", "o_totalprice")

    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bucketed")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("q_bucketed_join query shuffles only for the final aggregate") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = graft.queries.Extensions.bucketedJoin(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.executedPlan.toString
      val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
      // the join reads bucket-partitioned tables (zero exchanges); the
      // only shuffle is the group-by on the 5-value segment column
      assert(exchanges.size == 1 && exchanges.head.contains("c_mktsegment"),
        s"expected exactly the aggregate exchange:\n$plan")
      assert(df.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS graft_orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS graft_customer_bucketed")
    }
  }
}
