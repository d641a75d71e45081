package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.graph.Ranks

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY §2 (plus the
  * LLM-pipeline extension ops) onto the driver's synthetic tables;
  * `oracleSql` holds the DuckDB-equivalent SQL for the hash-match
  * correctness gate. Non-SQL-expressible ops (graph centrality,
  * MinHash/SimHash) are declared without an oracle -> rows-only check.
  */
object SparkEntry {

  /** Flagship: the reference's headline analytics re-shaped onto the
    * synthetic star schema — build a nation-level directed trade graph
    * (supplier nation -> customer nation, edge amount = revenue), run
    * PageRank + ArticleRank (20 iters, d=0.85, unweighted, exactly the
    * reference's GDS config), return ranked nations. */
  def entry(spark: SparkSession): DataFrame =
    tradeRanks(spark, "/root/testdata/sf0.001")

  /** Nation-to-nation trade edges from the star schema. All dimension
    * joins broadcast; the single shuffle is the groupBy on the
    * (src, dst) pair — the same plan shape survives 100 TB lineitem. */
  def nationTradeEdges(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n.select(col("n_nationkey").as("_sk"), col("n_name").as("src_nation"))),
        col("s_nationkey") === col("_sk"))
      .join(broadcast(n.select(col("n_nationkey").as("_ck"), col("n_name").as("dst_nation"))),
        col("c_nationkey") === col("_ck"))
      .filter(col("src_nation") =!= col("dst_nation"))
      .groupBy(col("src_nation"), col("dst_nation"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(24,6)"))
        .cast("double").as("amount"))
  }

  def tradeRanks(spark: SparkSession, dir: String): DataFrame =
    Ranks.rankTable(nationTradeEdges(spark, dir), "src_nation", "dst_nation")
      .orderBy(desc("pagerank"), asc("name"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Extensions.queries ++
      graft.queries.RankQueries.queries ++
      graft.queries.WarehouseQueries.queries ++
      Map[String, (SparkSession, String) => DataFrame](
        "q_trade_ranks" -> ((s, dir) =>
          tradeRanks(s, dir)
            .select(col("name"), round(col("pagerank"), 6).as("pagerank"),
              round(col("articlerank"), 6).as("articlerank"))))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. The graph ranks are covered by a
    * GENERATED fixed-iteration series oracle (RankQueries.tradeRanksSql);
    * q_hll_distinct oracles its exact count + within-bound verdict (the
    * estimate itself is engine-private) — every declared query has a
    * value-level check. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++ graft.queries.Extensions.oracles ++
      graft.queries.RankQueries.oracles ++
      graft.queries.WarehouseQueries.oracles
}
