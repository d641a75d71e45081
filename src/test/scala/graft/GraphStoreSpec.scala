package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.graph.GraphStore
import graft.operators.FactbookEtl

/** Graph-store build + persistence over the reference inputs
  * (S6/S8/S9 semantics). */
class GraphStoreSpec extends SparkSpec {

  private lazy val in = FactbookEtl.readReference(spark, "/root/reference/output")
  private lazy val country = FactbookEtl.countryTable(in).cache()
  private lazy val trade = FactbookEtl.tradeTable(in, country).cache()
  private lazy val t = GraphStore.build(in, country, trade)

  test("node tables have expected cardinalities and unique keys") {
    assert(t.countryNodes.count() == 252)
    assert(t.regionNodes.count() == 14)
    val goods = t.goodNodes.count()
    assert(goods > 0 && goods <= 60, s"goods nodes $goods")
  }

  test("trades edges: endpoint-resolved subset of the trade table") {
    val n = t.tradesEdges.count()
    assert(n > 0 && n <= 1992, s"trades edges $n")
    // all endpoints resolve to country nodes
    val names = t.countryNodes.select("name")
    val dangling = t.tradesEdges
      .join(names.withColumnRenamed("name", "src"), Seq("src"), "left_anti")
    assert(dangling.count() == 0)
  }

  test("contains edges exist (the reference's intended-but-buggy edges)") {
    assert(t.containsEdges.count() > 0)
    // region -> country, rank carried
    assert(t.containsEdges.columns.toSet == Set("src", "dst", "rank", "retrieved"))
  }

  test("imports edges are good -> country (direction reversed vs exports)") {
    val expSrc = t.exportsEdges.select("src").distinct()
    val impDst = t.importsEdges.select("dst").distinct()
    // exports sources and imports destinations are both countries
    val names = t.countryNodes.select("name")
    assert(expSrc.join(names, expSrc("src") === names("name"), "left_anti").count() == 0)
    assert(impDst.join(names, impDst("dst") === names("name"), "left_anti").count() == 0)
  }

  test("write persists all seven tables with overwrite semantics") {
    val dir = Files.createTempDirectory("graft-graphstore").toString
    GraphStore.write(t, dir)
    GraphStore.write(t, dir) // idempotent overwrite (S9 truncate)
    val back = spark.read.parquet(s"$dir/nodes_country")
    assert(back.count() == 252)
    assert(spark.read.parquet(s"$dir/edges_contains").count() ==
      t.containsEdges.count())
  }
}
