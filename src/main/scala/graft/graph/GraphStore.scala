package graft.graph

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import graft.operators.{EtlOps, FactbookEtl}

/** Set-oriented replacement for the reference's row-at-a-time Neo4j
  * upload (S6/S8/S9, `preprocess_upload_neo4j.py:219-395`): the
  * property graph is persisted as parquet node/edge tables, written
  * once per label/type with MERGE-by-key == dedup-then-overwrite and
  * NODE-KEY constraints == fail-fast uniqueness asserts.
  *
  * Edge endpoint resolution keeps the reference's Cypher
  * MATCH..MATCH..MERGE semantics: endpoints that don't resolve to a
  * node silently drop the edge (inner joins, J7).
  *
  * The reference's `contains` upload has a latent bug
  * (`preprocess_upload_neo4j.py:332` passes the literal `["country"]`
  * instead of the row value, so NO contains edges are ever created);
  * we build the *intended* edges and document the divergence — the
  * observable outputs (trade/rank CSVs) are unaffected.
  *
  * At scale: writes are set-oriented (no N+1 round trips); every
  * dedup is one hash shuffle on the node key; endpoint joins broadcast
  * the node key set when it is dimension-sized, else sort-merge.
  */
object GraphStore {

  case class Tables(
      countryNodes: DataFrame, regionNodes: DataFrame, goodNodes: DataFrame,
      tradesEdges: DataFrame, containsEdges: DataFrame,
      exportsEdges: DataFrame, importsEdges: DataFrame)

  /** Build all node/edge tables from the ETL outputs
    * (`preprocess_upload_neo4j.py:219-395` re-expressed set-wise). */
  def build(in: FactbookEtl.Inputs, country: DataFrame, trade: DataFrame): Tables = {
    // country nodes (monetary props scaled to billions, r3 — lines 259-266)
    val countryNodes = country.select(
      col("country").as("name"), col("link"),
      round(col("amount_exports") / 1e9, 3).as("amount_export"),
      col("year_exports").as("year_export"),
      round(col("amount_imports") / 1e9, 3).as("amount_import"),
      col("year_imports").as("year_import"),
      col("regions").as("primary_region"),
      round(col("amount_gdp") / 1e9, 3).as("gdp"),
      col("year_gdp").as("year_gdp"),
      col("amount_real_gdp").as("real_gdp"),
      col("amount_real_gdp_per_capita").as("real_gdp_per_capita"),
      col("year_real_gdp").as("year_real_gdp"),
      col("population"), col("year_population"),
      col("retrieved").as("date_retrieved"))
      .dropDuplicates("name")

    val regionNodes = in.countryRegion.select(col("regions").as("name"))
      .distinct()

    val goodNodes = FactbookEtl.goodsTable(in)
      .select(col("mapped_good").as("name"), col("goods").as("sub_goods"))
      .filter(col("name").isNotNull)
      .dropDuplicates("name")

    val names = countryNodes.select(col("name"))

    // trades: exporter country -> importer country (amount /1e9 r3)
    val tradesEdges = trade.select(
      col("exports").as("src"), col("imports").as("dst"),
      round(col("amount") / 1e9, 3).as("amount"), col("year"),
      col("percentage_exports"), col("percentage_imports"),
      col("export_trade_rank"), col("import_trade_rank"),
      col("trade_type").as("trade_source"), col("retrieved"))
      .join(broadcast(names.withColumnRenamed("name", "src")), Seq("src"), "left_semi")
      .join(broadcast(names.withColumnRenamed("name", "dst")), Seq("dst"), "left_semi")

    // contains: region -> country (the INTENDED edges; reference bug
    // preprocess_upload_neo4j.py:332 creates none)
    val containsEdges = in.countryRegion.select(
      col("regions").as("src"), col("country").as("dst"),
      col("rank"), col("retrieved"))
      .dropDuplicates("src", "dst")
      .join(broadcast(names.withColumnRenamed("name", "dst")), Seq("dst"), "left_semi")

    // exports: country -> good; imports: good -> country (direction
    // deliberately reversed, lines 371-395)
    def goodsSide(df: DataFrame): DataFrame = df
      .na.fill(Map("year" -> 1970.0))
      .join(broadcast(in.goodsGrouping.drop("_input_row_id")), Seq("goods"), "left")
      .filter(col("mapped_good").isNotNull)

    val exportsEdges = goodsSide(in.exportsGoods).select(
      col("country").as("src"), col("mapped_good").as("dst"),
      col("rank"), col("year"), col("goods").as("sub_good"), col("retrieved"))
      .join(broadcast(names.withColumnRenamed("name", "src")), Seq("src"), "left_semi")
      .dropDuplicates("src", "dst", "sub_good")

    val importsEdges = goodsSide(in.importsGoods).select(
      col("mapped_good").as("src"), col("country").as("dst"),
      col("rank"), col("year"), col("goods").as("sub_good"), col("retrieved"))
      .join(broadcast(names.withColumnRenamed("name", "dst")), Seq("dst"), "left_semi")
      .dropDuplicates("src", "dst", "sub_good")

    Tables(countryNodes, regionNodes, goodNodes,
      tradesEdges, containsEdges, exportsEdges, importsEdges)
  }

  /** Persist the graph store (S9 truncate == overwrite), asserting
    * node-key uniqueness (S8). */
  def write(t: Tables, dir: String): Unit = {
    EtlOps.assertUniqueKey(t.countryNodes, Seq("name"))
    EtlOps.assertUniqueKey(t.regionNodes, Seq("name"))
    EtlOps.assertUniqueKey(t.goodNodes, Seq("name"))
    EtlOps.assertUniqueKey(t.tradesEdges, Seq("src", "dst"))
    t.countryNodes.write.mode(SaveMode.Overwrite).parquet(s"$dir/nodes_country")
    t.regionNodes.write.mode(SaveMode.Overwrite).parquet(s"$dir/nodes_region")
    t.goodNodes.write.mode(SaveMode.Overwrite).parquet(s"$dir/nodes_good")
    t.tradesEdges.write.mode(SaveMode.Overwrite).parquet(s"$dir/edges_trades")
    t.containsEdges.write.mode(SaveMode.Overwrite).parquet(s"$dir/edges_contains")
    t.exportsEdges.write.mode(SaveMode.Overwrite).parquet(s"$dir/edges_exports")
    t.importsEdges.write.mode(SaveMode.Overwrite).parquet(s"$dir/edges_imports")
  }
}
