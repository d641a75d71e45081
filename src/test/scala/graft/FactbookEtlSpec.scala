package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.FactbookEtl
import graft.graph.Ranks

/** Golden replay (SURVEY §5 item 1): feed the reference's input CSVs
  * into our ETL and diff against the golden outputs of the March-2023
  * reference run (`/root/reference/output/trade_partners.csv`,
  * `article_page_rank_countries.csv`).
  */
class FactbookEtlSpec extends SparkSpec {
  import spark.implicits._

  private val refDir = "/root/reference/output"

  private lazy val in = FactbookEtl.readReference(spark, refDir)
  private lazy val country = FactbookEtl.countryTable(in).cache()
  private lazy val trade = FactbookEtl.tradeTable(in, country).cache()

  private lazy val goldenTrade = {
    val schema = StructType(Seq(
      StructField("link", StringType), StructField("exports", StringType),
      StructField("year", DoubleType), StructField("imports", StringType),
      StructField("trade_type", StringType), StructField("retrieved", StringType),
      StructField("amount", DoubleType),
      StructField("export_trade_rank", DoubleType),
      StructField("import_trade_rank", DoubleType),
      StructField("percentage_exports", DoubleType),
      StructField("percentage_imports", DoubleType)))
    spark.read.option("header", "true").option("quote", "\"").option("escape", "\"")
      .schema(schema).csv(s"$refDir/trade_partners.csv")
  }

  private lazy val goldenCountry =
    spark.read.option("header", "true").option("quote", "\"").option("escape", "\"")
      .option("inferSchema", "true").csv(s"$refDir/article_page_rank_countries.csv")

  test("trade edge count matches golden (1992)") {
    assert(goldenTrade.count() == 1992L)
    assert(trade.count() == 1992L)
  }

  test("trade table matches golden row-for-row on every column") {
    type Key = (String, String)
    def keyed(df: org.apache.spark.sql.DataFrame): Map[Key, org.apache.spark.sql.Row] =
      df.select("exports", "imports", "link", "year", "trade_type", "amount",
        "export_trade_rank", "import_trade_rank",
        "percentage_exports", "percentage_imports")
        .collect()
        .map(r => ((r.getString(0), r.getString(1)), r)).toMap
    val g = keyed(goldenTrade)
    val o = keyed(trade)
    assert(g.keySet == o.keySet, {
      val miss = g.keySet -- o.keySet
      val extra = o.keySet -- g.keySet
      s"missing=${miss.take(5)} extra=${extra.take(5)}"
    })
    var mismatches = List.empty[String]
    for ((k, gr) <- g) {
      val or = o(k)
      def d(i: Int): Double = if (gr.isNullAt(i)) Double.NaN else gr.getDouble(i)
      def od(i: Int): Double = if (or.isNullAt(i)) Double.NaN else or.getDouble(i)
      if (gr.getString(2) != or.getString(2)) mismatches ::= s"$k link"
      if (d(3) != od(3)) mismatches ::= s"$k year ${d(3)} vs ${od(3)}"
      if (gr.getString(4) != or.getString(4)) mismatches ::= s"$k trade_type"
      if (math.abs(d(5) - od(5)) > math.abs(d(5)) * 1e-12) mismatches ::= s"$k amount ${d(5)} vs ${od(5)}"
      if (d(6) != od(6)) mismatches ::= s"$k export_rank ${d(6)} vs ${od(6)}"
      if (d(7) != od(7)) mismatches ::= s"$k import_rank ${d(7)} vs ${od(7)}"
      if (math.abs(d(8) - od(8)) > math.abs(d(8)) * 1e-9 + 1e-15) mismatches ::= s"$k pct_exp ${d(8)} vs ${od(8)}"
      if (math.abs(d(9) - od(9)) > math.abs(d(9)) * 1e-9 + 1e-15) mismatches ::= s"$k pct_imp ${d(9)} vs ${od(9)}"
    }
    assert(mismatches.isEmpty, s"${mismatches.size} mismatched cells, e.g. ${mismatches.take(8)}")
  }

  test("country table matches golden on shared metric columns") {
    val shared = Seq("country", "regions", "link", "population",
      "amount_exports", "year_exports", "amount_imports", "year_imports",
      "amount_gdp", "year_gdp", "amount_real_gdp", "year_real_gdp",
      "amount_real_gdp_per_capita", "year_real_gdp_per_capita")
    val g = goldenCountry.select(shared.head, shared.tail: _*)
      .collect().map(r => r.getString(0) -> r).toMap
    val o = country
      .withColumn("population", col("population").cast("double"))
      .select(shared.head, shared.tail: _*)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(g.keySet == o.keySet,
      s"missing=${(g.keySet -- o.keySet).take(5)} extra=${(o.keySet -- g.keySet).take(5)}")
    var bad = List.empty[String]
    for ((k, gr) <- g; i <- 1 until shared.size) {
      val gv = if (gr.isNullAt(i)) null else gr.get(i)
      val ov = if (o(k).isNullAt(i)) null else o(k).get(i)
      val eq = (gv, ov) match {
        case (a: Number, b: Number) =>
          val (x, y) = (a.doubleValue(), b.doubleValue())
          x == y || math.abs(x - y) <= math.abs(x) * 1e-12
        case _ => String.valueOf(gv) == String.valueOf(ov)
      }
      if (!eq) bad ::= s"$k.${shared(i)}: $gv vs $ov"
    }
    assert(bad.isEmpty, s"${bad.size} cells, e.g. ${bad.take(8)}")
  }

  test("pagerank + articlerank match golden GDS values within tolerance") {
    val ranks = Ranks.rankTable(trade, "exports", "imports",
      vertices = Some(country.select(col("country").as("name"))))
    val o = ranks.select("name", "pagerank", "articlerank")
      .as[(String, Double, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    val g = goldenCountry.select("country", "page_rank", "article_rank")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(o.keySet == g.keySet,
      s"missing=${(g.keySet -- o.keySet).take(5)} extra=${(o.keySet -- g.keySet).take(5)}")
    var maxPr = 0.0
    var maxAr = 0.0
    for ((k, (gp, ga)) <- g) {
      val (op, oa) = o(k)
      maxPr = math.max(maxPr, math.abs(op - gp) / math.max(gp, 1e-9))
      maxAr = math.max(maxAr, math.abs(oa - ga) / math.max(ga, 1e-9))
    }
    info(f"max rel diff vs golden GDS: pagerank $maxPr%.2e articlerank $maxAr%.2e")
    // pagerank: bit-exact series semantics -> float-noise tolerance.
    // articlerank: the golden values themselves sit ~1.5e-7 from the
    // exact series (GDS-internal float ordering) -> 1e-5.
    assert(maxPr < 1e-9, s"pagerank max rel diff $maxPr")
    assert(maxAr < 1e-5, s"articlerank max rel diff $maxAr")
    // golden top-3 order preserved
    val top3 = o.toSeq.sortBy(-_._2._1).take(3).map(_._1)
    assert(top3 == Seq("China", "United States", "Germany"))
  }

  test("goods table groups sub-goods per mapped category") {
    val goods = FactbookEtl.goodsTable(in)
    val n = goods.count()
    assert(n > 0 && n <= 60, s"expected ~46 mapped goods, got $n")
    val row = goods.filter(col("mapped_good").isNotNull).limit(1).collect()(0)
    assert(row.getAs[scala.collection.Seq[String]]("goods").nonEmpty)
  }

  // ---------- S4: pandas-render CSV writer vs the golden files ----------

  import graft.sources.PandasCsv
  import java.nio.file.{Files, Paths}

  private def goldenText(name: String): String =
    Files.readString(Paths.get(s"$refDir/$name"))

  private val tradeCols = Seq("link", "exports", "year", "imports",
    "trade_type", "retrieved", "amount", "export_trade_rank",
    "import_trade_rank", "percentage_exports", "percentage_imports")

  private val countryCols = Seq("regions", "country", "link", "rank",
    "retrieved", "population", "year_population") ++
    Seq("exports", "imports", "gdp", "gdp_per_capital", "real_gdp",
      "real_gdp_per_capita").flatMap(n => Seq(s"amount_$n", s"year_$n"))

  /** Golden country file with pandas-true dtypes: population /
    * year_population came from an all-string read + int fillna, so
    * they render as plain integers; everything else as in the file. */
  private lazy val goldenCountryTyped = {
    val fields =
      Seq(StructField("regions", StringType), StructField("country", StringType),
        StructField("link", StringType), StructField("rank", IntegerType),
        StructField("retrieved", StringType),
        StructField("population", LongType), StructField("year_population", LongType)) ++
        countryCols.drop(7).map(StructField(_, DoubleType)) ++
        Seq(StructField("page_rank", DoubleType), StructField("article_rank", DoubleType))
    spark.read.option("header", "true").option("quote", "\"").option("escape", "\"")
      .schema(StructType(fields)).csv(s"$refDir/article_page_rank_countries.csv")
  }

  test("S4 writer round-trips golden trade_partners.csv byte-for-byte") {
    assert(PandasCsv.renderAll(goldenTrade) == goldenText("trade_partners.csv"))
  }

  test("S4 writer round-trips EVERY reference output CSV byte-for-byte") {
    import graft.core.FactbookSchemas
    // the scrape stage wrote year/population as pandas int64 (no NaN
    // in those columns), so they re-read as Long to render plain
    def longify(s: StructType, names: String*): StructType =
      StructType(s.map(f =>
        if (names.contains(f.name)) f.copy(dataType = LongType) else f))
    val amountLY = longify(FactbookSchemas.amountSeries, "year")
    val partnersLY = longify(FactbookSchemas.partners, "year")
    val goodsLY = longify(FactbookSchemas.goods, "year")
    val popL = longify(FactbookSchemas.population, "population", "year")
    val files = Seq(
      "exports.csv" -> amountLY, "imports.csv" -> amountLY,
      "gdp.csv" -> amountLY, "real_gdp.csv" -> amountLY,
      "gdp_per_capita.csv" -> amountLY, "real_gdp_per_capita.csv" -> amountLY,
      "exports_partners.csv" -> partnersLY, "imports_partners.csv" -> partnersLY,
      "exports_goods.csv" -> goodsLY, "imports_goods.csv" -> goodsLY,
      "population.csv" -> popL,
      "country_region.csv" -> FactbookSchemas.countryRegion,
      "goods_grouping.csv" -> FactbookSchemas.goodsGrouping)
    val bad = files.flatMap { case (f, schema) =>
      val df = spark.read.option("header", "true")
        .option("quote", "\"").option("escape", "\"")
        .schema(schema).csv(s"$refDir/$f")
      val rendered = PandasCsv.renderAll(df)
      val want = goldenText(f)
      if (rendered == want) None
      else Some(f -> rendered.linesIterator.zip(want.linesIterator).zipWithIndex
        .collectFirst { case ((a, b), i) if a != b => s"line $i:\n  got [$a]\n  want [$b]" }
        .getOrElse(s"length ${rendered.length} vs ${want.length}"))
    }
    assert(bad.isEmpty, bad.map { case (f, m) => s"\n$f $m" }.mkString)
  }

  test("S4 writer round-trips golden article_page_rank_countries.csv byte-for-byte") {
    assert(PandasCsv.renderAll(goldenCountryTyped) ==
      goldenText("article_page_rank_countries.csv"))
  }

  /** CSV-aware field split (minimal quoting, `""` escapes). */
  private def csvFields(line: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line(i)
      if (inQ) {
        if (c == '"' && i + 1 < line.length && line(i + 1) == '"') { sb.append('"'); i += 1 }
        else if (c == '"') inQ = false
        else sb.append(c)
      } else c match {
        case '"' => inQ = true
        case ',' => out += sb.toString; sb.clear()
        case x => sb.append(x)
      }
      i += 1
    }
    out += sb.toString
    out.toSeq
  }

  /** Line-level golden diff, drift-aware: the golden country/trade
    * files were rendered from an OLDER scrape than the input CSVs now
    * in /root/reference/output (e.g. exports.csv carries
    * 33674999999.999996 where the golden country file says
    * 33675000000.0), so a handful of lines differ in the last ulp.
    * Assert: every line byte-identical except ≤ maxDrift lines, and
    * those differ ONLY in numeric fields within 1e-12 relative. */
  private def assertGoldenLines(ours: Seq[String], gold: Seq[String],
      maxDrift: Int): Unit = {
    val og = ours.toSet
    val gg = gold.toSet
    val diffO = ours.filterNot(gg)
    val diffG = gold.filterNot(og)
    info(s"${gold.size} lines, ${diffO.size} differ only by input-drift ulps")
    assert(diffO.size == diffG.size, s"ours=${diffO.size} golden=${diffG.size}")
    assert(diffO.size <= maxDrift, s"${diffO.size} drifted lines > $maxDrift")
    def isNum(s: String) = s.nonEmpty && scala.util.Try(s.toDouble).isSuccess
    def keyed(ls: Seq[String]) = ls.map { l =>
      val (nums, strs) = csvFields(l).partition(isNum)
      strs.mkString(" ") -> nums.map(_.toDouble)
    }.toMap
    val ko = keyed(diffO)
    val kg = keyed(diffG)
    assert(ko.keySet == kg.keySet, s"unmatched drift keys: " +
      s"${(ko.keySet -- kg.keySet).take(2)} ${(kg.keySet -- ko.keySet).take(2)}")
    for ((k, ons) <- ko) {
      val gns = kg(k)
      assert(ons.size == gns.size, s"$k field count")
      ons.zip(gns).foreach { case (a, b) =>
        assert(a == b || math.abs(a - b) <= math.abs(b) * 1e-12,
          s"${k.replace(' ', '|')}: $a vs $b") }
    }
  }

  test("our trade table renders to the golden file's exact lines (modulo row order)") {
    val ours = PandasCsv.renderAll(trade.select(tradeCols.map(col): _*))
      .split("\n", -1).toSeq
    val gold = goldenText("trade_partners.csv").split("\n", -1).toSeq
    assert(ours.head == gold.head, "header")
    assertGoldenLines(ours.tail.filter(_.nonEmpty).sorted,
      gold.tail.filter(_.nonEmpty).sorted, maxDrift = 40)
  }

  test("our country table renders to the golden file's exact lines (modulo order + rank cols)") {
    // drop the two trailing rank columns textually — they are the last
    // two fields and never contain commas
    def strip(line: String): String = {
      val i = line.lastIndexOf(',')
      line.substring(0, line.lastIndexOf(',', i - 1))
    }
    val ours = PandasCsv.renderAll(country
        .withColumn("population", col("population").cast("long"))
        .withColumn("year_population", col("year_population").cast("long"))
        .select(countryCols.map(col): _*))
      .split("\n", -1).toSeq
    val gold = goldenText("article_page_rank_countries.csv")
      .split("\n", -1).toSeq
    assert(ours.head == strip(gold.head), "header")
    assertGoldenLines(ours.tail.filter(_.nonEmpty).sorted,
      gold.tail.filter(_.nonEmpty).map(strip).sorted, maxDrift = 40)
  }
}
