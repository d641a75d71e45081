package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.FactbookFunctions._
import graft.operators.EtlOps

/** SURVEY §2 relational operator inventory exercised over the
  * driver's synthetic tables, one query per operator family, each
  * paired with ANSI SQL for the DuckDB oracle (SparkEntry.oracleSql).
  *
  * Conventions for oracle-hash parity:
  *  - double-sum aggregates go through DECIMAL (exact, order-
  *    independent) and cast back to double;
  *  - every query has a deterministic row set (no LIMIT without a
  *    total order);
  *  - computed columns aliased identically in Spark and SQL.
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  /** S5+P1 — scan with projection + pushed filter. */
  val scanProject: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))

  val scanProjectSql: String =
    "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity > 45"

  /** P2 — regex row filter (reference `scrape_cia.py:60`). */
  val filterRegex: Q = (s, d) =>
    Tables.part(s, d)
      .filter(col("p_name").rlike("^[bcs].*t$"))
      .select(col("p_partkey"), col("p_name"))

  val filterRegexSql: String =
    "SELECT p_partkey, p_name FROM part WHERE regexp_matches(p_name, '^[bcs].*t$')"

  /** P3+P4 — null-validity + equality predicates
    * (`preprocess_upload_neo4j.py:118,178-179`). */
  val filterEq: Q = (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_orderstatus") === "F" && col("o_totalprice").isNotNull)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))

  val filterEqSql: String =
    "SELECT o_orderkey, o_custkey, o_orderstatus FROM orders " +
      "WHERE o_orderstatus = 'F' AND o_totalprice IS NOT NULL"

  /** P5 — conditional masked update (`df.loc[mask, col] = ...`). */
  val maskedUpdate: Q = (s, d) =>
    Tables.customer(s, d).select(
      col("c_custkey"),
      when(col("c_acctbal") < 0, lit("DEBT"))
        .when(col("c_mktsegment") === "BUILDING", lit("BLD"))
        .otherwise(col("c_mktsegment")).as("segment"))

  val maskedUpdateSql: String =
    "SELECT c_custkey, CASE WHEN c_acctbal < 0 THEN 'DEBT' " +
      "WHEN c_mktsegment = 'BUILDING' THEN 'BLD' ELSE c_mktsegment END AS segment " +
      "FROM customer"

  /** P6+P7+P10 — rename / drop / cast. */
  val renameCast: Q = (s, d) =>
    Tables.supplier(s, d)
      .withColumnRenamed("s_name", "supplier_name")
      .withColumn("acctbal_cents", (col("s_acctbal") * 100).cast("long"))
      .drop("s_acctbal", "s_nationkey")

  // trunc(): Spark's double->long cast truncates toward zero while
  // DuckDB's CAST rounds — make the oracle truncate explicitly.
  val renameCastSql: String =
    "SELECT s_suppkey, s_name AS supplier_name, " +
      "CAST(trunc(s_acctbal * 100) AS BIGINT) AS acctbal_cents FROM supplier"

  /** P8+P9 — literal columns + null fill with defaults. */
  val litFill: Q = (s, d) =>
    Tables.orders(s, d).select(
      col("o_orderkey"),
      lit("factbook").as("src"),
      coalesce(col("o_orderpriority"), lit("NONE")).as("priority"))

  val litFillSql: String =
    "SELECT o_orderkey, 'factbook' AS src, COALESCE(o_orderpriority, 'NONE') AS priority FROM orders"

  /** F1 — currency parser over synthesized factbook-style strings
    * (`scrape_cia.py:22-38`): unit multipliers, comma full-form,
    * non-`$` reject. Strings built integer-exactly from order keys so
    * the oracle constructs identical input. */
  val currencyParse: Q = (s, d) =>
    Tables.orders(s, d)
      .withColumn("_amt", floor(col("o_totalprice")).cast("long"))
      .withColumn("txt",
        when(col("o_orderkey") % 4 === 0,
          concat(lit("$"), col("_amt"), lit(".5 million (2020 est.)")))
        .when(col("o_orderkey") % 4 === 1,
          concat(lit("$"), col("_amt"), lit(" billion (2019 est.)")))
        .when(col("o_orderkey") % 4 === 2,
          lit("$2,732,370,000,000 (2020 est.)"))
        .otherwise(lit("NA")))
      .select(col("o_orderkey"), col("txt"),
        currencyToDollars(col("txt")).as("dollars"))

  val currencyParseSql: String =
    "WITH t AS (SELECT o_orderkey, CASE " +
      "WHEN o_orderkey % 4 = 0 THEN '$' || CAST(FLOOR(o_totalprice) AS BIGINT) || '.5 million (2020 est.)' " +
      "WHEN o_orderkey % 4 = 1 THEN '$' || CAST(FLOOR(o_totalprice) AS BIGINT) || ' billion (2019 est.)' " +
      "WHEN o_orderkey % 4 = 2 THEN '$2,732,370,000,000 (2020 est.)' " +
      "ELSE 'NA' END AS txt FROM orders) " +
      "SELECT o_orderkey, txt, CASE WHEN regexp_matches(txt, '^\\$\\d') THEN " +
      "TRY_CAST(regexp_replace(string_split(ltrim(txt, '$'), ' ')[1], ',', '', 'g') AS DOUBLE) * " +
      "(CASE string_split(ltrim(txt, '$'), ' ')[2] WHEN 'million' THEN 1e6 WHEN 'billion' THEN 1e9 " +
      "WHEN 'trillion' THEN 1e12 ELSE 1 END) END AS dollars FROM t"

  /** F2 — year extraction from "(YYYY est.)" text. */
  val yearExtract: Q = (s, d) =>
    Tables.orders(s, d)
      .withColumn("txt",
        concat(col("o_orderpriority"), lit(" ("), year(col("o_orderdate")), lit(" est.)")))
      .select(col("o_orderkey"), yearFromParen(col("txt")).as("yr"))

  val yearExtractSql: String =
    "SELECT o_orderkey, TRY_CAST(regexp_extract(o_orderpriority || ' (' || year(o_orderdate) || ' est.)', '\\((\\d{4})', 1) AS DOUBLE) AS yr FROM orders"

  /** F3 — trailing-percentage parser (`scrape_cia.py:118-129`),
    * including the "almost entirely" -> 0.9 rule. */
  val percentageParse: Q = (s, d) =>
    Tables.customer(s, d)
      .withColumn("txt",
        when(col("c_custkey") % 7 === 0, concat(lit("almost entirely "), col("c_name")))
          .otherwise(concat(col("c_name"), lit(" "), (col("c_custkey") % 100).cast("int"), lit("%"))))
      .select(col("c_custkey"),
        trailingPercentage(col("txt")).as("pct"),
        partnerName(col("txt")).as("partner"))

  val percentageParseSql: String =
    "WITH t AS (SELECT c_custkey, CASE WHEN c_custkey % 7 = 0 " +
      "THEN 'almost entirely ' || c_name " +
      "ELSE c_name || ' ' || CAST(CAST(c_custkey % 100 AS INT) AS VARCHAR) || '%' END AS txt FROM customer) " +
      "SELECT c_custkey, " +
      "CASE WHEN txt LIKE '%almost entirely%' THEN 0.9 " +
      "WHEN regexp_extract(txt, '(\\d+)%$', 1) <> '' THEN TRY_CAST(regexp_extract(txt, '(\\d+)%$', 1) AS DOUBLE) / 100.0 END AS pct, " +
      "CASE WHEN regexp_matches(txt, '\\d+%$') THEN trim(regexp_replace(txt, '\\s+\\S+$', '')) " +
      "WHEN txt LIKE '%almost entirely%' THEN trim(regexp_replace(txt, 'almost entirely', '')) ELSE txt END AS partner FROM t"

  /** F6 — entity canonicalization as CASE chain. */
  val canonicalize: Q = (s, d) =>
    Tables.nation(s, d).select(
      col("n_nationkey"),
      canonicalCountry(col("n_name")).as("name"))

  val canonicalizeSql: String =
    "SELECT n_nationkey, CASE WHEN n_name = 'US' THEN 'United States' " +
      "WHEN n_name = 'Untied States' THEN 'United States' " +
      "WHEN n_name = 'Korea, North' THEN 'North Korea' " +
      "WHEN n_name = 'Korea, South' THEN 'South Korea' ELSE n_name END AS name FROM nation"

  /** F8+F9 — ratio arithmetic + unit scaling after a broadcast join. */
  val ratioScale: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val totals = o.groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(20,2)")).as("_tot"))
    o.join(broadcast(totals), Seq("o_custkey"))
      .select(col("o_orderkey"),
        round(col("o_totalprice").cast("decimal(20,2)") / col("_tot"), 6)
          .cast("double").as("share"),
        toBillionsR3(col("o_totalprice")).as("price_bn"))
  }

  val ratioScaleSql: String =
    "WITH t AS (SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(20,2))) AS _tot FROM orders GROUP BY o_custkey) " +
      "SELECT o_orderkey, CAST(ROUND(CAST(o_totalprice AS DECIMAL(20,2)) / _tot, 6) AS DOUBLE) AS share, " +
      "ROUND(o_totalprice / 1e9, 3) AS price_bn FROM orders JOIN t USING (o_custkey)"

  /** A-family — grouped aggregation with decimal-exact sums (the
    * flagship q1-style agg; partial aggregation map-side for free). */
  val aggGroup: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(20,2)")).cast("double").as("sum_qty"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(24,6)"))
          .cast("double").as("revenue"),
        count(lit(1)).as("n"))

  val aggGroupSql: String =
    "SELECT l_returnflag, l_linestatus, " +
      "CAST(SUM(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS sum_qty, " +
      "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue, " +
      "COUNT(*) AS n FROM lineitem GROUP BY l_returnflag, l_linestatus"

  /** Incremental aggregate maintenance — the warehouse pattern where a
    * standing aggregate table absorbs a delta batch by re-aggregating
    * MERGEABLE PARTIALS (counts and decimal sums add exactly; avg/var
    * would ship as (sum, n) pairs). Demonstrated by splitting events on
    * event_id parity into "base" and "delta", aggregating each
    * independently, and merging — the oracle aggregates the whole table
    * in one pass, so the hash gate proves partial-merge ≡ full re-agg.
    * At 100 TB this is the nightly-rollup shape: the delta pass touches
    * only new data, the merge touches only aggregate rows. */
  val aggMerge: Q = (s, d) => {
    val ev = Tables.events(s, d)
    def partial(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(24,6)")).as("s"))
    partial(ev.filter(col("event_id") % 2 === 0))
      .unionByName(partial(ev.filter(col("event_id") % 2 === 1)))
      .groupBy(col("user_id"))
      .agg(sum(col("n_events")).as("n_events"),
        sum(col("s")).cast("double").as("sum_value"))
  }

  val aggMergeSql: String =
    "SELECT user_id, COUNT(*) AS n_events, " +
      "CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS sum_value " +
      "FROM events GROUP BY user_id"

  /** J1/J2 — chained dimension joins (broadcast at any fact scale). */
  val joinDims: Q = (s, d) =>
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("c_acctbal").cast("decimal(20,2)")).cast("double").as("total_bal"))

  val joinDimsSql: String =
    "SELECT r_name, n_name, COUNT(*) AS n_customers, " +
      "CAST(SUM(CAST(c_acctbal AS DECIMAL(20,2))) AS DOUBLE) AS total_bal " +
      "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
      "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name, n_name"

  /** J7 — edge-endpoint resolution as inner joins (unmatched endpoints
    * silently drop, Cypher MATCH..MERGE semantics). */
  val joinEdges: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val su = Tables.supplier(s, d)
    val pa = Tables.part(s, d).filter(col("p_size") <= 20)
    li.join(su, col("l_suppkey") === col("s_suppkey"))
      .join(pa, col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("s_name"), col("p_name"))
  }

  val joinEdgesSql: String =
    "SELECT l_orderkey, l_linenumber, s_name, p_name FROM lineitem " +
      "JOIN supplier ON l_suppkey = s_suppkey " +
      "JOIN part ON l_partkey = p_partkey WHERE p_size <= 20"

  /** W1 — latest-per-group via single-shuffle window
    * (`preprocess_upload_neo4j.py:139-140`). */
  val latestPerGroup: Q = (s, d) =>
    EtlOps.latestPerGroup(
      Tables.orders(s, d).withColumn("_input_row_id", col("o_orderkey")),
      Seq("o_custkey"), "o_orderdate")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))

  val latestPerGroupSql: String =
    "SELECT o_custkey, o_orderkey, o_totalprice FROM (" +
      "SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey " +
      "ORDER BY o_orderdate DESC NULLS LAST, o_orderkey ASC) AS rn FROM orders) WHERE rn = 1"

  /** W2 — conflict-resolving dedup on a composite key
    * (`preprocess_upload_neo4j.py:181-182`). */
  val conflictDedup: Q = (s, d) =>
    EtlOps.dedupByOrder(
      Tables.lineitem(s, d),
      Seq("l_partkey", "l_suppkey"),
      Seq(desc_nulls_last("l_shipdate"), desc_nulls_last("l_extendedprice"),
        asc("l_orderkey"), asc("l_linenumber")))
      .select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"),
        col("l_linenumber"), col("l_extendedprice"))

  val conflictDedupSql: String =
    "SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber, l_extendedprice FROM (" +
      "SELECT *, ROW_NUMBER() OVER (PARTITION BY l_partkey, l_suppkey " +
      "ORDER BY l_shipdate DESC NULLS LAST, l_extendedprice DESC NULLS LAST, " +
      "l_orderkey ASC, l_linenumber ASC) AS rn FROM lineitem) WHERE rn = 1"

  /** W3 — group-wise min-rank descending (pandas rank("min") == RANK()). */
  val groupRank: Q = (s, d) =>
    EtlOps.groupRankDesc(Tables.orders(s, d), "o_custkey", "o_totalprice", "trade_rank")
      .select(col("o_custkey"), col("o_orderkey"), col("trade_rank"))

  val groupRankSql: String =
    "SELECT o_custkey, o_orderkey, CAST(RANK() OVER (PARTITION BY o_custkey " +
      "ORDER BY o_totalprice DESC NULLS LAST) AS DOUBLE) AS trade_rank FROM orders"

  /** W4 — ordinal rank by list position via posexplode
    * (`scrape_cia.py:214`). */
  val ordinalExplode: Q = (s, d) =>
    Tables.part(s, d)
      .select(col("p_partkey"), posexplode(split(col("p_type"), " ")))
      .select(col("p_partkey"), (col("pos") + 1).cast("long").as("rank"), col("col").as("tok"))

  // DuckDB zips parallel unnests in one SELECT (no WITH ORDINALITY)
  val ordinalExplodeSql: String =
    "SELECT p_partkey, CAST(unnest(generate_series(1, len(p))) AS BIGINT) AS rank, " +
      "unnest(p) AS tok FROM (SELECT p_partkey, string_split(p_type, ' ') AS p FROM part)"

  /** W5+W6 — global top-k with a total order. */
  val topK: Q = (s, d) =>
    Tables.orders(s, d)
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(50)
      .select(col("o_orderkey"), col("o_totalprice"))

  val topKSql: String =
    "SELECT o_orderkey, o_totalprice FROM orders " +
      "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50"

  /** U1 — union of role-renamed frames
    * (`preprocess_upload_neo4j.py:176`). */
  val unionRoles: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val exp = o.select(col("o_orderkey").as("id"), lit("exports").as("trade_type"),
      col("o_totalprice").as("amount"))
    val imp = o.filter(col("o_orderstatus") === "O")
      .select(col("o_orderkey").as("id"), lit("imports").as("trade_type"),
        col("o_totalprice").as("amount"))
    exp.unionByName(imp)
  }

  val unionRolesSql: String =
    "SELECT o_orderkey AS id, 'exports' AS trade_type, o_totalprice AS amount FROM orders " +
      "UNION ALL SELECT o_orderkey AS id, 'imports' AS trade_type, o_totalprice AS amount " +
      "FROM orders WHERE o_orderstatus = 'O'"

  /** A1 — set-collect aggregation, sorted + joined for deterministic
    * compare (`preprocess_upload_neo4j.py:204-208`). */
  val collectSet: Q = (s, d) =>
    Tables.part(s, d)
      .groupBy(col("p_brand"))
      .agg(array_join(array_sort(collect_set(col("p_type"))), "|").as("types"))

  val collectSetSql: String =
    "SELECT p_brand, array_to_string(list_sort(list(DISTINCT p_type)), '|') AS types " +
      "FROM part GROUP BY p_brand"

  /** A2 — distinct. */
  val distinctPairs: Q = (s, d) =>
    Tables.orders(s, d).select(col("o_orderstatus"), col("o_orderpriority")).distinct()

  val distinctPairsSql: String =
    "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders"

  /** A3 — keyed dedup with deterministic survivor (MERGE-by-key
    * upsert semantics). */
  val mergeDedup: Q = (s, d) =>
    EtlOps.dedupByOrder(Tables.customer(s, d), Seq("c_nationkey"),
      Seq(asc("c_custkey")))
      .select(col("c_nationkey"), col("c_custkey"), col("c_name"))

  val mergeDedupSql: String =
    "SELECT c_nationkey, c_custkey, c_name FROM (" +
      "SELECT *, ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_custkey ASC) AS rn " +
      "FROM customer) WHERE rn = 1"

  /** Hierarchical rollup (subtotals + grand total) — free from
    * Catalyst, shuffles once with grouping-id expansion. */
  val rollupAgg: Q = (s, d) =>
    Tables.orders(s, d)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(20,2)")).cast("double").as("total"))

  val rollupAggSql: String =
    "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, " +
      "CAST(SUM(CAST(o_totalprice AS DECIMAL(20,2))) AS DOUBLE) AS total " +
      "FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)"

  /** Full cube (every grouping-set combination) with the grouping-id
    * bitmask distinguishing subtotal levels — completes the
    * rollup/pivot grouping-sets family. Same single-shuffle
    * grouping-id expansion plan as rollup. */
  val cubeAgg: Q = (s, d) =>
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"),
        sum(col("l_quantity").cast("decimal(20,2)")).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))

  val cubeAggSql: String =
    "SELECT l_returnflag, l_linestatus, " +
      "GROUPING_ID(l_returnflag, l_linestatus) AS gid, " +
      "CAST(SUM(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS sum_qty, " +
      "COUNT(*) AS n FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"

  /** Unpivot (melt): wide metric columns to long (metric, value) rows —
    * the inverse of q_pivot. Pure map-side row expansion, no shuffle. */
  val unpivot: Q = (s, d) =>
    Tables.lineitem(s, d).unpivot(
      Array(col("l_orderkey"), col("l_linenumber")),
      Array(col("l_quantity"), col("l_extendedprice"), col("l_tax")),
      "metric", "value")

  val unpivotSql: String =
    Seq("l_quantity", "l_extendedprice", "l_tax").map(m =>
      s"SELECT l_orderkey, l_linenumber, '$m' AS metric, $m AS value FROM lineitem")
      .mkString(" UNION ALL ")

  /** The SQL front door: the same engine served through `spark.sql`
    * over registered views — with a correlated EXISTS subquery
    * (TPC-H Q4 shape) Catalyst rewrites into a left-semi join. A user
    * of the reference who wants SQL, not DataFrames, runs this path. */
  val sqlInterface: Q = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("g_orders")
    Tables.lineitem(s, d).createOrReplaceTempView("g_lineitem")
    s.sql(
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM g_orders
        |WHERE EXISTS (SELECT 1 FROM g_lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority""".stripMargin)
  }

  val sqlInterfaceSql: String =
    "SELECT o_orderpriority, count(*) AS n_orders FROM orders " +
      "WHERE EXISTS (SELECT 1 FROM lineitem " +
      "WHERE l_orderkey = o_orderkey AND l_quantity > 45) " +
      "GROUP BY o_orderpriority"

  /** Set operations (intersect/except distinct). */
  val setOps: Q = (s, d) => {
    val hi = Tables.orders(s, d).filter(col("o_totalprice") > 100000)
      .select(col("o_custkey"))
    val open = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
      .select(col("o_custkey"))
    hi.intersect(open)
      .withColumn("tag", lit("both"))
      .unionByName(hi.except(open).withColumn("tag", lit("hi_only")))
  }

  val setOpsSql: String =
    "WITH hi AS (SELECT o_custkey FROM orders WHERE o_totalprice > 100000), " +
      "op AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O') " +
      "SELECT o_custkey, 'both' AS tag FROM (SELECT * FROM hi INTERSECT SELECT * FROM op) " +
      "UNION ALL SELECT o_custkey, 'hi_only' AS tag FROM (SELECT * FROM hi EXCEPT SELECT * FROM op)"

  /** Pivot (reshape long->wide); oracle uses the portable conditional-
    * aggregation form, which is also the shape Spark compiles to. */
  val pivotAgg: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "purchase", "error"))
      .agg(count(lit(1)))
      .na.fill(0)
      .select(col("user_id"), col("click"), col("purchase"), col("error"))

  val pivotAggSql: String =
    "SELECT user_id, " +
      "COUNT(*) FILTER (WHERE event_type = 'click') AS click, " +
      "COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase, " +
      "COUNT(*) FILTER (WHERE event_type = 'error') AS error " +
      "FROM events GROUP BY user_id"

  /** Exact distinct-count per group (the partial-agg tree dedups
    * map-side; approximate HLL is the documented 100 TB variant but is
    * not cross-engine verifiable). */
  val distinctCount: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_rows"))

  val distinctCountSql: String =
    "SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts, COUNT(*) AS n_rows " +
      "FROM lineitem GROUP BY l_returnflag"

  /** Exact percentiles (sorted-exact, interpolated — scalable via the
    * single-shuffle percentile aggregate; approx_percentile is the
    * 100 TB sketch variant but isn't cross-engine verifiable). */
  val percentileAgg: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(expr("round(percentile(value, 0.5), 6)").as("p50"),
        expr("round(percentile(value, 0.9), 6)").as("p90"))

  val percentileAggSql: String =
    "SELECT event_type, round(quantile_cont(value, 0.5), 6) AS p50, " +
      "round(quantile_cont(value, 0.9), 6) AS p90 FROM events GROUP BY event_type"

  /** Portable Count-Min sketch (X100): frequency estimates for a probe
    * key set from a depth×width counter table — the frequency sibling
    * of the portable HLL (fixed md5 hash layout, integer-only math ⇒
    * bit-identical across engines, hash-verified exactly). The counter
    * table is the mergeable partial a 100 TB pipeline ships instead of
    * data; emits the estimate, the exact count, and the CMS
    * never-underestimates guarantee per probe. */
  val CMS_PROBES: Seq[Long] = Seq(1L, 2L, 3L, 5L, 8L, 13L, 21L)

  val cmsPortable: Q = (s, d) =>
    graft.operators.Sketches.cmsFrequency(
      Tables.lineitem(s, d), "l_partkey", CMS_PROBES)

  val cmsPortableSql: String =
    graft.operators.Sketches.cmsFrequencySql("lineitem", "l_partkey", CMS_PROBES)

  /** Robust statistics (X99): per-group median absolute deviation —
    * the outlier-resistant spread measure quality pipelines threshold
    * on (value ∉ med ± k·MAD). Two grouped exact-percentile passes
    * with the group-medians table BROADCAST back (it is #groups rows
    * by construction); both engines interpolate quantiles identically
    * (pinned by q_percentile), and the deviation arithmetic is the
    * same IEEE subtract/abs, so the result hash-matches at 6dp. */
  val groupMad: Q = (s, d) => {
    val e = Tables.events(s, d).select(col("event_type"), col("value"))
    val med = e.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("_med"))
    e.join(broadcast(med), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        expr("round(percentile(abs(value - _med), 0.5), 6)").as("mad"),
        round(max(abs(col("value") - col("_med"))), 6).as("max_abs_dev"))
  }

  val groupMadSql: String =
    "WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY event_type) " +
      "SELECT e.event_type, count(*) AS n, " +
      "round(quantile_cont(abs(value - med), 0.5), 6) AS mad, " +
      "round(max(abs(value - med)), 6) AS max_abs_dev " +
      "FROM events e JOIN m USING (event_type) GROUP BY e.event_type"

  /** Fixed-width histogram via floor bucketing (portable; DuckDB has
    * no width_bucket). */
  val histogram: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("event_type"),
        floor(col("value") / 20).cast("int").as("bucket"))
      .agg(count(lit(1)).as("n"))

  val histogramSql: String =
    "SELECT event_type, CAST(floor(value / 20) AS INT) AS bucket, COUNT(*) AS n " +
      "FROM events GROUP BY 1, 2"

  /** Statistical aggregates (corr/covar/stddev), rounded for
    * cross-engine merge-order float stability. */
  val statsAgg: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"),
        round(stddev_samp(col("l_discount")), 6).as("discount_sd"))

  val statsAggSql: String =
    "SELECT l_returnflag, round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr, " +
      "round(stddev_samp(l_discount), 6) AS discount_sd FROM lineitem GROUP BY l_returnflag"

  /** HLL sketch distinct-count — the 100 TB path for cardinality
    * (bounded memory, mergeable partials). The estimate itself is
    * engine-private (Spark's HLL++ and DuckDB's sketch disagree by
    * design), so the ORACLED columns are the exact count and a
    * within-bound verdict: the sketch must land within 3·rsd (6%) of
    * exact, which the oracle asserts as a constant `true`. This keeps
    * the approximate operator fully driver-green instead of a
    * permanently grey rows-only row; q_hll_portable is the
    * register-exact sibling and q_distinct_count the exact one. */
  val hllDistinct: Q = (s, d) =>
    // distinct-first: dedup (flag, partkey) with map-side partial
    // aggregation, then one plain agg computes the exact count AND the
    // sketch over the deduped stream — an HLL's registers are
    // max-of-hashes, so deduping the input leaves the estimate
    // IDENTICAL while the plan avoids the Expand double-shuffle a
    // mixed distinct/non-distinct aggregate pays
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_partkey")).distinct()
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("exact_parts"),
        approx_count_distinct(col("l_partkey"), rsd = 0.02).as("_approx"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("_approx") - col("exact_parts")).cast("double") <=
          col("exact_parts").cast("double") * 0.06).as("within_bound"))

  val hllDistinctSql: String =
    "SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts, " +
      "true AS within_bound FROM lineitem GROUP BY l_returnflag"

  /** Portable HLL (operators/Sketches): same sketch computed by BOTH
    * engines register-for-register — the approximate result becomes
    * exactly hash-verifiable, unlike the engine-private
    * approx_count_distinct above. */
  val hllPortable: Q = (s, d) =>
    graft.operators.Sketches.hllDistinct(
      Tables.lineitem(s, d), Seq("l_returnflag"), "l_partkey")

  val hllPortableSql: String =
    graft.operators.Sketches.hllDistinctSql(
      "lineitem", Seq("l_returnflag"), "l_partkey")

  /** Portable-sketch SET operations: |A|, |B|, |A∪B| via per-register
    * max merge (the mergeable-partials property that combines per-day
    * sketches at 100 TB without rescanning), |A∩B| by
    * inclusion–exclusion — all register math integer-exact, so the
    * approximate results hash-match across engines. */
  val sketchSetOps: Q = (s, d) =>
    graft.operators.Sketches.hllSetOps(
      Tables.lineitem(s, d).filter(col("l_returnflag") === "A"),
      Tables.lineitem(s, d).filter(col("l_returnflag") === "R"),
      "l_partkey")

  val sketchSetOpsSql: String =
    graft.operators.Sketches.hllSetOpsSql("lineitem", "l_partkey",
      "l_returnflag = 'A'", "l_returnflag = 'R'")

  /** Portable mergeable BLOOM filter (X192): membership completing
    * the portable sketch family (HLL cardinality, CMS frequency).
    * Two slice filters (o_orderkey parity) MERGE by per-word bit_or
    * — merge ≡ built-from-all is spec-pinned, so the oracle replays
    * the all-rows form — and the probe set mixes present and absent
    * customer keys; a Bloom filter never lies negative, verified by
    * the never_false_negative column. */
  private val BLOOM_PROBES: Seq[Long] =
    (1 to 15).map(_ * 7L) ++ Seq(-5L, -77L, 1000000007L)

  val bloomPortable: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val a = graft.operators.Sketches.bloomRecords(
      o.filter(col("o_orderkey") % 2 === 0), "o_custkey")
    val b = graft.operators.Sketches.bloomRecords(
      o.filter(col("o_orderkey") % 2 =!= 0), "o_custkey")
    val probed = graft.operators.Sketches.bloomProbe(
      graft.operators.Sketches.bloomMerge(a, b), BLOOM_PROBES)
    val exact = o.select(col("o_custkey").cast("long").as("probe_key"))
      .filter(col("probe_key").isin(BLOOM_PROBES: _*))
      .distinct().withColumn("_e", lit(true))
    probed.join(exact, Seq("probe_key"), "left")
      .select(col("probe_key"), col("might_contain"),
        coalesce(col("_e"), lit(false)).as("exact_present"))
      .withColumn("never_false_negative",
        !col("exact_present") || col("might_contain"))
  }

  val bloomPortableSql: String =
    graft.operators.Sketches.bloomProbeSql("orders", "o_custkey",
      BLOOM_PROBES)

  /** All relational queries + oracles. */
  val queries: Map[String, Q] = Map(
    "q_scan_project" -> scanProject,
    "q_filter_regex" -> filterRegex,
    "q_filter_eq" -> filterEq,
    "q_masked_update" -> maskedUpdate,
    "q_rename_cast" -> renameCast,
    "q_lit_fill" -> litFill,
    "q_currency_parse" -> currencyParse,
    "q_year_extract" -> yearExtract,
    "q_percentage_parse" -> percentageParse,
    "q_canonicalize" -> canonicalize,
    "q_ratio_scale" -> ratioScale,
    "q_agg_group" -> aggGroup,
    "q_agg_merge" -> aggMerge,
    "q_join_dims" -> joinDims,
    "q_join_edges" -> joinEdges,
    "q_latest_per_group" -> latestPerGroup,
    "q_conflict_dedup" -> conflictDedup,
    "q_group_rank" -> groupRank,
    "q_ordinal_explode" -> ordinalExplode,
    "q_topk" -> topK,
    "q_union_roles" -> unionRoles,
    "q_collect_set" -> collectSet,
    "q_distinct" -> distinctPairs,
    "q_merge_dedup" -> mergeDedup,
    "q_rollup" -> rollupAgg,
    "q_cube" -> cubeAgg,
    "q_unpivot" -> unpivot,
    "q_sql_interface" -> sqlInterface,
    "q_setops" -> setOps,
    "q_pivot" -> pivotAgg,
    "q_distinct_count" -> distinctCount,
    "q_percentile" -> percentileAgg,
    "q_histogram" -> histogram,
    "q_stats_agg" -> statsAgg,
    "q_hll_distinct" -> hllDistinct,
    "q_hll_portable" -> hllPortable,
    "q_sketch_setops" -> sketchSetOps,
    "q_group_mad" -> groupMad,
    "q_cms_portable" -> cmsPortable,
    "q_bloom_portable" -> bloomPortable)

  val oracles: Map[String, String] = Map(
    "q_scan_project" -> scanProjectSql,
    "q_filter_regex" -> filterRegexSql,
    "q_filter_eq" -> filterEqSql,
    "q_masked_update" -> maskedUpdateSql,
    "q_rename_cast" -> renameCastSql,
    "q_lit_fill" -> litFillSql,
    "q_currency_parse" -> currencyParseSql,
    "q_year_extract" -> yearExtractSql,
    "q_percentage_parse" -> percentageParseSql,
    "q_canonicalize" -> canonicalizeSql,
    "q_ratio_scale" -> ratioScaleSql,
    "q_agg_group" -> aggGroupSql,
    "q_agg_merge" -> aggMergeSql,
    "q_join_dims" -> joinDimsSql,
    "q_join_edges" -> joinEdgesSql,
    "q_latest_per_group" -> latestPerGroupSql,
    "q_conflict_dedup" -> conflictDedupSql,
    "q_group_rank" -> groupRankSql,
    "q_ordinal_explode" -> ordinalExplodeSql,
    "q_topk" -> topKSql,
    "q_union_roles" -> unionRolesSql,
    "q_collect_set" -> collectSetSql,
    "q_distinct" -> distinctPairsSql,
    "q_merge_dedup" -> mergeDedupSql,
    "q_rollup" -> rollupAggSql,
    "q_cube" -> cubeAggSql,
    "q_unpivot" -> unpivotSql,
    "q_sql_interface" -> sqlInterfaceSql,
    "q_setops" -> setOpsSql,
    "q_pivot" -> pivotAggSql,
    "q_distinct_count" -> distinctCountSql,
    "q_percentile" -> percentileAggSql,
    "q_histogram" -> histogramSql,
    "q_stats_agg" -> statsAggSql,
    "q_hll_distinct" -> hllDistinctSql,
    "q_hll_portable" -> hllPortableSql,
    "q_sketch_setops" -> sketchSetOpsSql,
    "q_group_mad" -> groupMadSql,
    "q_cms_portable" -> cmsPortableSql,
    "q_bloom_portable" -> bloomPortableSql)
}
