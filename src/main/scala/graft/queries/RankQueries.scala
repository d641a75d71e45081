package graft.queries

import graft.core.Caches.TrackedPersist

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Flagship graph-rank queries and their GENERATED DuckDB oracles.
  *
  * The GDS truncated-series semantics (see Ranks.powerIterate: rank =
  * (1-d)·Σ_{k=0..n-1}(d·Mᵀ)^k·1, i.e. n-1 delta rounds for
  * maxIterations=n) is plain SQL over the edge list — here generated
  * as chained CTE steps t0..t{n-1}, one per delta round. That gives
  * the driver's hash gate a VALUE-level check for the graph path
  * (q_trade_ranks was rows-only in round 1). Fold-order noise between
  * engines (edge-order Scala fold vs hash-agg SUM) is absorbed by the
  * round(6) both sides apply.
  *
  * Reference: the ranks come from Neo4j GDS over the country trade
  * graph (`preprocess_upload_neo4j.py:401-447`); the headline README
  * query ("top 50 countries by PageRank and their top export partner",
  * `README.md:21-26`) is `q_top50_partners`.
  */
object RankQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Same join/filter/distinct pipeline as SparkEntry.nationTradeEdges,
    * as a DuckDB CTE (unweighted: ranks only need the distinct pairs). */
  private val edgeCte: String =
    "edges AS MATERIALIZED (SELECT DISTINCT n1.n_name AS src, n2.n_name AS dst " +
      "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey " +
      "JOIN customer c ON o.o_custkey = c.c_custkey " +
      "JOIN supplier s ON l.l_suppkey = s.s_suppkey " +
      "JOIN nation n1 ON s.s_nationkey = n1.n_nationkey " +
      "JOIN nation n2 ON c.c_nationkey = n2.n_nationkey " +
      "WHERE n1.n_name <> n2.n_name)"

  /** WITH-clause implementing the delta series: t0 seeds every vertex
    * with (1-d); step k propagates term/denominator along edges and
    * accumulates. PageRank denominator = outDeg; ArticleRank = outDeg
    * + avgOutDeg. Multiplication forms mirror Ranks.rankTableLocal
    * exactly (term * (1.0/denom), then d * Σ). */
  private def rankSeriesCtes(iters: Int, damping: Double): String = {
    // Scala Double.toString round-trips, so the SQL literal parses to
    // the IDENTICAL double (1-0.85 is not 0.15 in binary)
    val init = (1.0 - damping).toString
    val d = damping.toString
    val head = Seq(
      edgeCte,
      "verts AS MATERIALIZED (SELECT src AS name FROM edges UNION SELECT dst FROM edges)",
      "deg AS MATERIALIZED (SELECT v.name, coalesce(g.cnt, 0) AS od FROM verts v " +
        "LEFT JOIN (SELECT src, count(*) AS cnt FROM edges GROUP BY src) g ON g.src = v.name)",
      "st AS MATERIALIZED (SELECT CAST((SELECT count(*) FROM edges) AS DOUBLE) / (SELECT count(*) FROM verts) AS avgdeg)",
      s"t0 AS MATERIALIZED (SELECT name, CAST($init AS DOUBLE) AS pr, CAST($init AS DOUBLE) AS prt, " +
        s"CAST($init AS DOUBLE) AS ar, CAST($init AS DOUBLE) AS art FROM verts)")
    val steps = (1 until iters).flatMap { k =>
      Seq(
        s"m$k AS MATERIALIZED (SELECT e.dst AS name, sum(t.prt * (1.0/dg.od)) AS mpr, " +
          s"sum(t.art * (1.0/(dg.od + st.avgdeg))) AS mar " +
          s"FROM t${k - 1} t JOIN edges e ON t.name = e.src " +
          s"JOIN deg dg ON dg.name = t.name CROSS JOIN st GROUP BY e.dst)",
        s"t$k AS MATERIALIZED (SELECT t.name, t.pr + $d*coalesce(m.mpr, 0.0) AS pr, $d*coalesce(m.mpr, 0.0) AS prt, " +
          s"t.ar + $d*coalesce(m.mar, 0.0) AS ar, $d*coalesce(m.mar, 0.0) AS art " +
          s"FROM t${k - 1} t LEFT JOIN m$k m ON m.name = t.name)")
    }
    "WITH " + (head ++ steps).mkString(", ")
  }

  def tradeRanksSql(iters: Int = 20, damping: Double = 0.85): String =
    rankSeriesCtes(iters, damping) +
      s" SELECT name, round(pr, 6) AS pagerank, round(ar, 6) AS articlerank FROM t${iters - 1}"

  /** Warm-start rank continuation (X138): the stored 20-iteration
    * rank STATE resumed 4 delta rounds — the recurrence is memoryless
    * given (rank, term), so the result is EXACTLY the 24-iteration
    * cold run and the oracle is the same generated delta-series SQL at
    * 24 iterations. The graph-side incremental row: a rank refresh
    * runs m cheap rounds from the checkpoint instead of replaying the
    * whole series over history. */
  val warmRanks: Q = (s, dir) => {
    val edges = graft.SparkEntry.nationTradeEdges(s, dir).persistTracked()
    val state = graft.graph.Ranks.rankStateTable(
      edges, "src_nation", "dst_nation", iters = 20)
    graft.graph.Ranks.resumeRankTable(
      edges, "src_nation", "dst_nation", state, extraRounds = 4)
      .select(col("name"), round(col("pagerank"), 6).as("pagerank"),
        round(col("articlerank"), 6).as("articlerank"))
  }

  /** README headline: top 50 countries by PageRank, each with the
    * country it exports the most to (`/root/reference/README.md:21-26`).
    * rank-1 partner by edge amount (tie-break partner name asc);
    * global order by (rounded pagerank desc, name asc). Countries with
    * no exports keep a null partner (left join). */
  val top50Partners: Q = (s, dir) => {
    // ONE edge aggregation feeds both the ranks and the partner pick:
    // persist before rankTable (which respects caller-managed caches)
    val edges = graft.SparkEntry.nationTradeEdges(s, dir)
      .persistTracked()
    val ranks = graft.graph.Ranks
      .rankTable(edges, "src_nation", "dst_nation")
      .select(col("name"), round(col("pagerank"), 6).as("pagerank"))
    val wPart = Window.partitionBy("src_nation")
      .orderBy(desc("amount"), asc("dst_nation"))
    val top1 = edges.withColumn("_rn", row_number().over(wPart))
      .filter(col("_rn") === 1)
      .select(col("src_nation").as("name"), col("dst_nation").as("top_partner"),
        col("amount").as("partner_amount"))
    val wAll = Window.orderBy(desc("pagerank"), asc("name"))
    ranks.withColumn("rrank", row_number().over(wAll))
      .filter(col("rrank") <= 50)
      .join(top1, Seq("name"), "left")
      .select(col("name"), col("pagerank"), col("rrank"),
        col("top_partner"), col("partner_amount"))
  }

  /** README headline, IMPORTS direction: top 50 countries by PageRank,
    * each with the country it IMPORTS the most from
    * (`/root/reference/README.md:26`, `img/imports.svg`) — the mirror
    * of [[top50Partners]]: the partner pick ranks INCOMING edges per
    * destination (rank-1 source by edge amount, tie-break source name
    * asc). Same one-edge-aggregation shape: the persisted edge table
    * feeds both the ranks and the partner window; the window is a
    * per-destination partial order over a #nations²-bounded table, so
    * the whole query stays on the rank backbone — no fact-table
    * rescan. */
  val top50ImportPartners: Q = (s, dir) => {
    val edges = graft.SparkEntry.nationTradeEdges(s, dir)
      .persistTracked()
    val ranks = graft.graph.Ranks
      .rankTable(edges, "src_nation", "dst_nation")
      .select(col("name"), round(col("pagerank"), 6).as("pagerank"))
    val wPart = Window.partitionBy("dst_nation")
      .orderBy(desc("amount"), asc("src_nation"))
    val top1 = edges.withColumn("_rn", row_number().over(wPart))
      .filter(col("_rn") === 1)
      .select(col("dst_nation").as("name"), col("src_nation").as("top_source"),
        col("amount").as("source_amount"))
    val wAll = Window.orderBy(desc("pagerank"), asc("name"))
    ranks.withColumn("rrank", row_number().over(wAll))
      .filter(col("rrank") <= 50)
      .join(top1, Seq("name"), "left")
      .select(col("name"), col("pagerank"), col("rrank"),
        col("top_source"), col("source_amount"))
  }

  def top50ImportPartnersSql(iters: Int = 20, damping: Double = 0.85): String =
    rankSeriesCtes(iters, damping) +
      s", $amtCte" +
      ", p1 AS (SELECT src, dst, amount FROM (SELECT src, dst, amount, " +
      "row_number() OVER (PARTITION BY dst ORDER BY amount DESC, src ASC) AS rn FROM amt) WHERE rn = 1)" +
      s", rk AS (SELECT name, round(pr, 6) AS pagerank, " +
      s"CAST(row_number() OVER (ORDER BY round(pr, 6) DESC, name ASC) AS INT) AS rrank FROM t${iters - 1}) " +
      "SELECT r.name, r.pagerank, r.rrank, p.src AS top_source, p.amount AS source_amount " +
      "FROM rk r LEFT JOIN p1 p ON p.dst = r.name WHERE r.rrank <= 50"

  /** Weighted nation-edge aggregate (same pipeline as
    * SparkEntry.nationTradeEdges WITH the amount) — shared by the
    * top-50 and community oracles. */
  private val amtCte: String =
    "amt AS MATERIALIZED (SELECT n1.n_name AS src, n2.n_name AS dst, " +
      "CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS amount " +
      "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey " +
      "JOIN customer c ON o.o_custkey = c.c_custkey " +
      "JOIN supplier s ON l.l_suppkey = s.s_suppkey " +
      "JOIN nation n1 ON s.s_nationkey = n1.n_nationkey " +
      "JOIN nation n2 ON c.c_nationkey = n2.n_nationkey " +
      "WHERE n1.n_name <> n2.n_name GROUP BY 1, 2)"

  def top50PartnersSql(iters: Int = 20, damping: Double = 0.85): String =
    rankSeriesCtes(iters, damping) +
      s", $amtCte" +
      ", p1 AS (SELECT src, dst, amount FROM (SELECT src, dst, amount, " +
      "row_number() OVER (PARTITION BY src ORDER BY amount DESC, dst ASC) AS rn FROM amt) WHERE rn = 1)" +
      s", rk AS (SELECT name, round(pr, 6) AS pagerank, " +
      s"CAST(row_number() OVER (ORDER BY round(pr, 6) DESC, name ASC) AS INT) AS rrank FROM t${iters - 1}) " +
      "SELECT r.name, r.pagerank, r.rrank, p.dst AS top_partner, p.amount AS partner_amount " +
      "FROM rk r LEFT JOIN p1 p ON p.src = r.name WHERE r.rrank <= 50"

  /** Per-nation triangle participation over the undirected trade graph:
    * canonicalize each edge to (a < b), enumerate (a,b),(b,c),(a,c)
    * wedges with a < b < c via two equi-joins, count triangles touching
    * each vertex. The a<b<c ordering enumerates each triangle exactly
    * once AND keeps the join fan-out one-directional — the standard
    * distributed-triangle trick (at web scale you'd order by degree
    * instead of name; the plan is identical). */
  val triangles: Q = (s, dir) => {
    val und = graft.SparkEntry.nationTradeEdges(s, dir)
      .select(least(col("src_nation"), col("dst_nation")).as("a"),
        greatest(col("src_nation"), col("dst_nation")).as("b"))
      .distinct()
      .persistTracked()
    val tri = und
      .join(und.select(col("a").as("b"), col("b").as("c")), Seq("b"))
      .join(und.select(col("a"), col("b").as("c")), Seq("a", "c"), "left_semi")
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("name"))
      .groupBy(col("name")).agg(count(lit(1)).as("n_triangles"))
  }

  val trianglesSql: String =
    s"WITH $edgeCte, " +
      "und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM edges), " +
      "tri AS (SELECT e1.a, e1.b, e2.b AS c FROM und e1 " +
      "JOIN und e2 ON e1.b = e2.a " +
      "JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b) " +
      "SELECT name, count(*) AS n_triangles FROM " +
      "(SELECT unnest([a, b, c]) AS name FROM tri) GROUP BY name"

  /** BFS hop distance from NATION_0 over the directed trade graph,
    * bounded at 3 hops — the `MATCH (a)-[*..3]->(b)` reachability
    * query a graph store answers. Oracle = one chained CTE per BFS
    * level (frontier join + first-reach anti-filter, exactly the
    * superstep the Spark loop runs). */
  val hops: Q = (s, dir) =>
    graft.graph.Traversal.hopDistance(
      graft.SparkEntry.nationTradeEdges(s, dir),
      "src_nation", "dst_nation", Seq("NATION_0"), maxHops = 3)

  def hopsSql(seed: String = "NATION_0", maxHops: Int = 3): String = {
    val head = Seq(edgeCte, s"d0 AS (SELECT '$seed' AS name, 0 AS hop)")
    val steps = (1 to maxHops).flatMap { k =>
      Seq(
        s"f$k AS (SELECT DISTINCT e.dst AS name FROM d${k - 1} t " +
          s"JOIN edges e ON e.src = t.name WHERE t.hop = ${k - 1})",
        s"d$k AS (SELECT name, hop FROM d${k - 1} UNION ALL " +
          s"SELECT f.name, $k FROM f$k f " +
          s"WHERE f.name NOT IN (SELECT name FROM d${k - 1}))")
    }
    "WITH " + (head ++ steps).mkString(", ") +
      s" SELECT name, hop FROM d$maxHops"
  }

  /** Community detection: deterministic synchronous label propagation
    * (3 rounds, most-frequent-neighbour label, min-label tie-break)
    * over each nation's top-3 export partners — the full trade graph
    * is near-complete, so communities only emerge on the strong-edge
    * backbone. Oracle = one chained CTE per LPA round. */
  val communities: Q = (s, dir) => {
    val edges = graft.SparkEntry.nationTradeEdges(s, dir)
    val w = Window.partitionBy("src_nation")
      .orderBy(desc("amount"), asc("dst_nation"))
    val top3 = edges.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= 3)
      .select(col("src_nation"), col("dst_nation"))
    graft.graph.Traversal.labelPropagation(
      top3, "src_nation", "dst_nation", iters = 3)
  }

  def communitiesSql(iters: Int = 3): String = {
    val head = Seq(
      amtCte,
      "top3 AS (SELECT src, dst FROM (SELECT src, dst, " +
        "row_number() OVER (PARTITION BY src ORDER BY amount DESC, dst ASC) AS rn " +
        "FROM amt) WHERE rn <= 3)",
      "und AS MATERIALIZED (SELECT DISTINCT a, b FROM " +
        "(SELECT src AS a, dst AS b FROM top3 UNION ALL SELECT dst, src FROM top3))",
      "l0 AS (SELECT DISTINCT a AS name, a AS label FROM und)")
    val steps = (1 to iters).map { k =>
      s"l$k AS (SELECT name, label FROM (SELECT u.a AS name, x.label, " +
        "row_number() OVER (PARTITION BY u.a ORDER BY count(*) DESC, x.label ASC) AS rn " +
        s"FROM und u JOIN l${k - 1} x ON x.name = u.b GROUP BY u.a, x.label) WHERE rn = 1)"
    }
    "WITH " + (head ++ steps).mkString(", ") +
      s" SELECT name, label AS community FROM l$iters"
  }

  /** k-core of the top-3 trade backbone (X125): iterative peel of
    * vertices with undirected degree < 3 to a fixpoint. The full trade
    * graph is near-complete (every core trivially survives), so the
    * decomposition only says something on the strong-edge backbone —
    * the same reasoning as communities. Oracle = one chained
    * (degree, prune) CTE pair per peel round at a fixed bound ≥ the
    * vertex count; peeling is monotone, so the early-exit Spark loop
    * and the fixed-round oracle land on the same fixpoint. */
  val kcore: Q = (s, dir) => {
    val edges = graft.SparkEntry.nationTradeEdges(s, dir)
    val w = Window.partitionBy("src_nation")
      .orderBy(desc("amount"), asc("dst_nation"))
    val top3 = edges.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= 3)
      .select(col("src_nation"), col("dst_nation"))
    graft.graph.Traversal.kCore(top3, "src_nation", "dst_nation", k = 3)
  }

  def kcoreSql(k: Int = 3, rounds: Int = 30): String = {
    val head = Seq(
      amtCte,
      "top3 AS (SELECT src, dst FROM (SELECT src, dst, " +
        "row_number() OVER (PARTITION BY src ORDER BY amount DESC, dst ASC) AS rn " +
        "FROM amt) WHERE rn <= 3)",
      "e0 AS MATERIALIZED (SELECT DISTINCT a, b FROM " +
        "(SELECT src AS a, dst AS b FROM top3 UNION ALL SELECT dst, src FROM top3) WHERE a <> b)")
    val steps = (1 to rounds).flatMap { r =>
      Seq(
        s"g$r AS (SELECT a, count(*) AS dg FROM e${r - 1} GROUP BY a)",
        s"e$r AS MATERIALIZED (SELECT e.a, e.b FROM e${r - 1} e " +
          s"JOIN g$r x ON e.a = x.a JOIN g$r y ON e.b = y.a " +
          s"WHERE x.dg >= $k AND y.dg >= $k)")
    }
    "WITH " + (head ++ steps).mkString(", ") +
      s" SELECT a AS name, count(*) AS core_degree FROM e$rounds GROUP BY a"
  }

  /** HITS hubs & authorities (X126) over the directed top-3 export
    * backbone (the full trade graph is near-complete — uniform scores;
    * the backbone is asymmetric, so hubs and authorities diverge).
    * Exact integer power iteration: BIGINT sums, L∞ normalization by
    * integral division each half-step. Oracle = one (raw, normalized)
    * CTE pair per half-step with scalar-subquery maxima. */
  private val HITS_ITERS = 4

  val hits: Q = (s, dir) => {
    val edges = graft.SparkEntry.nationTradeEdges(s, dir)
    val w = Window.partitionBy("src_nation")
      .orderBy(desc("amount"), asc("dst_nation"))
    val top3 = edges.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= 3)
      .select(col("src_nation"), col("dst_nation"))
    graft.graph.Traversal.hits(top3, "src_nation", "dst_nation", HITS_ITERS)
  }

  def hitsSql(iters: Int = HITS_ITERS): String = {
    val head = Seq(
      amtCte,
      "top3 AS (SELECT src, dst FROM (SELECT src, dst, " +
        "row_number() OVER (PARTITION BY src ORDER BY amount DESC, dst ASC) AS rn " +
        "FROM amt) WHERE rn <= 3)",
      "e0 AS MATERIALIZED (SELECT DISTINCT src AS s, dst AS d FROM top3 WHERE src <> dst)",
      "verts AS MATERIALIZED (SELECT s AS name FROM e0 UNION SELECT d FROM e0)",
      "h0 AS (SELECT name, CAST(1000000 AS BIGINT) AS hub FROM verts)")
    val steps = (1 to iters).flatMap { r =>
      Seq(
        s"ar$r AS (SELECT e.d AS name, CAST(sum(h.hub) AS BIGINT) AS raw " +
          s"FROM e0 e JOIN h${r - 1} h ON h.name = e.s GROUP BY e.d)",
        s"a$r AS MATERIALIZED (SELECT v.name, CAST(coalesce(ar.raw * 1000000 // " +
          s"(SELECT max(raw) FROM ar$r), 0) AS BIGINT) AS authority " +
          s"FROM verts v LEFT JOIN ar$r ar ON v.name = ar.name)",
        s"hr$r AS (SELECT e.s AS name, CAST(sum(a.authority) AS BIGINT) AS raw " +
          s"FROM e0 e JOIN a$r a ON a.name = e.d GROUP BY e.s)",
        s"h$r AS MATERIALIZED (SELECT v.name, CAST(coalesce(hr.raw * 1000000 // " +
          s"(SELECT max(raw) FROM hr$r), 0) AS BIGINT) AS hub " +
          s"FROM verts v LEFT JOIN hr$r hr ON v.name = hr.name)")
    }
    "WITH " + (head ++ steps).mkString(", ") +
      s" SELECT a$iters.name, a$iters.authority, h$iters.hub " +
      s"FROM a$iters JOIN h$iters USING (name)"
  }

  /** Personalized PageRank from two seed nations — "what is close to
    * THESE nodes" proximity over the trade graph. Same truncated
    * delta series as the flagship ranks, restart mass on the seeds
    * only; unreachable vertices emit exactly 0.0. */
  val PPR_SEEDS: Seq[String] = Seq("NATION_0", "NATION_1")

  val ppr: Q = (s, dir) =>
    graft.graph.Ranks
      .pprTable(graft.SparkEntry.nationTradeEdges(s, dir),
        "src_nation", "dst_nation", PPR_SEEDS)
      .select(col("name"), round(col("ppr"), 6).as("ppr"))

  def pprSql(seeds: Seq[String] = PPR_SEEDS, iters: Int = 20,
      damping: Double = 0.85): String = {
    val init = (1.0 - damping).toString
    val d = damping.toString
    val seedList = seeds.map(n => s"'$n'").mkString(", ")
    val head = Seq(
      edgeCte,
      "verts AS MATERIALIZED (SELECT src AS name FROM edges UNION SELECT dst FROM edges)",
      "deg AS MATERIALIZED (SELECT v.name, coalesce(g.cnt, 0) AS od FROM verts v " +
        "LEFT JOIN (SELECT src, count(*) AS cnt FROM edges GROUP BY src) g ON g.src = v.name)",
      s"t0 AS MATERIALIZED (SELECT name, CASE WHEN name IN ($seedList) " +
        s"THEN CAST($init AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS pr, " +
        s"CASE WHEN name IN ($seedList) THEN CAST($init AS DOUBLE) " +
        "ELSE CAST(0.0 AS DOUBLE) END AS prt FROM verts)")
    val steps = (1 until iters).flatMap { k =>
      Seq(
        s"m$k AS MATERIALIZED (SELECT e.dst AS name, sum(t.prt * (1.0/dg.od)) AS mpr " +
          s"FROM t${k - 1} t JOIN edges e ON t.name = e.src " +
          "JOIN deg dg ON dg.name = t.name GROUP BY e.dst)",
        s"t$k AS MATERIALIZED (SELECT t.name, t.pr + $d*coalesce(m.mpr, 0.0) AS pr, " +
          s"$d*coalesce(m.mpr, 0.0) AS prt FROM t${k - 1} t LEFT JOIN m$k m ON m.name = t.name)")
    }
    "WITH " + (head ++ steps).mkString(", ") +
      s" SELECT name, round(pr, 6) AS ppr FROM t${iters - 1}"
  }

  /** Amount-weighted PageRank over the trade graph — the GDS
    * `relationshipWeightProperty` variant the reference projects the
    * data for but never turns on. */
  val weightedRanks: Q = (s, dir) =>
    graft.graph.Ranks
      .weightedRankTable(graft.SparkEntry.nationTradeEdges(s, dir),
        "src_nation", "dst_nation", "amount")
      .select(col("name"), round(col("wpagerank"), 6).as("wpagerank"))

  def weightedRanksSql(iters: Int = 20, damping: Double = 0.85): String = {
    val init = (1.0 - damping).toString
    val d = damping.toString
    val head = Seq(
      amtCte,
      "verts AS MATERIALIZED (SELECT src AS name FROM amt UNION SELECT dst FROM amt)",
      "wdeg AS MATERIALIZED (SELECT v.name, coalesce(g.w, 0.0) AS w FROM verts v " +
        "LEFT JOIN (SELECT src, SUM(amount) AS w FROM amt GROUP BY src) g ON g.src = v.name)",
      s"t0 AS MATERIALIZED (SELECT name, CAST($init AS DOUBLE) AS pr, " +
        s"CAST($init AS DOUBLE) AS prt FROM verts)")
    val steps = (1 until iters).flatMap { k =>
      Seq(
        s"m$k AS MATERIALIZED (SELECT e.dst AS name, " +
          "sum(t.prt * (1.0/dg.w) * e.amount) AS mpr " +
          s"FROM t${k - 1} t JOIN amt e ON t.name = e.src " +
          "JOIN wdeg dg ON dg.name = t.name AND dg.w > 0 GROUP BY e.dst)",
        s"t$k AS MATERIALIZED (SELECT t.name, t.pr + $d*coalesce(m.mpr, 0.0) AS pr, " +
          s"$d*coalesce(m.mpr, 0.0) AS prt FROM t${k - 1} t LEFT JOIN m$k m ON m.name = t.name)")
    }
    "WITH " + (head ++ steps).mkString(", ") +
      s" SELECT name, round(pr, 6) AS wpagerank FROM t${iters - 1}"
  }

  /** Weighted shortest path from NATION_0 over the top-3-partner
    * backbone, edge cost = partner rank (1 = strongest partner is the
    * cheapest hop) — the weighted `shortestPath` a Cypher user runs
    * after the reachability query. 5 bounded Bellman–Ford rounds,
    * BIGINT min-sums; oracle = one chained min-agg CTE per round
    * (exactly the Spark superstep). */
  val shortestPath: Q = (s, dir) => {
    val edges = graft.SparkEntry.nationTradeEdges(s, dir)
    val w = Window.partitionBy("src_nation")
      .orderBy(desc("amount"), asc("dst_nation"))
    val top3 = edges.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= 3)
      .select(col("src_nation"), col("dst_nation"),
        col("_rn").cast("long").as("w"))
    graft.graph.Traversal.shortestPath(
      top3, "src_nation", "dst_nation", "w", Seq("NATION_0"), rounds = 5)
  }

  def shortestPathSql(seed: String = "NATION_0", rounds: Int = 5): String = {
    val head = Seq(
      amtCte,
      "wedges AS MATERIALIZED (SELECT src, dst, CAST(rn AS BIGINT) AS w FROM " +
        "(SELECT src, dst, row_number() OVER (PARTITION BY src " +
        "ORDER BY amount DESC, dst ASC) AS rn FROM amt) WHERE rn <= 3)",
      s"d0 AS (SELECT '$seed' AS name, CAST(0 AS BIGINT) AS dist)")
    val steps = (1 to rounds).map { k =>
      s"d$k AS (SELECT name, min(dist) AS dist FROM " +
        s"(SELECT name, dist FROM d${k - 1} UNION ALL " +
        s"SELECT e.dst AS name, t.dist + e.w AS dist FROM d${k - 1} t " +
        "JOIN wedges e ON e.src = t.name) GROUP BY name)"
    }
    "WITH " + (head ++ steps).mkString(", ") +
      s" SELECT name, dist FROM d$rounds"
  }

  /** Recursive SQL front door (Spark 4 `WITH RECURSIVE`): bounded
    * walk counting from NATION_0 over the top-3-partner backbone —
    * (vertex, hop) rows with the number of distinct length-`hop`
    * walks reaching it. UNION ALL recursion + an explicit hop bound
    * (Spark does not yet allow UNION-dedup in recursive CTEs), exact
    * integer counts, identical SQL runs on DuckDB as the oracle. */
  val recursiveSql: Q = (s, dir) => {
    val edges = graft.SparkEntry.nationTradeEdges(s, dir)
    val w = Window.partitionBy("src_nation")
      .orderBy(desc("amount"), asc("dst_nation"))
    // materialize the backbone BEFORE registering the view: a temp
    // view is only a logical plan, and the recursion would otherwise
    // re-execute the full edge-aggregation pipeline on every
    // iteration (measured 8s -> ~1s at sf0.1)
    // the checkpointed backbone escapes via the temp view, but its
    // blocks are RDD-level (category 3, CheckpointProbeSpec): the
    // ContextCleaner reclaims them once the view is replaced/dropped
    // and the frame is unreferenced — tracking it would only PIN it
    edges.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= 3)
      .select(col("src_nation").as("src"), col("dst_nation").as("dst"))
      .localCheckpoint()
      .createOrReplaceTempView("graft_backbone")
    s.sql(
      """WITH RECURSIVE walk(name, hop) AS (
        |  SELECT 'NATION_0', 0
        |  UNION ALL
        |  SELECT e.dst, w.hop + 1 FROM walk w
        |  JOIN graft_backbone e ON e.src = w.name WHERE w.hop < 5
        |) SELECT name, hop, count(*) AS n_walks
        |FROM walk GROUP BY name, hop""".stripMargin)
  }

  def recursiveSqlOracle(seed: String = "NATION_0", bound: Int = 5): String =
    s"WITH RECURSIVE $amtCte, " +
      "bb AS MATERIALIZED (SELECT src, dst FROM (SELECT src, dst, " +
      "row_number() OVER (PARTITION BY src ORDER BY amount DESC, dst ASC) AS rn " +
      "FROM amt) WHERE rn <= 3), " +
      s"walk(name, hop) AS (SELECT '$seed', 0 UNION ALL " +
      "SELECT e.dst, w.hop + 1 FROM walk w JOIN bb e ON e.src = w.name " +
      s"WHERE w.hop < $bound) " +
      "SELECT name, hop, count(*) AS n_walks FROM walk GROUP BY name, hop"

  val queries: Map[String, Q] = Map(
    "q_recursive_sql" -> recursiveSql,
    "q_warm_ranks" -> warmRanks,
    "q_top50_partners" -> top50Partners,
    "q_top50_import_partners" -> top50ImportPartners,
    "q_triangles" -> triangles,
    "q_hops" -> hops,
    "q_communities" -> communities,
    "q_kcore" -> kcore,
    "q_hits" -> hits,
    "q_ppr" -> ppr,
    "q_weighted_ranks" -> weightedRanks,
    "q_shortest_path" -> shortestPath)

  val oracles: Map[String, String] = Map(
    "q_recursive_sql" -> recursiveSqlOracle(),
    "q_trade_ranks" -> tradeRanksSql(),
    "q_warm_ranks" -> tradeRanksSql(iters = 24),
    "q_top50_partners" -> top50PartnersSql(),
    "q_top50_import_partners" -> top50ImportPartnersSql(),
    "q_triangles" -> trianglesSql,
    "q_hops" -> hopsSql(),
    "q_communities" -> communitiesSql(),
    "q_kcore" -> kcoreSql(),
    "q_hits" -> hitsSql(),
    "q_ppr" -> pprSql(),
    "q_weighted_ranks" -> weightedRanksSql(),
    "q_shortest_path" -> shortestPathSql())
}
