package graft.graph

import graft.core.Caches.TrackedPersist

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph-traversal queries the reference's graph store would
  * answer in Cypher (`MATCH (a)-[*..k]->(b)`, community detection) —
  * re-expressed as bounded DataFrame iteration: each superstep is one
  * keyed join + aggregation, exactly the shuffle a Pregel round pays,
  * with the frontier/label set as the only iterated state.
  *
  * Scale shape: per-superstep cost is O(frontier ⋈ edges) with
  * short-key exchanges; the driver sees only a per-round convergence
  * count, never vertex data. Rounds are explicitly bounded (maxHops /
  * iters) so plan depth stays fixed; a 100 TB deployment would add a
  * `localCheckpoint` per ~10 rounds to truncate lineage (same as
  * `Dedup.connectedComponents`).
  */
object Traversal {

  /** Unweighted BFS hop distance from `seeds` along directed edges,
    * bounded at `maxHops`. Returns (name, hop) for every vertex
    * reached, hop = first-reach level (deterministic regardless of
    * partitioning: set semantics per level). Early-exits when a
    * frontier drains before the bound. */
  def hopDistance(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: Seq[String], maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col(srcCol).as("_s"), col(dstCol).as("_d"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var dist = seeds.toDF("name").withColumn("hop", lit(0))
    var frontier = dist
    var k = 0
    var drained = false
    while (k < maxHops && !drained) {
      k += 1
      val next = frontier.join(e, col("name") === col("_s"))
        .select(col("_d").as("name")).distinct()
        .join(dist, Seq("name"), "left_anti")
        .withColumn("hop", lit(k))
        .persistTracked()
      drained = next.isEmpty // the one action per superstep
      dist = dist.unionByName(next)
      frontier = next
    }
    e.unpersist()
    dist
  }

  /** Synchronous label propagation (community detection), `iters` fixed
    * rounds over the UNDIRECTED view of the edges. Every vertex starts
    * with its own name as label; each round it adopts the most frequent
    * label among its neighbours, ties broken by smallest label — the
    * deterministic variant of classic LPA (async/random tie-breaks
    * would never hash-verify). Returns (name, community). */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val und = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .unionByName(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .distinct()
      .persistTracked()
    var labels = und.select(col("a").as("name")).distinct()
      .withColumn("label", col("name"))
    val w = Window.partitionBy(col("a"))
      .orderBy(col("_n").desc, col("label").asc)
    for (_ <- 1 to iters) {
      labels = und
        .join(labels.withColumnRenamed("name", "b"), Seq("b"))
        .groupBy(col("a"), col("label")).agg(count(lit(1)).as("_n"))
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .select(col("a").as("name"), col("label"))
        // per-round lineage truncation (same policy as shortestPath /
        // connectedComponents). Checkpoint blocks are RDD-level
        // (invisible to CacheManager — CheckpointProbeSpec pins this),
        // so superseded rounds are reclaimed by the ContextCleaner
        // once this loop drops their frame reference: category 3 of
        // the cache-hygiene policy — eager unpersist is impossible
        // (no CacheManager entry) AND unsafe (no lineage to recompute
        // a checkpointed frame from).
        .localCheckpoint()
    }
    // labels is localCheckpoint()ed each round, so after >= 1 round
    // the undirected-edge cache is releasable here (same policy as
    // shortestPath); at iters = 0 labels still reads through `und`,
    // so leave that degenerate case to Caches.release
    if (iters > 0) und.unpersist()
    labels.withColumnRenamed("label", "community")
  }

  /** k-core membership (X125): iteratively peel vertices whose
    * UNDIRECTED degree is < k until a fixpoint; returns the k-core's
    * vertices with their within-core degree. Peeling is monotone, so
    * an early-stopped run equals any longer bound — which is what lets
    * a fixed-round chained-CTE oracle verify an early-exit loop.
    *
    * Scale shape: each round is one degree partial-agg + two semi-joins
    * on the edge list (all key-only shuffles — no vertex data rides
    * along), with per-round `localCheckpoint` lineage truncation (the
    * labelPropagation policy). Rounds are data-dependent but bounded
    * by the peel depth, which is ≤ the degeneracy ordering's length —
    * on real graphs tens of rounds, and each round strictly shrinks
    * the edge set or exits. The early-exit count probe reads a
    * checkpointed frame — O(1) result, no recompute. */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxRounds: Int = 1000): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    var und = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .unionByName(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    var prev = und.count()
    var round = 0
    var converged = prev == 0L
    while (!converged && round < maxRounds) {
      // shuffle-hash pinned: the survivor vertex set is graph-sized —
      // never a broadcast assumption from small-SF stats
      val keep = und.groupBy(col("a")).agg(count(lit(1)).as("_d"))
        .filter(col("_d") >= k).select(col("a"))
      val next = und.join(keep.hint("shuffle_hash"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("a", "b").hint("shuffle_hash"),
          Seq("b"), "left_semi")
        .select("a", "b")
        .localCheckpoint()
      val n = next.count()
      converged = n == prev
      prev = n
      und = next
      round += 1
    }
    // fail-loud, not silent truncation: a maxRounds exit before the
    // fixpoint would return vertices with degree < k still present —
    // rounds needed scale with the peel depth, so the bound must be
    // raised, never quietly absorbed (repo require() convention)
    require(converged,
      s"kCore: no fixpoint within maxRounds=$maxRounds rounds " +
        "(peel depth exceeds the bound) — raise maxRounds")
    und.groupBy(col("a")).agg(count(lit(1)).as("core_degree"))
      .withColumnRenamed("a", "name")
  }

  /** HITS hubs & authorities (X126) in EXACT integer arithmetic:
    * authority(v) = Σ hub(u) over in-edges u→v, hub(u) = Σ authority(v)
    * over out-edges, L∞-normalized after each half-step by integral
    * division floor(x·SCALE / max) — BIGINT sums and `div` only, so
    * every engine computes bit-identical scores (a float HITS would
    * hash-drift on sum order; the L∞ norm specifically because max is
    * order-free where an L1/L2 norm would be an unordered float sum).
    * Fixed `iters` full rounds (Kleinberg's power iteration, the
    * deterministic bounded form — same policy as the PageRank delta
    * series); vertices missing a side score 0 on it. Exact while
    * n·SCALE² < 2⁶³ (n < 9·10⁶ at SCALE 10⁶ — drop SCALE a decade per
    * decade of vertices beyond that).
    *
    * Scale shape: per half-step one edge-keyed partial-agg shuffle
    * (scores ride as one BIGINT per vertex) and one O(1)-result max
    * action; scores re-enter the plan by join, not literals, so the
    * driver never holds the vertex set. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, scale: Long = 1000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select(col(srcCol).as("_s"), col(dstCol).as("_d"))
      .filter(col("_s") =!= col("_d")).distinct()
      .persistTracked()
    val verts = e.select(col("_s").as("name"))
      .unionByName(e.select(col("_d").as("name"))).distinct()
      .persistTracked()
    // no edges -> no vertices: the empty result with the right schema
    // (the max() below would read NULL off an empty aggregate)
    if (e.isEmpty)
      return verts.withColumn("authority", lit(0L)).withColumn("hub", lit(0L))
    def normalized(raw0: DataFrame, scoreName: String): DataFrame = {
      // materialize the edge-join + partial agg ONCE (r21, guide §1.2):
      // checkpointing the NORMALIZED frame after the max action computed
      // the same join+agg twice per half-step — checkpoint the RAW
      // scores instead, read the max off the checkpointed rows, and let
      // the vertex-sized normalize join pipeline into the next
      // half-step's job. Halves the per-iteration shuffle work; the
      // per-round lineage truncation the checkpoint exists for is
      // unchanged (raw is the only frame the next step references).
      val raw = raw0.localCheckpoint()
      // O(1)-result action; non-null because e is non-empty and hub
      // scores start positive
      val mx = raw.agg(max(col("_raw"))).first().getLong(0)
      // shuffle-hash pinned: both sides are vertex-sized
      verts.join(raw.hint("shuffle_hash"), Seq("name"), "left")
        .select(col("name"),
          coalesce(expr(s"_raw * ${scale}L div ${mx}L"), lit(0L)).as(scoreName))
    }
    var hub = verts.withColumn("hub", lit(scale))
    // assigned on the first half-step (iters >= 1) — only hubs seed
    // in Kleinberg's iteration; there is no authority seed
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      auth = normalized(
        e.join(hub.withColumnRenamed("name", "_s").hint("shuffle_hash"), Seq("_s"))
          .groupBy(col("_d").as("name")).agg(sum(col("hub")).as("_raw")),
        "authority")
      hub = normalized(
        e.join(auth.withColumnRenamed("name", "_d").hint("shuffle_hash"), Seq("_d"))
          .groupBy(col("_s").as("name")).agg(sum(col("authority")).as("_raw")),
        "hub")
    }
    auth.join(hub, Seq("name"))
  }

  /** Weighted shortest path from `seeds` — bounded Bellman–Ford:
    * `rounds` synchronous relaxation supersteps over directed edges
    * with non-negative integer weights, so the result is the exact
    * min-cost distance among paths of ≤ `rounds` edges. Fixed round
    * count (no early exit) keeps the computation a pure function of
    * (edges, seeds, rounds) — the same recurrence an oracle can chase
    * CTE-by-CTE. BIGINT min-sums all the way: nothing to round, any
    * engine agrees bit-for-bit.
    *
    * Scale shape: each superstep is one frontier ⋈ edges equi-join +
    * one min-agg keyed by vertex — exactly a Pregel round's shuffle;
    * state is one (vertex, dist) row per reached vertex. Unreached
    * vertices never materialize. */
  def shortestPath(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, seeds: Seq[String], rounds: Int): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col(srcCol).as("_s"), col(dstCol).as("_d"),
      col(weightCol).cast("long").as("_w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var dist = seeds.toDF("name").withColumn("dist", lit(0L))
    for (_ <- 1 to rounds) {
      val relaxed = dist.join(e, col("name") === col("_s"))
        .select(col("_d").as("name"), (col("dist") + col("_w")).as("dist"))
      dist = dist.unionByName(relaxed)
        .groupBy(col("name")).agg(min(col("dist")).as("dist"))
        // truncate lineage per round (same policy as
        // Dedup.connectedComponents): without it the nested
        // join+agg plan deepens every round and Catalyst/AQE re-plan
        // the whole history each superstep. Superseded rounds'
        // checkpoint blocks are RDD-level and ContextCleaner-reclaimed
        // (category 3 — see labelPropagation / CheckpointProbeSpec).
        .localCheckpoint()
    }
    // dist is localCheckpoint()ed each round, so the projected-edge
    // cache is safe to release here (hopDistance does the same) —
    // callers outside Bench's clearCache would otherwise leak it
    e.unpersist()
    dist
  }
}
