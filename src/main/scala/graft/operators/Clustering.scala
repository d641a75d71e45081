package graft.operators

import graft.core.Caches.TrackedPersist

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed k-means (Lloyd's algorithm) — the centroid trainer for
  * the IVF coarse quantizer and the generic embedding-clustering
  * primitive of a training-data pipeline.
  *
  * Scale shape (the broadcast-k-means plan):
  *  - centroids (k × dims values) live on the driver and are folded
  *    into the plan as literals each round — the cluster never shuffles
  *    vectors to compare them;
  *  - ASSIGNMENT is a pure map-side argmin against those literals
  *    (zero shuffle between the scan and the cluster id), exactly like
  *    [[Similarity.ivfTopK]]'s cell assignment;
  *  - the UPDATE is one partial-agg shuffle keyed by (cluster, dim):
  *    map-side combine reduces each partition to ≤ k·dims rows before
  *    the exchange, so shuffle volume is O(partitions · k · dims),
  *    independent of corpus size;
  *  - per round: one job; the quantized corpus is cached once.
  *
  * Arithmetic is EXACT fixed-point: vectors quantize to scaled BIGINT
  * (floor(x·scale + 0.5) — the same half-up form as
  * [[Similarity.quantizeInt8Vec]]), distances are integer sums of
  * squares, and centroid means are floor(Σ/n) — every engine computes
  * bit-identical results, which is what makes a distributed iterative
  * clusterer value-verifiable against an independent oracle. A float
  * variant would differ only in the element type; the plan is the
  * same.
  *
  * Seeding is deterministic: the k lowest-id vectors, cluster ids
  * 0..k-1 in that order. Ties in the argmin break to the lowest
  * cluster id; clusters that lose all members keep their previous
  * centroid (the standard empty-cluster rule, applied identically in
  * the oracle).
  */
object Clustering {

  /** Quantize array<float|double> to scaled fixed-point BIGINT. */
  def fixedPoint(vec: Column, scale: Double): Column =
    transform(vec, v => floor(v.cast("double") * scale + 0.5).cast("long"))

  /** Exact squared L2 distance to a literal centroid — the native
    * `graft_sqdist_i64` kernel when the session has GraftExtensions
    * (the zip_with/aggregate HOF form is CodegenFallback-interpreted,
    * and this runs k times per row in the assignment hot path); the
    * portable HOF otherwise. Integer arithmetic: identical values
    * either way. */
  private[operators] def sqDistToLit(df: DataFrame, qv: Column, cv: Array[Long]): Column =
    if (df.sparkSession.catalog.functionExists("graft_sqdist_i64"))
      call_function("graft_sqdist_i64", qv, typedlit(cv.toSeq))
    else
      aggregate(
        zip_with(qv, typedlit(cv.toSeq), (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, v) => acc + v)

  private[operators] def assignTo(cents: Array[(Int, Array[Long])])(df: DataFrame): DataFrame = {
    val entries = cents.map { case (cid, cv) =>
      struct(sqDistToLit(df, col("qv"), cv).as("d"), lit(cid.toLong).as("c"))
    }
    // lexicographic struct sort: min distance, ties to lowest cluster
    df.withColumn("_best", sort_array(array(entries: _*)).getItem(0))
      .withColumn("cluster", col("_best").getField("c"))
      .withColumn("dist", col("_best").getField("d"))
      .drop("_best")
  }

  /** The training loop: returns the cached quantized corpus and the
    * centroids after `iters - 1` updates (the set the final assignment
    * round scores against). */
  private def trainLoop(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, scale: Double)
      : (DataFrame, Array[(Int, Array[Long])]) = {
    require(k > 0 && iters > 0, "k and iters must be positive")
    import org.apache.spark.storage.StorageLevel
    val spark = corpus.sparkSession
    // scale-adaptive widening: only single-split bench inputs pay the
    // round-robin exchange (see Tables.spreadIfNarrow)
    val q = graft.core.Tables.spreadIfNarrow(
      corpus.select(col(idCol).cast("long").as("vec_id"),
        fixedPoint(col(vecCol), scale).as("qv")))
      .persistTracked()

    // deterministic seed: the k lowest-id vectors, cluster = seed rank
    var cents: Array[(Int, Array[Long])] =
      q.orderBy(col("vec_id")).limit(k).collect()
        .map(_.getSeq[Long](1).toArray)
        .zipWithIndex.map { case (v, i) => (i, v) }

    var round = 1
    while (round < iters) {
      // per-dimension exact mean: partial agg on (cluster, dim) — the
      // k·dims result is driver-bounded by construction
      val means = assignTo(cents)(q)
        .select(col("cluster"), posexplode(col("qv")).as(Seq("i", "x")))
        .groupBy(col("cluster"), col("i"))
        .agg(floor(sum(col("x")).cast("double") / count(lit(1))).cast("long").as("m"))
        .collect()
      val byCluster = means.groupBy(_.getLong(0))
      cents = cents.map { case (cid, old) =>
        byCluster.get(cid.toLong) match {
          case Some(rows) =>
            (cid, rows.sortBy(_.getInt(1)).map(_.getLong(2)).toArray)
          case None => (cid, old) // empty cluster keeps its centroid
        }
      }
      round += 1
    }
    (q, cents)
  }

  /** Lloyd iterations over `corpus(idCol, vecCol)`; returns one row per
    * vector: (vec_id, cluster, dist) for the final assignment, with
    * `iters` assignment rounds and `iters - 1` centroid updates. */
  def kmeansFixedPoint(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, scale: Double = 1e6): DataFrame = {
    val (q, cents) = trainLoop(corpus, idCol, vecCol, k, iters, scale)
    assignTo(cents)(q).select(col("vec_id"), col("cluster"), col("dist"))
  }

  /** Trained centroids in the original double domain (fixed-point /
    * scale — the exact division every engine computes identically):
    * the coarse quantizer for a k-means-trained IVF index. */
  def kmeansCentroidsDouble(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, scale: Double = 1e6): Array[(Long, Array[Double])] = {
    val (_, cents) = trainLoop(corpus, idCol, vecCol, k, iters, scale)
    cents.map { case (cid, cv) => (cid.toLong, cv.map(_.toDouble / scale)) }
  }

  /** Trained centroids in the fixed-point BIGINT domain — the form
    * [[assignCells]] consumes, so a bootstrap assignment and every
    * later incremental assignment run the SAME integer argmin against
    * the SAME quantized centroids (the frozen-quantizer contract an
    * incremental index needs: cell ids never drift between the batch
    * that trained the quantizer and the batches that only probe it). */
  def kmeansCentroidsFixed(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, scale: Double = 1e6): Array[(Int, Array[Long])] = {
    val (_, cents) = trainLoop(corpus, idCol, vecCol, k, iters, scale)
    cents
  }

  /** Map-side cell assignment against FROZEN fixed-point centroids —
    * the incremental half of the trainer: vectors quantize exactly as
    * [[kmeansFixedPoint]]'s corpus does and run the identical integer
    * argmin (ties to the lowest cluster id), so any vector gets the
    * same cell whether it was in the training corpus or arrives in a
    * later increment. Pure projection over `k·dims` plan literals:
    * zero shuffle between the scan and the cell id. Keeps the caller's
    * id and vector columns and appends `cell`. */
  def assignCells(df: DataFrame, idCol: String, vecCol: String,
      cents: Array[(Int, Array[Long])], scale: Double = 1e6): DataFrame = {
    require(cents.nonEmpty, "assignCells: empty centroid set")
    val q = df.select(col(idCol), col(vecCol),
      fixedPoint(col(vecCol), scale).as("qv"))
    assignTo(cents)(q)
      .select(col(idCol), col(vecCol), col("cluster").as("cell"))
  }

  /** [[assignCells]] keeping the winning centroid's EXACT integer
    * squared distance — the assignment-quality signal
    * [[graft.operators.Similarity.ivfDriftReport]] aggregates. Same
    * map-side literal-argmin plan; emits (idCol, cell, dist). */
  def assignCellsWithDist(df: DataFrame, idCol: String, vecCol: String,
      cents: Array[(Int, Array[Long])], scale: Double = 1e6): DataFrame = {
    require(cents.nonEmpty, "assignCellsWithDist: empty centroid set")
    val q = df.select(col(idCol),
      fixedPoint(col(vecCol), scale).as("qv"))
    assignTo(cents)(q)
      .select(col(idCol), col("cluster").as("cell"), col("dist"))
  }
}
