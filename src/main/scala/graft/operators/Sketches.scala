package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Engine-portable probabilistic sketches. Unlike
  * `approx_count_distinct` (whose HLL++ registers are an
  * implementation detail no other engine reproduces), these sketches
  * fix the hash (md5-derived), the register layout, and the estimator
  * arithmetic, so ANY engine computes the bit-identical estimate —
  * which is what makes a sketch result auditable across a
  * heterogeneous pipeline (Spark job today, DuckDB spot-check
  * tomorrow) and lets the driver's hash gate verify an approximate
  * operator exactly.
  */
object Sketches {

  /** Fixed-bin quantile sketch — the mergeable 100 TB quantile path
    * (exact `percentile` needs the values; this needs one bounded
    * histogram per group). Bin counts are mergeable partials; the
    * per-group cumulative window runs over the BIN table (bounded by
    * value-range/binWidth, never by row count). The p-quantile
    * estimate is the midpoint of the first bin whose cumulative count
    * reaches ceil(p·n) — guaranteed within binWidth/2 of an actual
    * rank-ceil(p·n) order statistic, and (unlike t-digest/KLL) a pure
    * deterministic function of the data, so any engine reproduces it
    * exactly. */
  def binnedQuantiles(df: DataFrame, groupCol: String, valCol: String,
      binWidth: Double, ps: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bins = df
      .groupBy(col(groupCol), floor(col(valCol) / binWidth).cast("long").as("_bin"))
      .agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("_bin"))
    val wAll = Window.partitionBy(col(groupCol))
    bins
      .withColumn("_cum", sum(col("_c")).over(w))
      .withColumn("_n", sum(col("_c")).over(wAll))
      .withColumn("p", explode(typedlit(ps)))
      .filter(col("_cum") >= ceil(col("p") * col("_n")))
      .groupBy(col(groupCol), col("p"))
      .agg(min(col("_bin")).as("_qbin"))
      .select(col(groupCol), col("p"),
        round((col("_qbin") + 0.5) * binWidth, 6).as("estimate"))
  }

  /** Portable HyperLogLog distinct count (p=8, m=256 registers,
    * ~6.5% standard error — raise p for tighter bounds).
    *
    * Layout: h = 60-bit md5-derived hash; register = h mod 256; the
    * remaining 52 bits give rho = leading-zero count + 1, computed
    * EXACTLY in any engine as 53 − bitlength(suffix) via the minimal
    * binary-string length (`bin`), no floating point. Register maxes
    * aggregate with the classic two-shuffle mergeable-partials shape
    * (group×register, then group).
    *
    * The estimator stays engine-identical by doing ALL register math
    * in integers: Σ 2^(−M_j) is scaled by 2^53 so the harmonic-mean
    * denominator S = Σ 2^(53−M_j) is an exact BIGINT (≤ 2^61, no
    * overflow, order-independent) — the only doubles are one division
    * by S and the fixed alpha constant, identical IEEE ops in any
    * engine. Small-range (linear counting) correction applies below
    * 2.5·m when empty registers remain; result rounded to 4dp. */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      hashSeed: Int = 777): DataFrame = {
    val gcols = groupCols.map(col)
    estimateFromRegisters(
      registerTable(df, groupCols, valueCol, hashSeed), groupCols)
      .select(gcols :+ col("_est").as("hll_distinct"): _*)
  }

  /** (group…, _reg, _M) register maxes — THE mergeable partial: the
    * sketch of any union of inputs is the per-register max of their
    * register tables, so day-sized / partition-sized sketches combine
    * without rescanning data. */
  private[operators] def registerTable(df: DataFrame, groupCols: Seq[String],
      valueCol: String, hashSeed: Int): DataFrame = {
    val gcols = groupCols.map(col)
    // spread: single-split benchmark files would otherwise serialize
    // the per-row md5 on one core (same policy as Dedup.spread)
    val hashed = Dedup.spread(df).select(gcols :+
      TextFunctions.hexHash60(col(valueCol).cast("string"), hashSeed).as("_h"): _*)
    val suffix = shiftright(col("_h"), 8)
    val rho = when(suffix === 0L, lit(53))
      .otherwise(lit(53) - length(bin(suffix)))
    hashed
      .select(gcols :+ (col("_h") % 256).as("_reg") :+ rho.as("_rho"): _*)
      .groupBy(gcols :+ col("_reg"): _*)
      .agg(max(col("_rho")).as("_M"))
  }

  /** Fold a register table to the (group…, _est) HLL estimate —
    * all-integer register math, one double division at the edge (see
    * [[hllDistinct]] scaladoc). */
  private[operators] def estimateFromRegisters(registers: DataFrame,
      groupCols: Seq[String]): DataFrame = {
    val gcols = groupCols.map(col)
    val folded = registers.groupBy(gcols: _*)
      .agg(
        (sum(expr("shiftleft(CAST(1 AS BIGINT), 53 - _M)")) +
          (lit(256L) - count(lit(1))) * lit(1L << 53)).as("_S"),
        (lit(256L) - count(lit(1))).as("_zeros"))
    // alpha_256 = 0.7213/(1 + 1.079/m); kept as the same literal
    // expression the oracle writes so both sides produce the same double
    val raw = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) *
      lit(65536.0) * lit(9007199254740992.0) / col("_S").cast("double")
    val est = when(raw <= lit(640.0) && col("_zeros") > 0,
      lit(256.0) * log(lit(256.0) / col("_zeros").cast("double")))
      .otherwise(raw)
    folded.select(gcols :+ round(est, 4).as("_est"): _*)
  }

  /** Sketch SET OPERATIONS via register merge: |A|, |B|, |A∪B| from
    * the per-register MAX of A's and B's register tables (the
    * mergeable-partials property — at 100 TB this is how per-day /
    * per-partition sketches combine into a global cardinality without
    * rescanning anything), and |A∩B| by inclusion–exclusion, clamped
    * at 0 and computed from the ALREADY-ROUNDED component estimates so
    * any engine derives the identical value. Returns one row:
    * (est_a, est_b, est_union, est_intersection). Precondition: both
    * inputs non-empty (an empty side has no registers, so its estimate
    * surfaces as NULL — don't sketch-compare nothing). */
  def hllSetOps(a: DataFrame, b: DataFrame, valueCol: String,
      hashSeed: Int = 777): DataFrame = {
    def regs(df: DataFrame, tag: String) =
      registerTable(df.select(lit(tag).as("_t"), col(valueCol)),
        Seq("_t"), valueCol, hashSeed)
    val ra = regs(a, "a")
    val rb = regs(b, "b")
    val merged = ra.unionByName(rb)
      .groupBy(col("_reg")).agg(max(col("_M")).as("_M"))
      .withColumn("_t", lit("u"))
    val ests = estimateFromRegisters(
      ra.unionByName(rb).unionByName(merged.select("_t", "_reg", "_M")),
      Seq("_t"))
    // pivot the three tagged estimates into one row with a keyless
    // conditional aggregate (3 input rows — no join, no cross product)
    ests.agg(
      max(when(col("_t") === "a", col("_est"))).as("est_a"),
      max(when(col("_t") === "b", col("_est"))).as("est_b"),
      max(when(col("_t") === "u", col("_est"))).as("est_union"))
      .withColumn("est_intersection",
        round(greatest(lit(0.0), col("est_a") + col("est_b") - col("est_union")), 4))
  }

  /** The DuckDB oracle for [[hllDistinct]] over a given table/column —
    * generated here so the register layout and estimator arithmetic
    * live in exactly one place. */
  def hllDistinctSql(table: String, groupCols: Seq[String], valueCol: String,
      hashSeed: Int = 777): String = {
    val g = groupCols.mkString(", ")
    s"WITH h AS (SELECT $g, CAST('0x' || substr(md5('$hashSeed:' || CAST($valueCol AS VARCHAR)), 1, 15) AS BIGINT) AS h FROM $table), " +
      s"b AS (SELECT $g, h % 256 AS reg, h >> 8 AS suffix FROM h), " +
      s"r AS (SELECT $g, reg, CASE WHEN suffix = 0 THEN 53 ELSE 53 - length(bin(suffix)) END AS rho FROM b), " +
      s"mx AS (SELECT $g, reg, max(rho) AS m FROM r GROUP BY ALL), " +
      s"s AS (SELECT $g, sum(CAST(1 AS BIGINT) << (53 - m)) + (256 - count(*)) * (CAST(1 AS BIGINT) << 53) AS s, 256 - count(*) AS zeros FROM mx GROUP BY ALL), " +
      s"e AS (SELECT $g, CAST(0.7213 AS DOUBLE)/(CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE)/CAST(256.0 AS DOUBLE))*CAST(65536.0 AS DOUBLE)*CAST(9007199254740992.0 AS DOUBLE)/CAST(s AS DOUBLE) AS raw, zeros FROM s) " +
      s"SELECT $g, round(CASE WHEN raw <= 640.0 AND zeros > 0 THEN CAST(256.0 AS DOUBLE) * ln(CAST(256.0 AS DOUBLE)/CAST(zeros AS DOUBLE)) ELSE raw END, 4) AS hll_distinct FROM e"
  }

  /** Portable Count-Min sketch frequency estimates: `depth` hash rows
    * × `width` counters, h(seed, v) = md5-derived 60-bit hash mod
    * width — the frequency sibling of the portable HLL (fixed hash,
    * fixed layout, integer-only arithmetic ⇒ any engine computes the
    * bit-identical estimate). Emits one row per probe key: the CMS
    * estimate (min over rows of the key's counter), the exact count,
    * and the CMS guarantee flag (estimate ≥ exact — Count-Min never
    * underestimates).
    *
    * Scale shape: the counter table is ONE partial-agg shuffle of
    * (seed, bucket) short keys — depth×width = a few thousand rows
    * regardless of data size, the mergeable partial a 100 TB pipeline
    * ships instead of data; probes join against it broadcast. Exact
    * counts for the probe keys are a filtered partial agg (bounded by
    * the probe list). */
  /** The CMS bucket function, driver-side: Kirsch–Mitzenmacher double
    * hashing off ONE 60-bit md5-derived hash (identical layout to
    * [[TextFunctions.hexHash60]]): h1 = h mod 2³⁰, h2 = (h >> 30) | 1
    * (odd ⇒ coprime with the power-of-two width ⇒ full-cycle strides),
    * bucket_s = (h1 + s·h2) mod width. One md5 per row buys all
    * `depth` hash rows — probes are literals, so their buckets fold
    * into the plan as constants. */
  private[operators] def cmsBucket(hashSeed: Int, value: String, s: Int,
      width: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val hex = d.digest(s"$hashSeed:$value".getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString.take(15)
    val h = java.lang.Long.parseLong(hex, 16)
    val h1 = h % 1073741824L
    val h2 = (h >> 30) | 1L
    (h1 + s * h2) % width
  }

  def cmsFrequency(df: DataFrame, valueCol: String, probes: Seq[Long],
      depth: Int = 4, width: Int = 512, hashSeed: Int = 555): DataFrame = {
    require(probes.nonEmpty && depth >= 1 && width >= 2)
    // the sketch is long-keyed by contract (probes: Seq[Long]); a
    // non-integral column would render differently through
    // cast-long-then-string here vs CAST(... AS VARCHAR) in the oracle
    // and bucket per-engine — fail loudly instead
    require({
      import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
      df.schema(valueCol).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
    }, s"cmsFrequency: $valueCol must be an integral column, got " +
      df.schema(valueCol).dataType.simpleString)
    val v = col(valueCol).cast("long")
    val h = TextFunctions.hexHash60(v.cast("string"), hashSeed)
    val h1 = h % lit(1073741824L)
    val h2 = shiftright(h, 30).bitwiseOR(lit(1L))
    // spread: see registerTable — the md5 kernel must not serialize on
    // a single scan split
    val counters = Dedup.spread(df)
      .select(explode(array((0 until depth).map(s =>
        struct(lit(s).as("_s"),
          ((h1 + lit(s.toLong) * h2) % width).as("_b"))): _*)).as("_sb"))
      .groupBy(col("_sb._s").as("_s"), col("_sb._b").as("_b"))
      .agg(count(lit(1)).as("_c"))
    val spark = df.sparkSession
    import spark.implicits._
    // probe rows fold their buckets in as literals (same hash layout)
    val probed = probes.flatMap(p => (0 until depth).map(s =>
      (p, s, cmsBucket(hashSeed, p.toString, s, width))))
      .toDF("probe_key", "_s", "_b")
    val est = probed
      .join(broadcast(counters), Seq("_s", "_b"), "left")
      .groupBy(col("probe_key"))
      .agg(min(coalesce(col("_c"), lit(0L))).as("cms_estimate"))
    val exact = df.select(v.as("probe_key"))
      .filter(col("probe_key").isin(probes: _*))
      .groupBy(col("probe_key")).agg(count(lit(1)).as("exact_count"))
    est.join(exact, Seq("probe_key"), "left")
      .select(col("probe_key"), col("cms_estimate"),
        coalesce(col("exact_count"), lit(0L)).as("exact_count"))
      .withColumn("never_underestimates",
        col("cms_estimate") >= col("exact_count"))
  }

  /** DuckDB oracle for [[cmsFrequency]] — same hash layout, counter
    * table, and min-over-rows estimate, generated in one place. */
  def cmsFrequencySql(table: String, valueCol: String, probes: Seq[Long],
      depth: Int = 4, width: Int = 512, hashSeed: Int = 555): String = {
    // Kirsch–Mitzenmacher: one md5 per value, bucket_s = (h1 + s·h2) % width
    def bucket(vExpr: String) = {
      val h = s"CAST('0x' || substr(md5('$hashSeed:' || $vExpr), 1, 15) AS BIGINT)"
      s"(($h % 1073741824) + s * (($h >> 30) | 1)) % $width"
    }
    val seedRows = (0 until depth).map(s => s"($s)").mkString(", ")
    val probeRows = probes.map(p => s"($p)").mkString(", ")
    s"WITH seeds(s) AS (VALUES $seedRows), " +
      s"probes(probe_key) AS (VALUES $probeRows), " +
      // mirror Spark's cast-to-long-then-string hash input so an
      // INT/SMALLINT column renders identically in both engines
      s"cnt AS MATERIALIZED (SELECT s, ${bucket(s"CAST(CAST($valueCol AS BIGINT) AS VARCHAR)")} AS b, " +
      s"count(*) AS c FROM $table, seeds GROUP BY 1, 2), " +
      s"pb AS (SELECT probe_key, s, ${bucket("CAST(probe_key AS VARCHAR)")} AS b FROM probes, seeds), " +
      "est AS (SELECT probe_key, CAST(min(coalesce(c, 0)) AS BIGINT) AS cms_estimate " +
      "FROM pb LEFT JOIN cnt USING (s, b) GROUP BY probe_key), " +
      s"ex AS (SELECT CAST($valueCol AS BIGINT) AS probe_key, count(*) AS n FROM $table " +
      s"WHERE CAST($valueCol AS BIGINT) IN (SELECT probe_key FROM probes) GROUP BY 1) " +
      "SELECT e.probe_key, e.cms_estimate, CAST(coalesce(ex.n, 0) AS BIGINT) AS exact_count, " +
      "e.cms_estimate >= coalesce(ex.n, 0) AS never_underestimates " +
      "FROM est e LEFT JOIN ex ON e.probe_key = ex.probe_key"
  }

  /** DuckDB oracle for [[hllSetOps]] over two WHERE-filtered reads of
    * one table — generated here so the register layout, merge, and
    * estimator arithmetic live in exactly one place. */
  def hllSetOpsSql(table: String, valueCol: String, whereA: String,
      whereB: String, hashSeed: Int = 777): String = {
    def regCte(name: String, where: String) =
      s"$name AS MATERIALIZED (SELECT reg, max(rho) AS m FROM (" +
        s"SELECT h % 256 AS reg, CASE WHEN (h >> 8) = 0 THEN 53 ELSE 53 - length(bin(h >> 8)) END AS rho FROM (" +
        s"SELECT CAST('0x' || substr(md5('$hashSeed:' || CAST($valueCol AS VARCHAR)), 1, 15) AS BIGINT) AS h " +
        s"FROM $table WHERE $where)) GROUP BY reg)"
    def estCte(name: String, src: String) =
      s"$name AS (SELECT round(CASE WHEN raw <= 640.0 AND zeros > 0 THEN CAST(256.0 AS DOUBLE) * ln(CAST(256.0 AS DOUBLE)/CAST(zeros AS DOUBLE)) ELSE raw END, 4) AS e FROM (" +
        s"SELECT CAST(0.7213 AS DOUBLE)/(CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE)/CAST(256.0 AS DOUBLE))*CAST(65536.0 AS DOUBLE)*CAST(9007199254740992.0 AS DOUBLE)/CAST(s AS DOUBLE) AS raw, zeros FROM (" +
        s"SELECT sum(CAST(1 AS BIGINT) << (53 - m)) + (256 - count(*)) * (CAST(1 AS BIGINT) << 53) AS s, 256 - count(*) AS zeros FROM $src)))"
    "WITH " + regCte("ra", whereA) + ", " + regCte("rb", whereB) +
      ", ru AS (SELECT reg, max(m) AS m FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb) GROUP BY reg), " +
      estCte("ea", "ra") + ", " + estCte("eb", "rb") + ", " + estCte("eu", "ru") +
      " SELECT ea.e AS est_a, eb.e AS est_b, eu.e AS est_union, " +
      "round(greatest(CAST(0.0 AS DOUBLE), ea.e + eb.e - eu.e), 4) AS est_intersection " +
      "FROM ea, eb, eu"
  }

  /** Bit position i of a value in the portable Bloom layout —
    * Kirsch–Mitzenmacher over the shared md5 kernel (pos_i =
    * (h1 + i·h2) mod bits), the [[cmsBucket]] arithmetic with the bit
    * array as the target space. Driver-side mirror of the column
    * expression in [[bloomRecords]]; the oracle embeds the same
    * positions as literals. */
  private[operators] def bloomBit(hashSeed: Int, value: String, i: Int,
      bits: Int): Long = cmsBucket(hashSeed, value, i, bits)

  /** PORTABLE mergeable Bloom filter (X192) — the membership sketch
    * completing the portable family (HLL X41 = cardinality, CMS X100
    * = frequency, this = membership): the filter is a WORD TABLE
    * (word_idx, bits) — bit pos of a value sits in word pos div 64 —
    * built by one (word)-keyed `bit_or` partial-agg shuffle over k
    * exploded positions per row. Mergeable by construction:
    * [[bloomMerge]] is a union + per-word `bit_or`, so per-day /
    * per-partition filters combine WITHOUT rescanning anything (the
    * same property the HLL register tables have), and the merged
    * table is bit-identical to the filter built from the union
    * (spec-pinned). ⌈bits/64⌉ rows regardless of data size — the
    * shipped sketch, not the data.
    *
    * Probes land as driver-computed literal positions (the CMS probe
    * convention): might_contain iff ALL k probe bits are set. A Bloom
    * filter never lies negative — the gate emits the
    * never_false_negative verdict column alongside the exact check
    * (the cmsFrequency convention). */
  def bloomRecords(df: DataFrame, valueCol: String, bits: Int = 4096,
      k: Int = 4, hashSeed: Int = 333): DataFrame = {
    require(bits >= 64 && bits % 64 == 0,
      s"bloomRecords: bits must be a positive multiple of 64, got $bits")
    require(k >= 1 && k <= 16, s"bloomRecords: k must be 1..16, got $k")
    requireSketchable(df, valueCol)
    val v = col(valueCol).cast("long")
    val h = TextFunctions.hexHash60(v.cast("string"), hashSeed)
    val h1 = h % lit(1073741824L)
    val h2 = shiftright(h, 30).bitwiseOR(lit(1L))
    Dedup.spread(df)
      .select(explode(array((0 until k).map(i =>
        (h1 + lit(i.toLong) * h2) % bits): _*)).as("_p"))
      .select(expr("_p div 64").as("word_idx"),
        expr("shiftleft(1L, CAST(_p % 64 AS INT))").as("_m"))
      .groupBy(col("word_idx"))
      .agg(expr("bit_or(_m)").as("bits"))
  }

  /** Merge two word-table Bloom filters built with the SAME
    * (bits, k, seed) layout — union + per-word `bit_or`. */
  def bloomMerge(a: DataFrame, b: DataFrame): DataFrame = {
    for (df <- Seq(a, b))
      require(Set("word_idx", "bits").subsetOf(df.columns.toSet),
        s"bloomMerge: inputs must be bloomRecords word tables, got " +
          df.columns.mkString(", "))
    a.select(col("word_idx"), col("bits"))
      .unionByName(b.select(col("word_idx"), col("bits")))
      .groupBy(col("word_idx")).agg(expr("bit_or(bits)").as("bits"))
  }

  /** Probe a word-table Bloom filter: one row per probe key with
    * might_contain = all k bits set. Probe positions are driver-side
    * literals (the CMS probe convention); the k-row-per-probe check
    * joins the ⌈bits/64⌉-row word table broadcast. */
  def bloomProbe(records: DataFrame, probes: Seq[Long], bits: Int = 4096,
      k: Int = 4, hashSeed: Int = 333): DataFrame = {
    require(probes.nonEmpty, "bloomProbe: no probe keys given")
    require(Set("word_idx", "bits").subsetOf(records.columns.toSet),
      s"bloomProbe: records must be a bloomRecords word table, got " +
        records.columns.mkString(", "))
    val spark = records.sparkSession
    import spark.implicits._
    // Dedup probe keys: a duplicated key would contribute 2k rows and
    // break the count === k never-false-negative contract.
    val pos = probes.distinct.flatMap { p =>
      (0 until k).map { i =>
        val bp = bloomBit(hashSeed, p.toString, i, bits)
        (p, bp / 64, 1L << (bp % 64).toInt)
      }
    }.toDF("probe_key", "word_idx", "_m")
    pos.join(broadcast(records), Seq("word_idx"), "left")
      .groupBy(col("probe_key"))
      .agg((count(when(col("bits").isNotNull &&
        col("bits").bitwiseAND(col("_m")) === col("_m"), 1)) === k)
        .as("might_contain"))
  }

  /** Generated DuckDB oracle for [[bloomProbe]] over a filter built
    * from EVERY row of `table` (merge-of-slices ≡ built-from-all is
    * the spec-pinned algebra, so the oracle replays the all-rows
    * form): the set-bit positions come from the same md5 arithmetic,
    * probe positions are the same driver literals. */
  def bloomProbeSql(table: String, valueCol: String, probes: Seq[Long],
      bits: Int = 4096, k: Int = 4, hashSeed: Int = 333): String = {
    val h = s"CAST('0x' || substr(md5('$hashSeed:' || " +
      s"CAST(CAST($valueCol AS BIGINT) AS VARCHAR)), 1, 15) AS BIGINT)"
    val seedRows = (0 until k).map(s => s"($s)").mkString(", ")
    val pbRows = probes.distinct.flatMap(p => (0 until k).map(i =>
      s"($p, ${bloomBit(hashSeed, p.toString, i, bits)})")).mkString(", ")
    val probeRows = probes.distinct.map(p => s"($p)").mkString(", ")
    s"WITH seeds(s) AS (VALUES $seedRows), " +
      s"pb(probe_key, p) AS (VALUES $pbRows), " +
      s"pr(probe_key) AS (VALUES $probeRows), " +
      s"pos AS MATERIALIZED (SELECT DISTINCT (($h % 1073741824) + s * (($h >> 30) | 1)) % $bits AS p " +
      s"FROM $table, seeds), " +
      "m AS (SELECT probe_key, count(*) AS hit FROM pb JOIN pos USING (p) GROUP BY probe_key), " +
      s"ex AS (SELECT DISTINCT CAST($valueCol AS BIGINT) AS probe_key FROM $table) " +
      s"SELECT pr.probe_key, coalesce(m.hit, 0) = $k AS might_contain, " +
      "ex.probe_key IS NOT NULL AS exact_present, " +
      s"(NOT ex.probe_key IS NOT NULL) OR coalesce(m.hit, 0) = $k AS never_false_negative " +
      "FROM pr LEFT JOIN m ON pr.probe_key = m.probe_key " +
      "LEFT JOIN ex ON pr.probe_key = ex.probe_key"
  }

  /** Shared integral-key gate for the portable sketches (the
    * [[cmsFrequency]] rule): the hash input is
    * cast-long-then-string, which only renders identically across
    * engines for integral columns. */
  private def requireSketchable(df: DataFrame, valueCol: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    require(df.schema(valueCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }, s"portable bloom: $valueCol must be an integral column, got " +
      df.schema(valueCol).dataType.simpleString)
  }
}
