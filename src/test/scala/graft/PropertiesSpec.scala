package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{Dedup, EtlOps}
import graft.functions.FactbookFunctions._

/** Property-based invariants (SURVEY §5 item 3), using ScalaCheck
  * generators sampled with fixed seeds (scalatestplus isn't available
  * offline, so sampling is explicit; determinism is a feature here —
  * failures reproduce). Each case materializes a small Spark plan, so
  * case counts are modest. */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val rowGen = Gen.listOfN(30, for {
    key <- Gen.oneOf("a", "b", "c", "d")
    year <- Gen.chooseNum(1990.0, 2023.0)
    amount <- Gen.chooseNum(0.0, 1e6)
  } yield (key, year, amount))

  test("W2 dedupByOrder is idempotent and yields unique keys") {
    for (rows <- samples(rowGen, 6) if rows.nonEmpty) {
      val df = rows.zipWithIndex
        .map { case ((k, y, a), i) => (k, y, a, i.toLong) }
        .toDF("k", "year", "amount", "_input_row_id")
      val order = Seq(desc_nulls_last("year"), desc_nulls_last("amount"),
        asc("_input_row_id"))
      val once = EtlOps.dedupByOrder(df, Seq("k"), order)
      val twice = EtlOps.dedupByOrder(once, Seq("k"), order)
      assert(once.collect().map(_.toString).sorted.toSeq ==
        twice.collect().map(_.toString).sorted.toSeq)
      val keys = once.select("k").as[String].collect()
      assert(keys.length == keys.distinct.length)
    }
  }

  test("W1 latestPerGroup survivor has the max year of its group") {
    for (rows <- samples(rowGen, 6) if rows.nonEmpty) {
      val df = rows.zipWithIndex
        .map { case ((k, y, a), i) => (k, y, a, i.toLong) }
        .toDF("k", "year", "amount", "_input_row_id")
      val got = EtlOps.latestPerGroup(df, Seq("k"), "year")
        .select("k", "year").as[(String, Double)].collect().toMap
      val want = rows.groupBy(_._1).map { case (k, g) => k -> g.map(_._2).max }
      assert(got == want)
    }
  }

  test("F3 trailingPercentage is null or within [0, 10]") {
    val txtGen = Gen.oneOf(
      Gen.alphaStr,
      Gen.chooseNum(0, 999).map(n => s"Country $n%"),
      Gen.const("almost entirely X"))
    for (txts <- samples(Gen.listOfN(20, txtGen), 6) if txts.nonEmpty) {
      val got = txts.toDF("t")
        .select(trailingPercentage(col("t")).as("p")).collect()
      got.foreach { r =>
        if (!r.isNullAt(0)) {
          val p = r.getDouble(0)
          assert(p >= 0.0 && p <= 10.0, s"pct $p")
        }
      }
    }
  }

  test("exact dedup: survivors unique per normalized text, all groups covered") {
    val docGen = Gen.listOfN(15, for {
      base <- Gen.oneOf("alpha beta gamma", "delta epsilon", "zeta")
      spaces <- Gen.oneOf(" ", "  ")
      upper <- Gen.oneOf(true, false)
    } yield {
      val t = base.replace(" ", spaces)
      if (upper) t.toUpperCase else t
    })
    def norm(t: String): String =
      t.toLowerCase.split("\\s+").filter(_.nonEmpty).mkString(" ")
    for (texts <- samples(docGen, 6) if texts.nonEmpty) {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = Dedup.exactDedup(df, "text", "doc_id")
        .select("text").as[String].collect().map(norm)
      assert(out.length == out.distinct.length)
      assert(out.toSet == texts.map(norm).toSet)
    }
  }

  test("BMP codec round-trip is pixel-exact for arbitrary dims and pixels") {
    // driver-side property: no Spark plan per case, so more cases are cheap
    val caseGen = for {
      w <- Gen.chooseNum(1, 21)
      h <- Gen.chooseNum(1, 17)
      seed <- Gen.chooseNum(0L, 1000000L)
    } yield (w, h, seed)
    for ((w, h, seed) <- samples(caseGen, 40)) {
      def px(x: Int, y: Int): Int = {
        val r = ((seed + 3L * x + 11L * y) % 256).toInt
        val g = ((seed * 5L + x.toLong * y) % 256).toInt
        val b = ((seed + 17L * x + y) % 256).toInt
        (r << 16) | (g << 8) | b
      }
      val payload = graft.operators.Multimodal.encodeBmp24(w, h, px)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      assert(img != null && img.getWidth == w && img.getHeight == h,
        s"decode failed for ${w}x$h seed=$seed")
      for (x <- 0 until w; y <- 0 until h)
        assert((img.getRGB(x, y) & 0xffffff) == px(x, y),
          s"pixel ($x,$y) for ${w}x$h seed=$seed")
    }
  }

  test("WAV codec round-trip is sample-exact for arbitrary rates and samples") {
    val caseGen = for {
      rate <- Gen.oneOf(8000, 16000, 44100)
      n <- Gen.chooseNum(1, 200)
      seed <- Gen.chooseNum(0L, 1000000L)
    } yield (rate, n, seed)
    for ((rate, n, seed) <- samples(caseGen, 40)) {
      val samplesArr = Array.tabulate(n)(i =>
        ((seed * 31L + i * 1777L) % 65536L - 32768L).toShort)
      val payload = graft.operators.Multimodal.encodeWavPcm16(rate, samplesArr)
      val decoded = graft.operators.Multimodal.decodeWav(payload)
      assert(decoded.contains((rate, n, samplesArr.map(_.toLong).sum)),
        s"rate=$rate n=$n seed=$seed got $decoded")
    }
  }

  test("BPE first merge of a uniform doc counts n-1 pairs") {
    for (n <- Seq(2, 3, 5, 9, 16)) {
      val docs = Seq((1L, Seq.fill(n)("tok").mkString(" "))).toDF("doc_id", "text")
      val got = graft.operators.Corpus.bpeMerges(docs, "doc_id", "text", 1)
        .as[(Int, String, String, Long)].collect()
      assert(got.toSeq == Seq((1, "tok", "tok", (n - 1).toLong)), s"n=$n")
    }
  }

  // random docs from a small word pool (high collision rate — the
  // interesting regime for dedup invariants)
  private val docGen = Gen.listOfN(24, for {
    nWords <- Gen.chooseNum(0, 6)
    words <- Gen.listOfN(nWords, Gen.oneOf("alpha", "beta", "gamma", "delta"))
  } yield words.mkString(" "))

  test("incremental dedup == plain anti-join + in-batch dedup, any split") {
    for ((texts, i) <- samples(docGen, 5).zipWithIndex) {
      val docs = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }
        .toDF("doc_id", "text")
      val prior = docs.filter(col("doc_id") % 3 === lit(i.toLong % 3))
        .select(graft.functions.TextFunctions.fingerprintMd5(col("text")).as("fp"))
        .distinct()
      val got = Dedup.incrementalExactDedup(
        docs.filter(col("doc_id") % 3 =!= lit(i.toLong % 3)), prior,
        "text", "doc_id")
        .select("doc_id").as[Long].collect().toSet
      // reference: plain anti-join on the fingerprint, then lowest-id
      val batch = docs.filter(col("doc_id") % 3 =!= lit(i.toLong % 3))
        .withColumn("_f", graft.functions.TextFunctions.fingerprintMd5(col("text")))
      val want = batch.join(prior, col("_f") === col("fp"), "left_anti")
        .groupBy("_f").agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id").as[Long].collect().toSet
      assert(got == want, s"case $i")
    }
  }

  test("DSIR resample: selected set is the top-k of the full key ranking") {
    for ((texts, i) <- samples(docGen, 3).zipWithIndex if texts.nonEmpty) {
      val docs = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }
        .toDF("doc_id", "text")
      val target = docs.filter(col("doc_id") % 2 === 0)
      if (!target.isEmpty) {
        val w = graft.operators.ScaleOps.dsirLogRatioWeights(
          target, docs, "text", buckets = 32)
        val all = graft.operators.ScaleOps.dsirResample(docs, "doc_id",
          "text", w, k = texts.length, buckets = 32)
          .as[(Long, Long, Long)].collect()
        assert(all.length == texts.length, s"case $i: k=n returns all")
        val top3 = graft.operators.ScaleOps.dsirResample(docs, "doc_id",
          "text", w, k = 3, buckets = 32)
          .as[(Long, Long, Long)].collect().map(_._1).toSet
        val want = all.sortBy(r => (-r._3, r._1)).take(3).map(_._1).toSet
        assert(top3 == want, s"case $i: k=3 is the key-ranking prefix")
      }
    }
  }

  private val lineDocGen = Gen.listOfN(12, Gen.listOfN(4,
    Gen.oneOf("nav bar", "cookie banner", "alpha", "beta", "gamma",
      "delta", "", "license")).map(_.mkString("\n")))

  test("boilerplateRemoval: no surviving high-DF line, order kept, ids preserved") {
    for ((texts, i) <- samples(lineDocGen, 4).zipWithIndex) {
      val docs = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }
        .toDF("doc_id", "text")
      val minDf = 3L
      val got = Dedup.boilerplateRemoval(docs, "doc_id", "text", minDf)
        .as[(Long, String)].collect().toMap
      // document set preserved exactly
      assert(got.keySet == texts.indices.map(_.toLong).toSet, s"case $i")
      val df = texts.zipWithIndex
        .flatMap { case (t, j) => t.split("\n", -1).distinct.map(_ -> j) }
        .groupBy(_._1).map { case (l, occ) => l -> occ.map(_._2).distinct.size }
      got.foreach { case (id, text) =>
        val lines = if (text.isEmpty) Array.empty[String] else text.split("\n", -1)
        // every surviving line is below the DF threshold
        lines.foreach(l => assert(df(l) < minDf, s"case $i doc $id line '$l'"))
        // survivors are the original doc's below-threshold lines in order
        val want = texts(id.toInt).split("\n", -1).filter(l => df(l) < minDf)
        assert(lines.toSeq == want.toSeq, s"case $i doc $id")
      }
    }
  }

  private val budgetRowsGen = Gen.listOfN(20, for {
    n <- Gen.chooseNum(0L, 50L)
    p <- Gen.chooseNum(0L, 9L)
  } yield (n, p))

  test("tokenBudgetFilter == sorted-prefix reference for arbitrary priorities") {
    for ((rows, i) <- samples(budgetRowsGen, 5).zipWithIndex) {
      val df = rows.zipWithIndex.map { case ((n, p), j) => (j.toLong, n, p) }
        .toDF("doc_id", "n", "p")
      val budget = 1 + 17L * (i + 1)
      val got = graft.operators.ScaleOps.tokenBudgetFilter(
        df, "doc_id", col("n"), col("p"), budget)
        .as[(Long, Long, Long, Long)].collect().toSet
      var acc = 0L
      val want = rows.zipWithIndex
        .map { case ((n, p), j) => (j.toLong, n, p) }
        .sortBy { case (id, _, p) => (-p, id) }
        .iterator.map { case (id, n, p) => acc += n; (id, p, n, acc) }
        .takeWhile(_._4 <= budget).toSet
      assert(got == want, s"case $i budget=$budget")
    }
  }

  test("calibratedKeepThresholds: smallest ties-inclusive cover per source") {
    val srcRows = Gen.listOfN(25, for {
      src <- Gen.oneOf("a", "b", "c")
      s <- Gen.chooseNum(0L, 6L)
    } yield (src, s))
    for ((rows, i) <- samples(srcRows, 5).zipWithIndex) {
      val bp = 2500
      val df = rows.zipWithIndex.map { case ((src, s), j) => (j.toLong, src, s) }
        .toDF("doc_id", "source", "s")
      val th = graft.operators.ScaleOps
        .calibratedKeepThresholds(df, "source", col("s"), bp)
        .as[(String, Long, Long, Long)].collect()
      th.foreach { case (src, t, n, keepMin) =>
        val scores = rows.filter(_._1 == src).map(_._2)
        assert(n == scores.size)
        val target = (n * bp + 9999) / 10000
        val atOrAbove = scores.count(_ >= t)
        assert(atOrAbove.toLong == keepMin && keepMin >= target, s"case $i $src")
        // minimality: excluding the threshold tie class falls below target
        assert(scores.count(_ > t) < target, s"case $i $src not minimal")
      }
    }
  }

  test("session_window == gaps-and-islands with end shifted by the gap") {
    val evGen = Gen.listOfN(30, for {
      u <- Gen.chooseNum(1L, 3L)
      minute <- Gen.chooseNum(0, 400)
    } yield (u, minute))
    for ((evs, i) <- samples(evGen, 4).zipWithIndex) {
      val df = evs.map { case (u, m) =>
        (u, new java.sql.Timestamp(1700000000000L + m * 60000L), 1.0) }
        .toDF("user_id", "ts", "value")
      val native = graft.streaming.EventsStreaming.sessionWindowAgg(df, 30)
        .select(col("user_id"), unix_timestamp(col("session_start")),
          unix_timestamp(col("session_end")), col("n_events"))
        .as[(Long, Long, Long, Long)].collect().toSet
      val islands = graft.streaming.EventsStreaming.sessionizeBatch(df, 30)
        .select(col("user_id"), unix_timestamp(col("session_start")),
          unix_timestamp(col("session_end")) + 1800L, col("n_events"))
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(native == islands && native.nonEmpty, s"case $i")
    }
  }

  test("linear quality weights are antisymmetric under class swap") {
    for ((texts, i) <- samples(docGen, 3).zipWithIndex) {
      val nonEmpty = texts.filter(_.nonEmpty)
      if (nonEmpty.length >= 2) {
        val (a, b) = nonEmpty.splitAt(nonEmpty.length / 2)
        val da = a.zipWithIndex.map { case (t, j) => (j.toLong, t) }.toDF("doc_id", "text")
        val db = b.zipWithIndex.map { case (t, j) => (j.toLong, t) }.toDF("doc_id", "text")
        val wab = graft.operators.Corpus.linearQualityWeights(da, db, "text", topF = 1000)
          .as[(String, Long)].collect().toMap
        val wba = graft.operators.Corpus.linearQualityWeights(db, da, "text", topF = 1000)
          .as[(String, Long)].collect().toMap
        assert(wab.keySet == wba.keySet, s"case $i")
        // w(g) = ln(p) - ln(q) flips sign when classes swap; fixed-point
        // floor(x*1e6+0.5) maps x -> -x within 1 ulp of the quantizer
        wab.foreach { case (g, w) =>
          assert(math.abs(w + wba(g)) <= 1L, s"case $i gram $g: $w vs ${wba(g)}")
        }
      }
    }
  }
}
