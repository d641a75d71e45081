package graft

import org.apache.spark.sql.functions._
import graft.operators.Corpus

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("bpeMerges learns the most frequent pair first, ties break alphabetically") {
    val docs = Seq(
      (1L, "new york city new york"),
      (2L, "new york is big"))
      .toDF("doc_id", "text")
    val got = Corpus.bpeMerges(docs, "doc_id", "text", 2)
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
    assert(got(0) == ((1, "new", "york", 3L)))
    // round 2: all remaining pairs count 1; alphabetical order on the
    // marked pair strings picks (city, new york) — "c" < "i" < "n"
    assert(got(1) == ((2, "city", "new york", 1L)))
  }

  test("bpeMerges merges leftmost non-overlapping occurrences only") {
    // "a a a a" has 3 adjacent (a,a) pairs but greedy BPE merges the
    // 1st and 3rd: state becomes "a·a a·a", so round 2's best pair is
    // the merged symbol with itself, count 1
    val docs = Seq((1L, "a a a a")).toDF("doc_id", "text")
    val got = Corpus.bpeMerges(docs, "doc_id", "text", 2)
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
    assert(got(0) == ((1, "a", "a", 3L)))
    assert(got(1) == ((2, "a a", "a a", 1L)))
  }

  test("bpeApply shrinks symbol counts by exactly the merged occurrences") {
    val docs = Seq(
      (1L, "new york city new york"),
      (2L, "new york is big"))
      .toDF("doc_id", "text")
    val merges = Corpus.bpeMerges(docs, "doc_id", "text", 1)
      .as[(Int, String, String, Long)].collect()
      .sortBy(_._1).map(m => (m._2, m._3)).toSeq
    val got = Corpus.bpeApply(docs, "doc_id", "text", merges)
      .as[(Long, Int, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // doc 1: 5 tokens, 2 "new york" merges -> 3 symbols
    // doc 2: 4 tokens, 1 merge -> 3 symbols
    assert(got(1L) == ((5, 3)))
    assert(got(2L) == ((4, 3)))
  }

  test("bpeMerges stops early when no pairs remain") {
    val docs = Seq((1L, "solo"), (2L, "")).toDF("doc_id", "text")
    val got = Corpus.bpeMerges(docs, "doc_id", "text", 3).collect()
    assert(got.isEmpty)
  }

  test("unigramLmScores: hand-computed seed, EM round, and train filter") {
    // one distinct word "ab" (f=3); maxLen 2 -> vocab {a, b, ab}, all
    // seed counts 3: lp = floor(-ln(4/12)*1e9 + 0.5) = 1098612289.
    // Viterbi picks the whole word (1 piece beats 2 at equal cost),
    // so round-1 usage is ab=3, a=b=0: tot=3, V=3 ->
    // lp(ab) = floor(-ln(4/6)*1e9+0.5) = 405465108,
    // lp(a) = lp(b) = floor(-ln(1/6)*1e9+0.5) = 1791759469.
    val docs = Seq((1L, "ab ab"), (2L, "ab")).toDF("doc_id", "text")
    val got = Corpus.unigramLmScores(docs, "doc_id", "text",
      maxPieceLen = 2, emRounds = 1)
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(("a", 0L, 1791759469L), ("ab", 3L, 405465108L),
      ("b", 0L, 1791759469L)))
    val trained = Corpus.unigramLmTrain(docs, "doc_id", "text", 2, 1)
      .as[(String, Long, Long)].collect()
    assert(trained.toSeq == Seq(("ab", 3L, 405465108L)))
    intercept[IllegalArgumentException] {
      Corpus.unigramLmScores(docs, "doc_id", "text", 0, 1)
    }
    intercept[IllegalArgumentException] {
      Corpus.unigramLmScores(docs, "doc_id", "text", 2, 0)
    }
  }

  test("unigram count algebra: merge/retract make incremental training BIT-equal to retrain") {
    val a = Seq((1L, "ab ab cd"), (2L, "ab ef")).toDF("doc_id", "text")
    val b = Seq((3L, "cd cd gh"), (4L, "ab")).toDF("doc_id", "text")
    val union = a.unionByName(b)
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Long)].collect().toSet
    val ca = Corpus.unigramWordCounts(a, "text")
    val cb = Corpus.unigramWordCounts(b, "text")
    val merged = Corpus.unigramMergeCounts(ca, cb)
    // merge law: counts(A ∪ B) == fold of slice counts, cell-exact
    assert(cells(merged.select(col("w"), col("f"))) ==
      cells(Corpus.unigramWordCounts(union, "text")
        .select(col("w"), col("f"))))
    // trained model from the fold is BIT-equal to a full retrain
    def model(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Long, Long)].collect().toSet
    assert(model(Corpus.unigramLmTrainFromCounts(merged, 2, 2)) ==
      model(Corpus.unigramLmTrain(union, "doc_id", "text", 2, 2)))
    // retract law: retract(merge(s, b), b) == s, and retraining equals
    // training on the remainder
    val retr = Corpus.unigramRetractCounts(merged, cb)
    assert(cells(retr.select(col("w"), col("f"))) ==
      cells(ca.select(col("w"), col("f"))))
    assert(model(Corpus.unigramLmTrainFromCounts(retr, 2, 2)) ==
      model(Corpus.unigramLmTrain(a, "doc_id", "text", 2, 2)))
    // retracting a slice that was never merged fails loud
    val ex = intercept[Exception] {
      Corpus.unigramRetractCounts(ca, cb).collect()
    }
    assert(ex.getMessage.contains("never merged"))
    // schema guard
    intercept[IllegalArgumentException] {
      Corpus.unigramMergeCounts(ca.withColumnRenamed("f", "n"), cb)
    }
  }

  test("trainer entry points re-aggregate duplicate (w,f) rows (ADVICE r19)") {
    // a non-aggregated dict (duplicate word rows) must train exactly
    // like its grouped form — duplicates mean their sum, never a
    // silent double-count of lattice edges / pair counts
    val dup = Seq(("ab", 1L), ("ab", 2L), ("cd", 1L)).toDF("w", "f")
    val agg = Seq(("ab", 3L), ("cd", 1L)).toDF("w", "f")
    def uni(df: org.apache.spark.sql.DataFrame) =
      Corpus.unigramLmTrainFromCounts(df, 2, 2)
        .as[(String, Long, Long)].collect().toSet
    def bpe(df: org.apache.spark.sql.DataFrame) =
      Corpus.bpeMergesFromCounts(df, 3)
        .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    def wp(df: org.apache.spark.sql.DataFrame) =
      Corpus.wordpieceMergesFromCounts(df, 2)
        .as[(Int, String, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(uni(dup) == uni(agg))
    assert(bpe(dup) == bpe(agg))
    assert(wp(dup) == wp(agg))
  }

  test("unigramRetractCounts: guard fires even when the consumer prunes f (ADVICE r19)") {
    val ca = Corpus.unigramWordCounts(
      Seq((1L, "ab ab")).toDF("doc_id", "text"), "text")
    val cb = Corpus.unigramWordCounts(
      Seq((2L, "ab zz")).toDF("doc_id", "text"), "text")
    // the consumer reads ONLY w — a guard riding the projected f
    // column would be pruned away with it; the filter-anchored assert
    // must still raise on the never-merged slice
    val ex = intercept[Exception] {
      Corpus.unigramRetractCounts(ca, cb).select("w").collect()
    }
    assert(ex.getMessage.contains("never merged"), ex.getMessage)
    // and a legitimate retraction with a pruned consumer still works
    val merged = Corpus.unigramMergeCounts(ca, cb)
    val ws = Corpus.unigramRetractCounts(merged, cb)
      .select("w").as[String].collect().toSet
    assert(ws == Set("ab"))
  }

  test("bpeMergesFromCounts: hand-computed weighted char merges + increment law") {
    // dict {abab: 2, ab: 3}: round-1 pairs (a b)·2·2 + (a b)·3 = 7,
    // (b a)·2 = 2 -> merge (a, b) count 7; round 2: abab's two merged
    // cells pair once each word -> (ab, ab) count 2; round 3: no pairs.
    val dict = Seq(("abab", 2L), ("ab", 3L)).toDF("w", "f")
    val got = Corpus.bpeMergesFromCounts(dict, 5)
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1, "a", "b", 7L), (2, "a b", "a b", 2L)),
      s"got ${got.toSeq}")
    // increment law: train-from-fold is BIT-equal to a retrain on the
    // union (training is a pure function of the dict)
    val a = Seq((1L, "rock rock roll"), (2L, "rock on")).toDF("doc_id", "text")
    val b = Seq((3L, "roll roll rock"), (4L, "onon")).toDF("doc_id", "text")
    def model(wc: org.apache.spark.sql.DataFrame) =
      Corpus.bpeMergesFromCounts(wc, 4)
        .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(model(Corpus.unigramMergeCounts(
      Corpus.unigramWordCounts(a, "text"),
      Corpus.unigramWordCounts(b, "text"))) ==
      model(Corpus.unigramWordCounts(a.unionByName(b), "text")))
    // schema guard
    intercept[IllegalArgumentException] {
      Corpus.bpeMergesFromCounts(dict.withColumnRenamed("f", "n"), 2)
    }
  }

  test("wordpieceMergesFromCounts: likelihood-gain argmax + increment law") {
    // dict {abc: 4, ab: 1, bc: 1}: counts a=5, b=6, c=5;
    // pair (a b) c=5 -> sc = 5e12/(5*6) = 166666666666;
    // pair (b c) c=5 -> sc = 5e12/(6*5) = same 166666666666; ties
    // break (count desc, pair asc): both c=5, pair asc picks
    // "a b" < "b c" -> merge 1 = (a, b).
    val dict = Seq(("abc", 4L), ("ab", 1L), ("bc", 1L)).toDF("w", "f")
    val got = Corpus.wordpieceMergesFromCounts(dict, 1)
      .as[(Int, String, String, Long, Long)].collect()
    assert(got.head == ((1, "a", "b", 5L, 166666666666L)), s"got ${got.head}")
    // increment law: train-from-fold BIT-equal to retrain on the union
    val a = Seq((1L, "hip hop hip"), (2L, "hop it")).toDF("doc_id", "text")
    val b = Seq((3L, "hip it hop"), (4L, "tip top")).toDF("doc_id", "text")
    def model(wc: org.apache.spark.sql.DataFrame) =
      Corpus.wordpieceMergesFromCounts(wc, 3)
        .as[(Int, String, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(model(Corpus.unigramMergeCounts(
      Corpus.unigramWordCounts(a, "text"),
      Corpus.unigramWordCounts(b, "text"))) ==
      model(Corpus.unigramWordCounts(a.unionByName(b), "text")))
  }

  test("unigramLm EM: frequent sibling words pull a rare word's segmentation") {
    // "a" and "bc" are frequent words; "abc" is rare. Seed counts make
    // lp(a) = lp(bc) < lp(abc) (the whole-word candidate is rare), so
    // the E-step segments "abc" as a + bc — the EM redistribution BPE's
    // greedy merges cannot express. The usage counts then FIX this
    // point: rounds 1 and 2 agree exactly (convergence law).
    val docs = Seq(
      (1L, "a a a a a a a a a a"),
      (2L, "bc bc bc bc bc bc bc bc bc bc"),
      (3L, "abc")).toDF("doc_id", "text")
    def run(r: Int): Seq[(String, Long, Long)] =
      Corpus.unigramLmTrain(docs, "doc_id", "text", maxPieceLen = 3,
        emRounds = r).as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    val r1 = run(1)
    // usage: a = 10 (word) + 1 (inside abc) = 11, bc = 10 + 1 = 11;
    // tot = 22, V = 6 -> lp = floor(-ln(12/28)*1e9+0.5) = 847297860
    assert(r1 == Seq(("a", 11L, 847297860L), ("bc", 11L, 847297860L)), r1)
    assert(run(2) == r1, "EM fixed point: round 2 must equal round 1")
  }

  test("unigramLmPruned: prune law, char coverage, no-prune == extra EM round") {
    val docs = Seq(
      (1L, "a a a a a a a a a a"),
      (2L, "bc bc bc bc bc bc bc bc bc bc"),
      (3L, "abc")).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Long)] =
      df.as[(String, Long, Long)].collect().toSet
    // keepTop >= V keeps the whole vocabulary -> the pruned pass IS
    // one more EM round over the full lattice
    val noPrune = Corpus.unigramLmPruned(docs, "doc_id", "text",
      maxPieceLen = 3, emRounds = 1, keepTop = 1000)
    assert(rows(noPrune) ==
      rows(Corpus.unigramLmScores(docs, "doc_id", "text", 3, 2)))
    // aggressive prune: keepTop=1 keeps the top piece ("a", usage 11,
    // ties to "a" < "bc" alphabetically) + ALL single chars; "bc" is
    // gone from the vocabulary, so "bc" and "abc" re-segment to chars
    // and usage shifts onto b and c
    val pruned = Corpus.unigramLmPruned(docs, "doc_id", "text",
      maxPieceLen = 3, emRounds = 1, keepTop = 1)
      .filter(col("cnt") > 0)
    val got = rows(pruned).map { case (p, c, _) => p -> c }.toMap
    assert(got == Map("a" -> 11L, "b" -> 11L, "c" -> 11L), got.toString)
    // pruned vocabulary is a subset of the seed vocabulary and keeps
    // every single character
    val vocabAll = Corpus.unigramLmScores(docs, "doc_id", "text", 3, 1)
      .select("piece").as[String].collect().toSet
    val prunedVocab = Corpus.unigramLmPruned(docs, "doc_id", "text", 3, 1, 2)
      .select("piece").as[String].collect().toSet
    assert(prunedVocab.subsetOf(vocabAll))
    assert(vocabAll.filter(_.length == 1).subsetOf(prunedVocab))
    intercept[IllegalArgumentException] {
      Corpus.unigramLmPruned(docs, "doc_id", "text", 3, 1, 0)
    }
  }

  test("unigramLmEncode: trained pieces, OOV single-char fallback, empty docs") {
    val train = Seq((1L, "ab ab"), (2L, "ab")).toDF("doc_id", "text")
    val scores = Corpus.unigramLmScores(train, "doc_id", "text", 2, 1)
    // "ab" encodes as the 1 learned piece; "xy" is fully OOV -> 2
    // single-char UNK pieces; the empty doc keeps its (0, 0) spine row
    val target = Seq((10L, "ab xy"), (11L, ""), (12L, "ab ab ab"))
      .toDF("doc_id", "text")
    val got = Corpus.unigramLmEncode(target, "doc_id", "text", scores, 2)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((10L, 2L, 3L), (11L, 0L, 0L), (12L, 3L, 3L)))
    intercept[IllegalArgumentException] {
      Corpus.unigramLmEncode(target, "doc_id", "text", scores.drop("cnt"), 2)
    }
  }

  test("tfIdfTopTerms matches a hand-computed fixture with tie-breaks") {
    // 4 docs; "common" appears in all (idf = ln(1) = 0), "rare" in one
    val docs = Seq(
      (1L, "common rare rare"),
      (2L, "common alpha beta"),
      (3L, "common alpha"),
      (4L, "common"))
      .toDF("doc_id", "text")
    val got = Corpus.tfIdfTopTerms(docs, "doc_id", "text", 5)
      .select("doc_id", "term", "tf", "df", "score", "rank")
      .as[(Long, String, Long, Long, Double, Int)].collect().toSet
    def sc(tf: Long, df: Long) =
      BigDecimal(tf * math.log(4.0 / df))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Set(
      (1L, "rare", 2L, 1L, sc(2, 1), 1),
      (1L, "common", 1L, 4L, 0.0, 2),
      // beta (df=1) outscores alpha (df=2); common's ln(1)=0 ranks last
      (2L, "beta", 1L, 1L, sc(1, 1), 1),
      (2L, "alpha", 1L, 2L, sc(1, 2), 2),
      (2L, "common", 1L, 4L, 0.0, 3),
      (3L, "alpha", 1L, 2L, sc(1, 2), 1),
      (3L, "common", 1L, 4L, 0.0, 2),
      (4L, "common", 1L, 4L, 0.0, 1)))
  }

  test("tfIdfTopTerms keeps at most k terms per doc") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val top = Corpus.tfIdfTopTerms(docs, "doc_id", "text", 3)
    val perDoc = top.groupBy("doc_id").agg(count(lit(1)).as("n"),
      max("rank").as("maxr"))
      .as[(Long, Long, Int)].collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach { case (_, n, maxr) => assert(n <= 3 && maxr <= 3) }
  }

  test("vocabulary ranks by count desc then term asc, bounded by topN") {
    val docs = Seq("b b b a a c", "a c", "d").toDF("text")
    val got = Corpus.vocabulary(docs, "text", 3)
      .select("term", "n", "rank").as[(String, Long, Int)].collect().toSeq
      .sortBy(_._3)
    // a and b both count 3 -> 'a' wins the tie; c=2; d cut by topN
    assert(got == Seq(("a", 3L, 1), ("b", 3L, 2), ("c", 2L, 3)))
  }

  test("vocabulary global top-N plans as TakeOrdered, no full sort") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = Corpus.vocabulary(docs, "text", 200)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-N over counts should be a bounded per-partition heap:\n$plan")
  }

  test("contaminationFlags flags exactly the train docs sharing an n-gram") {
    val train = Seq(
      (1L, "alpha beta gamma delta"), // shares "beta gamma delta" with eval
      (2L, "epsilon zeta eta theta"), // no 3-gram in common
      (3L, "beta gamma delta alpha")) // same grams, different order
      .toDF("doc_id", "text")
    val eval = Seq((100L, "xx beta gamma delta yy")).toDF("doc_id", "text")
    val got = Corpus.contaminationFlags(train, eval, "doc_id", "text", n = 3)
      .select("doc_id", "n_shared_grams", "contaminated")
      .as[(Long, Long, Boolean)].collect()
      .map { case (id, n, c) => id -> ((n, c)) }.toMap
    assert(got(1L) == ((1L, true)))  // only "beta gamma delta" overlaps
    assert(got(2L) == ((0L, false)))
    assert(got(3L) == ((1L, true)))
    assert(got.size == 3) // one row per train doc, clean ones included
  }

  test("contaminationFlags counts distinct shared grams once per doc") {
    // train doc repeats the overlapping 2-gram; distinct-shingling must
    // count it once — eval's only gram is "a b", so the count is 1
    val train = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val eval = Seq((9L, "a b")).toDF("doc_id", "text")
    val got = Corpus.contaminationFlags(train, eval, "doc_id", "text", n = 2)
      .select("n_shared_grams").as[Long].collect()
    assert(got.toSeq == Seq(1L))
  }

  test("blocklistFilter drops docs containing any blocked term, case-insensitively") {
    val docs = Seq(
      (1L, "clean text here"),
      (2L, "contains BadWord inside"),
      (3L, "badword at start"),
      (4L, "badwording is a different token"))
      .toDF("doc_id", "text")
    val got = Corpus.blocklistFilter(docs, "text", Seq("BADWORD"))
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 4L))
  }

  test("blocklistFilter DataFrame overload enforces the size guard") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    val bl = Seq("a", "b", "c").toDF("term")
    assertThrows[IllegalArgumentException] {
      Corpus.blocklistFilter(docs, "text", bl, "term", maxTerms = 2)
    }
    val ok = Corpus.blocklistFilter(docs, "text", bl, "term", maxTerms = 3)
    assert(ok.count() == 1)
  }

  test("bm25 matches the hand formula, skips no-hit docs, ranks deterministically") {
    val docs = Seq(
      (1L, "join join hash"),
      (2L, "join scan"),
      (3L, "other words here"))
      .toDF("doc_id", "text")
    val got = Corpus.bm25(docs, "doc_id", "text", Seq("join", "hash", "scan"))
      .select("doc_id", "score", "rank").as[(Long, Double, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val (k1, b) = (1.2, 0.75)
    val avgdl = 8.0 / 3
    def idf(df: Long) = math.log((3.0 - df + 0.5) / (df + 0.5) + 1.0)
    def w(tf: Long, dl: Long) = (tf * (k1 + 1)) / (tf + k1 * ((1 - b) + b * dl / avgdl))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val s1 = r6(idf(2) * w(2, 3) + idf(1) * w(1, 3)) // join×2 + hash
    val s2 = r6(idf(2) * w(1, 2) + idf(1) * w(1, 2)) // join + scan
    assert(got.keySet == Set(1L, 2L), "no-hit docs must not appear")
    assert(got(1L)._1 == s1 && got(2L)._1 == s2)
    assert(got(if (s1 > s2) 1L else 2L)._2 == 1)
  }

  test("unigramSurprisal matches the hand formula with exact fixed-point sums") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = Corpus.unigramSurprisal(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // corpus: a=2, b=2, c=1, total=5
    def lp(cnt: Long) = math.floor(-math.log(cnt.toDouble / 5) * 1e9 + 0.5).toLong
    def mean(s: Long, n: Long) =
      BigDecimal(s.toDouble / (n * 1e9))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((3L, mean(2 * lp(2) + lp(2), 3))))
    assert(got(2L) == ((2L, mean(lp(2) + lp(1), 2))))
  }

  test("blocklistFilter plans with zero shuffle exchanges") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = Corpus.blocklistFilter(docs, "text", Seq("vector"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"blocklist filter must be a pure map:\n$plan")
  }

  test("chunkDocuments: gapless coverage, correct overlap, empty doc kept") {
    val docs = Seq((1L, "abcdefghij"), (2L, ""), (3L, "xy"))
      .toDF("doc_id", "text")
    // size 4, stride 3: doc 1 (10 chars) -> starts 1,4,7,10
    val got = Corpus.chunkDocuments(docs, "doc_id", "text", 4, 3)
      .select("doc_id", "chunk_idx", "chunk_start", "chunk_len")
      .as[(Long, Int, Int, Int)].collect().toSet
    assert(got == Set(
      (1L, 0, 1, 4), (1L, 1, 4, 4), (1L, 2, 7, 4), (1L, 3, 10, 1),
      (2L, 0, 1, 0),
      (3L, 0, 1, 2)))
    // fingerprints match md5 of the exact substrings
    val hashes = Corpus.chunkDocuments(docs, "doc_id", "text", 4, 3)
      .filter(col("doc_id") === 1L && col("chunk_idx") === 1)
      .select("chunk_hash").as[String].head()
    assert(hashes == java.security.MessageDigest.getInstance("MD5")
      .digest("defg".getBytes("UTF-8")).map("%02x".format(_)).mkString)
  }

  test("chunkDocuments plans as a pure map-side explode (no Exchange)") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = Corpus.chunkDocuments(docs, "doc_id", "text", 120, 90)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }
  test("bigramSurprisal: exact MLE bigram probabilities on a hand corpus") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "z"))
      .toDF("doc_id", "text")
    val got = Corpus.bigramSurprisal(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, m) => id -> ((n, m)) }.toMap
    // c(a b)=2, c(a c)=1, ctx(a)=3
    def q(p: Double): Double = {
      val s = math.floor(-math.log(p) * 1e9 + 0.5) / 1e9
      BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got(1L) == ((1L, q(2.0 / 3))))
    assert(got(2L) == got(1L))
    assert(got(3L) == ((1L, q(1.0 / 3))))
    assert(got(4L) == ((0L, 0.0))) // single-token doc: no bigrams
  }

  test("bigramSurprisal flags fluent-word gibberish that unigrams miss") {
    val normal = (1L to 20L).map(i => (i, "the cat sat on the mat"))
    val gibber = Seq((99L, "the the the the the the"))
    val docs = (normal ++ gibber).toDF("doc_id", "text")
    val bg = Corpus.bigramSurprisal(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map { case (id, _, m) => id -> m }.toMap
    // "the the" is rare in the corpus model while the normal docs'
    // bigrams are common -> gibberish scores strictly higher
    assert(bg(99L) > bg(1L))
  }

  test("ngramPerplexity: exact math on a tiny seed model") {
    // seed: "a b" twice -> c(a b)=2, ctx(a)=2, uni a:2 b:2, N=4, V=2
    val seed = Seq((100L, "a b"), (101L, "a b")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b"),   // seen bigram
      (2L, "a c"),   // unseen bigram, OOV w2, seen context
      (3L, "x"))     // single token: no bigrams, keeps by definition
      .toDF("doc_id", "text")
    val got = Corpus.ngramPerplexity(docs, seed, "doc_id", "text",
      lambdaBp = 7000, keepThreshold = 1.0)
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def score(cbg: Long, ctx: Long, cw: Long): Double = {
      val pb = (cbg + 1).toDouble / (ctx + 2)
      val pu = (cw + 1).toDouble / (4 + 2)
      val s = math.floor(-math.log(0.7 * pb + 0.3 * pu) * 1e9 + 0.5) / 1e9
      BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // doc 1: P = .7*(2+1)/(2+2) + .3*(2+1)/(4+2)
    assert(got(1L) == ((1L, score(2, 2, 2), score(2, 2, 2) <= 1.0)))
    // doc 2: unseen "a c" -> .7*(0+1)/(2+2) + .3*(0+1)/(4+2)
    assert(got(2L) == ((1L, score(0, 2, 0), score(0, 2, 0) <= 1.0)))
    assert(got(2L)._2 > got(1L)._2, "unseen bigram must score higher")
    // doc 3: no evidence -> keep
    assert(got(3L) == ((0L, 0.0, true)))
  }

  test("ngramPerplexity: in-domain text keeps, out-of-domain gibberish drops") {
    val seed = (100L to 119L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog near the river bank"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "zxq wvut ponm lkji hgfe dcba qqqq zzzz xxxx yyyy"))
      .toDF("doc_id", "text")
    // hand-computed under the seed model: in-domain mean ≈ 0.88,
    // gibberish (all-OOV, all-unseen-context) ≈ 2.74 — 2.0 splits
    val got = Corpus.ngramPerplexity(docs, seed, "doc_id", "text",
      lambdaBp = 7000, keepThreshold = 2.0)
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    assert(got(1L)._2, s"in-domain doc must keep: ${got(1L)}")
    assert(!got(2L)._2, s"gibberish must drop: ${got(2L)}")
    assert(got(2L)._1 > got(1L)._1)
  }

  test("ngramPerplexity: over-budget seed falls back to shuffle-hash, result identical") {
    val seed = (100L to 119L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog near the river bank"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "zxq wvut ponm lkji hgfe dcba qqqq zzzz xxxx yyyy"))
      .toDF("doc_id", "text")
    // budget=1 < vocab size -> BOTH vocab-sized joins (ctx, uni) fall
    // back to shuffle-hash, joining the always-pinned bigram join for
    // 3 ShuffledHashJoins; the default budget broadcasts ctx+uni
    val gated = Corpus.ngramPerplexity(docs, seed, "doc_id", "text",
      seedBroadcastBudget = 1L)
    val gatedPlan = gated.queryExecution.executedPlan.toString
    assert("ShuffledHashJoin".r.findAllIn(gatedPlan).length >= 3,
      s"tiny budget must force shuffle-hash on the vocab joins:\n$gatedPlan")
    val broad = Corpus.ngramPerplexity(docs, seed, "doc_id", "text")
    val broadPlan = broad.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(broadPlan).length >= 2,
      s"default budget must broadcast the vocab joins:\n$broadPlan")
    val g = gated.as[(Long, Long, Double, Boolean)].collect().sortBy(_._1)
    val b = broad.as[(Long, Long, Double, Boolean)].collect().sortBy(_._1)
    assert(g.sameElements(b), "fallback path must produce identical rows")
  }

  test("knPerplexity: exact interpolated Kneser-Ney math on a tiny seed model") {
    // seed bigram types: "a b" c=2, "a c" c=1 -> ctx(a)=3, N1+(a.)=2;
    // N1+(.b)=1, N1+(.c)=1; B=2 types; V=3 unigrams (a b c)
    val seed = Seq((100L, "a b"), (101L, "a b"), (102L, "a c"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b"),   // seen bigram, discounted head + backoff
      (2L, "a c"),   // seen once: head = (1e4 - 7500)/3e4
      (3L, "a z"),   // seen context, OOV continuation: pure backoff
      (4L, "z a"),   // unseen context: pure continuation (N1+(.a)=0
                     // -- "a" never appears as a continuation)
      (5L, "x"))     // single token: no evidence, keeps
      .toDF("doc_id", "text")
    def quant(p: Double): Double = {
      val s = math.floor(-math.log(p) * 1e9 + 0.5) / 1e9
      BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def pcont(n1bw: Long): Double = (n1bw + 1).toDouble / (2 + 3 + 1)
    def pSeen(cbg: Long, n1bw: Long): Double =
      math.max(10000L * cbg - 7500L, 0L).toDouble / 30000.0 +
        (7500.0 * 2) / 30000.0 * pcont(n1bw)
    val got = Corpus.knPerplexity(docs, seed, "doc_id", "text",
      discountBp = 7500, keepThreshold = 1.0)
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((1L, quant(pSeen(2, 1)), quant(pSeen(2, 1)) <= 1.0)))
    assert(got(2L) == ((1L, quant(pSeen(1, 1)), quant(pSeen(1, 1)) <= 1.0)))
    assert(got(3L) == ((1L, quant(pSeen(0, 0)), quant(pSeen(0, 0)) <= 1.0)))
    assert(got(4L) == ((1L, quant(pcont(0)), quant(pcont(0)) <= 1.0)))
    assert(got(5L) == ((0L, 0.0, true)))
    // the discount ladder orders correctly: twice-seen < once-seen <
    // seen-context-OOV-continuation
    assert(got(1L)._2 < got(2L)._2 && got(2L)._2 < got(3L)._2)
  }

  test("knPerplexity: continuation counts beat raw frequency (the Francisco effect)") {
    // "francisco" and "dog" have EQUAL unigram frequency (6 each) in
    // the seed — an add-one unigram backoff ties them. KN's
    // continuation count separates: francisco follows ONE context
    // (san), dog follows THREE (a/b/c), so in the novel context "the"
    // P_KN(dog|the) > P_KN(francisco|the).
    val seed = (
      (0 until 6).map(i => (100L + i, "san francisco")) ++
        Seq((110L, "a dog"), (111L, "a dog"), (112L, "b dog"),
          (113L, "b dog"), (114L, "c dog"), (115L, "c dog"),
          (116L, "the x"))).toDF("doc_id", "text")
    val docs = Seq((1L, "the francisco"), (2L, "the dog"))
      .toDF("doc_id", "text")
    val got = Corpus.knPerplexity(docs, seed, "doc_id", "text")
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got(1L) > got(2L),
      s"one-context francisco must score higher surprisal than " +
        s"multi-context dog: ${got(1L)} vs ${got(2L)}")
  }

  test("knPerplexity: in-domain keeps, gibberish drops; budget fallback identical") {
    val seed = (100L to 119L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog near the river bank"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "zxq wvut ponm lkji hgfe dcba qqqq zzzz xxxx yyyy"))
      .toDF("doc_id", "text")
    val broad = Corpus.knPerplexity(docs, seed, "doc_id", "text",
      keepThreshold = 2.0)
    val b = broad.as[(Long, Long, Double, Boolean)].collect().sortBy(_._1)
    val byId = b.map(r => r._1 -> ((r._3, r._4))).toMap
    assert(byId(1L)._2, s"in-domain doc must keep: ${byId(1L)}")
    assert(!byId(2L)._2, s"gibberish must drop: ${byId(2L)}")
    val gated = Corpus.knPerplexity(docs, seed, "doc_id", "text",
      keepThreshold = 2.0, seedBroadcastBudget = 1L)
    val gatedPlan = gated.queryExecution.executedPlan.toString
    assert("ShuffledHashJoin".r.findAllIn(gatedPlan).length >= 3,
      s"tiny budget must force shuffle-hash on the vocab joins:\n$gatedPlan")
    val g = gated.as[(Long, Long, Double, Boolean)].collect().sortBy(_._1)
    assert(g.sameElements(b), "fallback path must produce identical rows")
    intercept[IllegalArgumentException] {
      Corpus.knPerplexity(docs, seed, "doc_id", "text", discountBp = 0)
    }
  }

  test("wordpieceMerges: likelihood gain beats raw frequency; exact scores; early stop") {
    // "a b" is the most FREQUENT pair (4) but its parts are everywhere
    // (a: 10, b: 10 -> score 4e12/100); "u v" occurs 3 times but its
    // parts occur ONLY together (3 each -> score 3e12/9) — WordPiece
    // merges (u, v) first, BPE would merge (a, b)
    val docs = (
      (1L to 4L).map(i => (i, "a b")) ++
        (11L to 16L).map(i => (i, "a")) ++
        (21L to 26L).map(i => (i, "b")) ++
        (31L to 33L).map(i => (i, "u v"))).toDF("doc_id", "text")
    val got = Corpus.wordpieceMerges(docs, "doc_id", "text", numMerges = 5)
      .as[(Int, String, String, Long, Long)].collect().sortBy(_._1)
    assert(got.length == 2, s"early stop after pairs exhaust: ${got.toSeq}")
    assert(got(0) == ((1, "u", "v", 3L, 3000000000000L / 9L)), s"got ${got(0)}")
    assert(got(1) == ((2, "a", "b", 4L, 4000000000000L / 100L)), s"got ${got(1)}")
    // the BPE criterion picks the frequent pair first — the divergence
    // that makes WordPiece a different tokenizer
    val bpeFirst = Corpus.bpeMerges(docs, "doc_id", "text", 1)
      .as[(Int, String, String, Long)].collect().head
    assert((bpeFirst._2, bpeFirst._3) == (("a", "b")))
  }

  test("linearQuality: exact NB log-count-ratio weights on a tiny corpus") {
    val pos = Seq((0L, "good text")).toDF("doc_id", "text")
    val neg = Seq((1L, "bad stuff")).toDF("doc_id", "text")
    val w = Corpus.linearQualityWeights(pos, neg, "text", topF = 10)
      .as[(String, Long)].collect().toMap
    // V=6 (3 grams/class), np=nn=3: w(pos gram) = ln(2/9)-ln(1/9) = ln 2
    val ln2fp = math.floor(math.log(2.0) * 1e6 + 0.5).toLong // 693147
    assert(w.size == 6)
    assert(w("good") == ln2fp && w("text") == ln2fp && w("good text") == ln2fp)
    assert(w("bad") == -ln2fp && w("stuff") == -ln2fp && w("bad stuff") == -ln2fp)

    val docs = Seq((1L, "good text"), (2L, "bad stuff"), (3L, "good bad"),
      (4L, "")).toDF("doc_id", "text")
    val got = Corpus.linearQualityScore(docs, "doc_id", "text",
      w.toSeq, threshold = 0.0)
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val ln2r = BigDecimal(ln2fp / 1e6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((3L, ln2r, true)))    // 3 seed grams: mean +ln2
    assert(got(2L) == ((3L, -ln2r, false)))  // 3 neg grams: mean -ln2
    assert(got(3L) == ((3L, 0.0, true)))     // +ln2 - ln2 + OOV 0
    assert(got(4L) == ((0L, 0.0, true)))     // no evidence -> keep
  }

  test("linearQuality: topF keeps the strongest features, scoring is OOV-safe") {
    val pos = (1L to 10L).map(i => (i, "alpha beta alpha")).toDF("doc_id", "text")
    val neg = (11L to 20L).map(i => (i, "gamma delta")).toDF("doc_id", "text")
    val top2 = Corpus.linearQualityWeights(pos, neg, "text", topF = 2)
      .as[(String, Long)].collect()
    assert(top2.length == 2)
    val all = Corpus.linearQualityWeights(pos, neg, "text", topF = 100)
      .as[(String, Long)].collect()
    val worst2 = all.map(e => math.abs(e._2)).sorted.reverse.take(2).toSeq
    assert(top2.map(e => math.abs(e._2)).sorted.reverse.toSeq == worst2)
    // scoring a doc of entirely unseen grams: logit 0, keeps at 0.0
    val got = Corpus.linearQualityScore(
      Seq((1L, "zz qq")).toDF("doc_id", "text"), "doc_id", "text",
      top2.toSeq, threshold = 0.0).as[(Long, Long, Double, Boolean)].collect()
    assert(got.head == ((1L, 3L, 0.0, true)))
  }

  test("linearQualityScore plans as a map: no joins, no hash exchange") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = Corpus.linearQualityScore(docs, "doc_id", "text",
      Seq(("good", 693147L), ("bad", -693147L)), threshold = 0.0)
      .queryExecution.executedPlan.toString
    // the literal-map scoring is join-free; the only allowed Exchange
    // is spread()'s deliberate round-robin of the (small) input
    assert(!plan.contains("Join"), s"scoring must not join:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"scoring must not hash-shuffle:\n$plan")
  }

  test("linearQuality: empty class fails loud") {
    val docs = Seq((1L, "some text")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Corpus.linearQualityWeights(docs, docs.filter(col("doc_id") < 0), "text")
    }
    assert(e.getMessage.contains("empty negative"))
  }

  test("ngramPerplexity: empty seed fails loud") {
    val docs = Seq((1L, "some text here")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Corpus.ngramPerplexity(docs, docs.filter(col("doc_id") < 0),
        "doc_id", "text")
    }
    assert(e.getMessage.contains("empty seed"))
  }

  test("rrfFuse: exact reciprocal sums, absent docs contribute zero, ties by doc") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val b = Seq((20L, 1), (10L, 2), (40L, 3)).toDF("doc_id", "rank")
    val got = graft.operators.Corpus.rrfFuse(Seq(a, b), "doc_id", "rank",
      k = 60, topN = 10)
      .select("doc_id", "rrf", "n_lists", "rank")
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    def c(r: Int) = 1000000L / (60L + r)
    // 10: r1+r2, 20: r2+r1 -> exact tie with 10, broken by doc asc;
    // 30 and 40 single-list at r3, tie broken by doc asc
    assert(got.map(x => (x._1, x._2, x._3)).toSeq == Seq(
      (10L, c(1) + c(2), 2L), (20L, c(2) + c(1), 2L),
      (30L, c(3), 1L), (40L, c(3), 1L)))
    assert(got.map(_._4).toSeq == Seq(1, 2, 3, 4))
    // topN cuts the fused ranking, not the inputs
    assert(graft.operators.Corpus.rrfFuse(Seq(a, b), "doc_id", "rank",
      topN = 2).count() == 2)
    intercept[IllegalArgumentException] {
      graft.operators.Corpus.rrfFuse(Seq.empty, "doc_id", "rank")
    }
  }

  test("cdcChunks: content-decided boundaries, insertion locality, exact dup flags") {
    import graft.operators.Corpus
    // 'charlie' and 'lima' hash to 0 mod 8 (verified constants) — they
    // END chunks; everything else continues one
    val a = "alpha bravo charlie delta echo lima foxtrot golf"
    val docs = Seq(
      (1L, a),
      (2L, s"zulu yankee $a"),       // two tokens INSERTED at the front
      (3L, "delta echo lima"))        // = doc 1's middle chunk, alone
      .toDF("doc_id", "text")
    val got = Corpus.cdcChunks(docs, "doc_id", "text", divisor = 8)
      .as[(Long, Long, Long, String, Boolean)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2) }
    // doc 1: [alpha bravo charlie][delta echo lima][foxtrot golf]
    assert(got(1L).map(_._3).toSeq == Seq(3L, 3L, 2L))
    // insertion locality: only the FIRST chunk of doc 2 differs; the
    // two later chunks re-align and carry the dup flag
    assert(got(2L).map(_._3).toSeq == Seq(5L, 3L, 2L))
    assert(got(2L).head._5 == false && got(2L)(1)._5 && got(2L)(2)._5,
      s"later chunks must re-align and dedup: ${got(2L).toSeq}")
    assert(got(2L)(1)._4 == got(1L)(1)._4 && got(2L)(2)._4 == got(1L)(2)._4)
    // doc 3 is exactly doc 1's middle chunk -> dup of the (1, 1) occurrence
    assert(got(3L).map(r => (r._3, r._5)).toSeq == Seq((3L, true)))
    intercept[IllegalArgumentException] {
      Corpus.cdcChunks(docs, "doc_id", "text", divisor = 1)
    }
  }

  test("incremental decontamination: stored + delta == full pass, overlapping benchmarks count once") {
    import graft.operators.Corpus
    val train = Seq(
      (1L, "aa bb cc dd ee"),   // shares gram1 (aa bb cc) with E1 AND E2
      (2L, "cc dd ee ff gg"),   // shares gram2 (cc dd ee) with E2 only
      (3L, "zz yy xx ww vv"))   // clean
      .toDF("doc_id", "text")
    val e1 = Seq((100L, "aa bb cc qq rr")).toDF("doc_id", "text")
    // E2 repeats E1's gram AND adds a new one
    val e2 = Seq((200L, "aa bb cc dd ee")).toDF("doc_id", "text")
    val n = 3
    val postings = Corpus.gramPostings(train, "doc_id", "text", n)
    val idx1 = Corpus.evalGramRecords(e1, "text", n)
    val fresh = Corpus.newEvalGrams(e2, "text", idx1, n)
    // disjointness: the repeated gram is excluded from the delta
    assert(fresh.count() <
      Corpus.evalGramRecords(e2, "text", n).count())
    val stored = Corpus.contaminationDelta(postings, idx1)
      .withColumnRenamed("n_new_shared", "n_shared_grams")
    val merged = Corpus.mergeContaminationHits(
      stored, Corpus.contaminationDelta(postings, fresh))
      .as[(Long, Long)].collect().toMap
    val full = Corpus.contaminationHits(train, e1.unionByName(e2),
      "doc_id", "text", n)
      .as[(Long, Long)].collect().toMap
    assert(merged == full, s"incremental $merged must equal full $full")
    assert(merged.contains(1L) && merged.contains(2L) && !merged.contains(3L))
    intercept[IllegalArgumentException] {
      Corpus.contaminationDelta(postings.drop("gk"), idx1)
    }
    intercept[IllegalArgumentException] {
      Corpus.mergeContaminationHits(stored.drop("n_shared_grams"), stored)
    }
  }

  test("incremental BM25: merged mergeable stats == full-corpus stats, scoring included") {
    val docs = Seq(
      (1L, "hash join scan over the build side"),
      (2L, "scan scan scan and nothing else"),
      (3L, "a hash table for the hash join probe"),
      (4L, "join the two sides with a merge"),
      (5L, "entirely unrelated words about nothing"))
      .toDF("doc_id", "text")
    val terms = Seq("join", "hash", "scan")
    val store = docs.filter(col("doc_id") <= 2)
    val batch = docs.filter(col("doc_id") > 2)
    val (st, sc) = graft.operators.Corpus.bm25StatsRecords(store, "doc_id", "text")
    val (bt, bc) = graft.operators.Corpus.bm25StatsRecords(batch, "doc_id", "text")
    val (mt, mc) = graft.operators.Corpus.bm25MergeStats(st, sc, bt, bc)
    val (ft, fc) = graft.operators.Corpus.bm25StatsRecords(docs, "doc_id", "text")
    // the merged stats ARE the full-corpus stats, term by term
    assert(mt.as[(String, Long)].collect().toMap ==
      ft.as[(String, Long)].collect().toMap)
    assert(mc.as[(Long, Long)].collect().toSeq ==
      fc.as[(Long, Long)].collect().toSeq)
    // and scoring the batch under merged stats == under full stats
    def score(t: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.DataFrame) =
      graft.operators.Corpus.bm25WithStats(batch, "doc_id", "text", terms, t, c)
        .as[(Long, Double, Int)].collect().toSet
    assert(score(mt, mc) == score(ft, fc) && score(mt, mc).nonEmpty)
    // schema guards fail loud
    intercept[IllegalArgumentException] {
      graft.operators.Corpus.bm25WithStats(batch, "doc_id", "text", terms,
        mt.withColumnRenamed("df", "count"), mc)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Corpus.bm25MergeStats(st, sc.withColumnRenamed("sum_dl", "x"), bt, bc)
    }
  }

  test("rrfFuse: a doc repeated within one list counts once, at its best rank") {
    val a = Seq((10L, 1), (10L, 3), (20L, 2)).toDF("doc_id", "rank")
    val b = Seq((20L, 1)).toDF("doc_id", "rank")
    val got = graft.operators.Corpus.rrfFuse(Seq(a, b), "doc_id", "rank",
      k = 60, topN = 10)
      .select("doc_id", "rrf", "n_lists")
      .as[(Long, Long, Long)].collect().toSet
    def c(r: Int) = 1000000L / (60L + r)
    // 10 appears twice in list a: one contribution at min rank 1,
    // n_lists stays 1 — never 2
    assert(got == Set((10L, c(1), 1L), (20L, c(2) + c(1), 2L)))
  }

  test("cdcChunks/gramPostings: fail loud on null/non-castable/out-of-range ids") {
    import graft.operators.Corpus
    def failsWith(df: => org.apache.spark.sql.DataFrame, frag: String): Unit = {
      val e = intercept[Exception] { df.collect() }
      assert(e.getMessage != null && e.getMessage.contains(frag),
        s"expected '$frag' in: ${e.getMessage}")
    }
    // null-id doc: would silently merge all null-id docs into one
    failsWith(Corpus.cdcChunks(
      Seq((Some(1L), "alpha bravo"), (None, "charlie delta"))
        .toDF("doc_id", "text"), "doc_id", "text"), "cdcChunks")
    // non-castable string id
    failsWith(Corpus.cdcChunks(
      Seq(("not-a-number", "alpha bravo")).toDF("doc_id", "text"),
      "doc_id", "text"), "cdcChunks")
    // id past Long.MaxValue/1e9: the occurrence encoding would wrap
    failsWith(Corpus.cdcChunks(
      Seq((Long.MaxValue / 1000000000L, "alpha bravo"))
        .toDF("doc_id", "text"), "doc_id", "text"), "cdcChunks")
    failsWith(Corpus.gramPostings(
      Seq((Some(1L), "aa bb cc"), (None, "dd ee ff")).toDF("doc_id", "text"),
      "doc_id", "text", n = 2), "gramPostings")
    // valid ids still pass
    assert(Corpus.cdcChunks(Seq((7L, "alpha bravo charlie"))
      .toDF("doc_id", "text"), "doc_id", "text").count() >= 1)
  }

  test("vocabCoverage: exact OOV share per group, empty-token group, vocab guard") {
    import graft.operators.Corpus
    val docs = Seq(
      ("s1", "alpha beta alpha"),   // all in vocab
      ("s1", "alpha gamma"),        // gamma OOV -> s1: 1/5 OOV
      ("s2", "delta delta delta"),  // all OOV
      ("s3", ""))                   // tokenizes to nothing
      .toDF("src", "text")
    val vocab = Seq("alpha", "beta").toDF("term")
    val got = Corpus.vocabCoverage(docs, "src", "text", vocab)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("s1") == ((5L, 1L, 8000L)), s"got $got")
    assert(got("s2") == ((3L, 3L, 0L)))
    assert(got("s3") == ((0L, 0L, 10000L)),
      "no tokens is no OOV evidence: full coverage")
    // occurrences, not distinct terms: repeating an OOV term weighs it
    val rep = Corpus.vocabCoverage(
      Seq(("s", "x x x alpha")).toDF("src", "text"), "src", "text", vocab)
      .as[(String, Long, Long, Long)].head()
    assert(rep == (("s", 4L, 3L, 2500L)))
    intercept[IllegalArgumentException] {
      Corpus.vocabCoverage(docs, "src", "text",
        vocab.withColumnRenamed("term", "t"))
    }
  }
}
