package graft.ops

import graft.SparkSpec

/** BPE merge learning must reproduce the textbook greedy algorithm exactly:
  * highest weighted pair count first, lexicographic tie-break, merges
  * consuming their occurrences before the next round counts. */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  // The classic Sennrich corpus shape: low x5, lower x2, newest x6,
  // widest x3. Hand-derived merge table (word-internal, no end marker):
  //   1: (e,s)  9   (newest 6 + widest 3; beats (s,t) 9 lexicographically)
  //   2: (es,t) 9
  //   3: (l,o)  7   (low 5 + lower 2; beats (o,w) 7 lexicographically)
  //   4: (lo,w) 7
  //   5: (e,w)  6   (newest; beats (n,e) and (w,est) lexicographically)
  private def classicWords =
    Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "n")

  test("learns the hand-derived merge table on the classic corpus") {
    val got = Bpe.learn(classicWords, "word", "n", nMerges = 5)
      .map(m => (m.rank, m.left, m.right, m.pairCount))
    assert(got == Seq(
      (1, "e", "s", 9L),
      (2, "es", "t", 9L),
      (3, "l", "o", 7L),
      (4, "lo", "w", 7L),
      (5, "e", "w", 6L)))
  }

  test("driver-local and distributed paths learn the identical table") {
    // maxLocalVocab=0 forces the distributed per-round loop on the same
    // input the default (local) path handles — both must agree exactly,
    // including tie-breaks and early exhaustion
    val local = Bpe.learn(classicWords, "word", "n", nMerges = 5)
    val dist = Bpe.learn(classicWords, "word", "n", nMerges = 5,
      maxLocalVocab = 0L)
    assert(local == dist)
    val tiny = Seq(("ab", 3L), ("abab", 1L)).toDF("word", "n")
    assert(Bpe.learn(tiny, "word", "n", nMerges = 10) ==
      Bpe.learn(tiny, "word", "n", nMerges = 10, maxLocalVocab = 0L))
  }

  test("tie-breaks agree across paths on supplementary-plane symbols") {
    // U+1F600 (😀, surrogate pair D83D DE00; UTF-8 F0 9F 98 80) vs U+FB00
    // (ﬀ; UTF-8 EF AC 80): UTF-16 code-unit order says 😀 < ﬀ, UTF-8 byte
    // order (UTF8String, the distributed orderBy) says ﬀ < 😀. Two pairs
    // with EQUAL counts starting with these symbols force the tie-break to
    // pick a winner — both paths must pick the UTF-8-smaller (ﬀ, a).
    val words = Seq(("😀a", 2L), ("ﬀa", 2L)).toDF("word", "n")
    val local = Bpe.learn(words, "word", "n", nMerges = 1)
    val dist = Bpe.learn(words, "word", "n", nMerges = 1, maxLocalVocab = 0L)
    assert(local == dist)
    assert(local.head.left == "ﬀ")
    // and byte-order disagreement INSIDE the right symbol too
    val words2 = Seq(("x😀", 2L), ("xﬀ", 2L)).toDF("word", "n")
    assert(Bpe.learn(words2, "word", "n", nMerges = 1) ==
      Bpe.learn(words2, "word", "n", nMerges = 1, maxLocalVocab = 0L))
  }

  test("driver-local path is gated on total symbols, not just rows") {
    // 3 rows but a symbol budget of 5: must take the distributed loop
    // (and still learn the same table as the local path)
    val words = Seq(("abcd", 2L), ("abce", 1L), ("ab", 1L)).toDF("word", "n")
    val viaDist = Bpe.learn(words, "word", "n", nMerges = 2, maxLocalSyms = 5L)
    val viaLocal = Bpe.learn(words, "word", "n", nMerges = 2)
    assert(viaDist == viaLocal)
  }

  test("rerun is deterministic and stops early when pairs run out") {
    val a = Bpe.learn(classicWords, "word", "n", nMerges = 5)
    val b = Bpe.learn(classicWords, "word", "n", nMerges = 5)
    assert(a == b)
    // a single 2-char word admits exactly one merge
    val tiny = Seq(("ab", 3L)).toDF("word", "n")
    val m = Bpe.learn(tiny, "word", "n", nMerges = 10)
    assert(m == Seq(Bpe.Merge(1, "a", "b", 3L)))
  }

  test("greedy apply consumes merged occurrences left to right") {
    // aaa with merge (a,a): first pair consumes positions 0-1, leaving a
    assert(Bpe.mergeOnce(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(Bpe.mergeOnce(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    // non-adjacent survives
    assert(Bpe.mergeOnce(Seq("a", "b", "a"), "a", "a") == Seq("a", "b", "a"))
  }

  test("encodeWord applies the learned table in rank order") {
    val merges = Bpe.learn(classicWords, "word", "n", nMerges = 5)
    assert(Bpe.encodeWord("newest", merges) == Seq("n", "ew", "est"))
    assert(Bpe.encodeWord("lowest", merges) == Seq("low", "est"))
    assert(Bpe.encodeWord("low", merges) == Seq("low"))
    // unseen symbols pass through untouched
    assert(Bpe.encodeWord("xyz", merges) == Seq("x", "y", "z"))
  }

  test("catalog lm_bpe_merges returns a full ranked merge table") {
    val df = graft.SparkEntry.queries("lm_bpe_merges")(spark, sf001)
    val rows = df.collect()
    assert(rows.length == 20)
    assert(rows.map(_.getLong(0)).toSeq == (1L to 20L))
    // counts are positive and the merge table is usable end-to-end
    assert(rows.forall(_.getLong(3) > 0))
  }

  test("catalog lm_bpe_encode is lossless: symbols re-concatenate to the text") {
    // subwords partition each word's characters, so subs_csv minus commas
    // must equal the document text minus spaces — the invariant that holds
    // for EVERY valid merge table and catches any dropped/duplicated symbol
    val enc = graft.SparkEntry.queries("lm_bpe_encode")(spark, sf001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val txt = graft.lake.Tables.documents(spark, sf001)
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(enc.nonEmpty && enc.keySet == txt.keySet)
    enc.foreach { case (id, (nWords, nSubs, csv)) =>
      val expected = txt(id).replace(" ", "")
      assert(csv.replace(",", "") == expected, s"doc $id")
      val subs = csv.split(",", -1)
      assert(subs.length.toLong == nSubs, s"doc $id n_subwords")
      // merges compress: never more symbols than characters, never fewer
      // than words
      assert(nSubs <= expected.length && nSubs >= nWords, s"doc $id bounds")
    }
  }
}
