package graft

import graft.ops.Bpe

/** BPE trainer: greedy-fold semantics, run parity, deterministic
  * tie-breaks, and the vocab-compaction weighting.
  */
class BpeSpec extends SparkSpec {

  private def vocabOf(rows: (String, Long)*) = {
    import spark.implicits._
    rows.toDF("word", "cnt")
  }

  test("textbook merge: most frequent pair wins, weighted by word count") {
    // "low" x5, "lower" x2 -> pairs: (l,o)=7 (o,w)=7 (w,e)=2 (e,r)=2
    // tie (l,o) vs (o,w) at 7 -> lexicographic: (l,o)
    val (merges, seg) = Bpe.train(spark, vocabOf("low" -> 5L, "lower" -> 2L), 1)
    assert(merges.map(m => (m.s1, m.s2, m.cnt)) == Seq(("l", "o", 7L)))
    val segd = seg.orderBy("word").collect()
      .map(r => r.getString(0) -> r.getSeq[String](2))
    assert(segd.toSeq == Seq("low" -> Seq("lo", "w"), "lower" -> Seq("lo", "w", "e", "r")))
    seg.unpersist()
  }

  test("run parity: aaaa merges to [aa, aa], aaaaa to [aa, aa, a]") {
    val (m1, seg) = Bpe.train(spark, vocabOf("aaaa" -> 1L, "aaaaa" -> 1L), 1)
    assert(m1.head.s1 == "a" && m1.head.s2 == "a" && m1.head.cnt == 7L)
    val segd = seg.orderBy("word").collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(segd("aaaa") == Seq("aa", "aa"))
    assert(segd("aaaaa") == Seq("aa", "aa", "a"))
    seg.unpersist()
  }

  test("merged head never re-merges within the round") {
    // winner (a,b) over "aab": fold must yield [a, ab], not [aab]
    val (_, seg) = Bpe.train(spark, vocabOf("aab" -> 3L, "ab" -> 1L), 1)
    val segd = seg.orderBy("word").collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(segd("aab") == Seq("a", "ab"))
    assert(segd("ab") == Seq("ab"))
    seg.unpersist()
  }

  test("early stop when the vocab is fully merged") {
    val (merges, seg) = Bpe.train(spark, vocabOf("ab" -> 1L), 5)
    assert(merges.map(m => (m.s1, m.s2)) == Seq(("a", "b")))
    seg.unpersist()
  }

  test("multi-round chain builds longer symbols deterministically") {
    val (merges, seg) =
      Bpe.train(spark, vocabOf("abab" -> 4L, "abc" -> 1L), 3)
    // r1: (a,b)=9 ; r2: (ab,ab)=4 ; r3: (ab,c)=1
    assert(merges.map(m => (m.s1, m.s2, m.cnt)) ==
      Seq(("a", "b", 9L), ("ab", "ab", 4L), ("ab", "c", 1L)))
    val segd = seg.orderBy("word").collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(segd("abab") == Seq("abab"))
    assert(segd("abc") == Seq("abc"))
    seg.unpersist()
  }

  test("wordVocab: one corpus shuffle, whitespace-robust, empties dropped") {
    import spark.implicits._
    val docs = Seq((1L, "  the the  cat "), (2L, "the")).toDF("doc_id", "text")
    val v = Bpe.wordVocab(docs, "text").orderBy("word").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(v.toSeq == Seq("cat" -> 1L, "the" -> 3L))
  }

  test("encodeCounts matches the per-word segment algebra") {
    import spark.implicits._
    val docs = Seq((1L, "low low lower"), (2L, "low")).toDF("doc_id", "text")
    val vocab = Bpe.wordVocab(docs, "text")
    val (_, seg) = Bpe.train(spark, vocab, 2)
    // r1 pairs: (l,o)=4 (o,w)=4 (w,e)=1 (e,r)=1 -> (l,o); r2: (lo,w)=4
    val enc = Bpe.encodeCounts(docs, seg, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc1: low->1 seg "low"? r2 merged (lo,w): low => [low]; lower => [low, e, r]
    assert(enc.toSeq == Seq((1L, 3L, 5L), (2L, 1L, 1L)))
    seg.unpersist()
  }
}
