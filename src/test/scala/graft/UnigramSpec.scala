package graft

import graft.llmdata.Unigram
import graft.llmdata.Unigram.UnigramModel
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer (Kudo 2018): Viterbi lattice against
  * hand-computed segmentations, fit properties (piece discovery,
  * determinism, char floor), and the serving contract.
  */
class UnigramSpec extends SparkSuite {
  import spark.implicits._

  private def m(ps: (String, Double)*): UnigramModel =
    UnigramModel(ps.toMap.map { case (k, v) => k -> math.log(v) })

  test("Viterbi picks the higher-probability segmentation " +
      "(hand-computed lattice)") {
    val model = m("a" -> 0.4, "b" -> 0.4, "ab" -> 0.2)
    // log .2 = -1.609 beats log .4 + log .4 = -1.833
    assert(Unigram.segment("ab", model).toSeq == Seq("ab"))
    // dp: best("aab") = a + ab (-0.916 - 1.609) over a+a+b / aa? (absent)
    assert(Unigram.segment("aab", model).toSeq == Seq("a", "ab"))
    val charFav = m("a" -> 0.45, "b" -> 0.45, "ab" -> 0.1)
    // log .45*.45 = -1.597 beats log .1 = -2.303
    assert(Unigram.segment("ab", charFav).toSeq == Seq("a", "b"))
  }

  test("Viterbi: unknown characters fall back to single unk pieces; " +
      "empty token segments to nothing") {
    val model = m("a" -> 0.5, "b" -> 0.5)
    assert(Unigram.segment("axb", model).toSeq == Seq("a", "x", "b"))
    assert(Unigram.segment("", model).isEmpty)
  }

  test("fit discovers a dominant piece, is deterministic, and keeps " +
      "every seen character") {
    val docs = Seq.tabulate(40)(i =>
      (i.toLong, "abab ababab zq abab")).toDF("doc_id", "text")
    val (model, table) = Unigram.fit(docs, "text", vocabSize = 8,
      maxPieceLen = 4, seedSize = 64, nIters = 3)
    val pieces = model.logp.keySet
    assert(pieces.exists(p => p.length > 1 && p.contains("ab")),
      s"no ab-piece learned in $pieces")
    // chars survive pruning even at a tight budget
    assert(Set("a", "b", "z", "q").subsetOf(pieces), s"chars lost: $pieces")
    val (m2, t2) = Unigram.fit(docs, "text", vocabSize = 8,
      maxPieceLen = 4, seedSize = 64, nIters = 3)
    assert(m2.logp == model.logp)
    assert(t2.collect().toSeq == table.collect().toSeq)
    // audit table is ranked by (count desc, piece asc), rank 0..n-1
    val rows = table.orderBy("rank").collect()
    assert(rows.map(_.getInt(0)).toSeq == rows.indices)
    val counts = rows.map(_.getLong(2))
    assert(counts.zip(counts.tail).forall { case (x, y) => x >= y })
  }

  test("learned vocab reduces fertility versus the char-only " +
      "degenerate config; encode satisfies words <= pieces <= chars") {
    val docs = Seq.tabulate(30)(i =>
      (i.toLong, "the theory theme then the")).toDF("doc_id", "text")
    val (learned, _) = Unigram.fit(docs, "text", vocabSize = 12,
      maxPieceLen = 5, seedSize = 128, nIters = 3)
    val (charsOnly, _) = Unigram.fit(docs, "text", vocabSize = 1,
      maxPieceLen = 5, seedSize = 128, nIters = 1)
    assert(charsOnly.logp.keysIterator.forall(_.length == 1))
    val l = Unigram.encodeCounts(docs, "doc_id", "text", learned)
      .agg(sum("n_pieces")).head().getLong(0)
    val c = Unigram.encodeCounts(docs, "doc_id", "text", charsOnly)
      .agg(sum("n_pieces")).head().getLong(0)
    assert(l < c, s"learned fertility $l not below char fertility $c")
    val rows = Unigram.encodeCounts(docs, "doc_id", "text", learned)
      .collect()
    // "the theory theme then the" -> 5 words, 21 chars
    rows.foreach { r =>
      assert(r.getLong(1) == 5L)
      assert(r.getLong(2) >= 5L && r.getLong(2) <= 21L)
    }
  }

  test("bounded-type fit degrades deterministically: top types by " +
      "(cnt desc, token asc) under maxDriverTypes") {
    val docs = Seq.tabulate(20)(i =>
      (i.toLong, if (i < 15) "aaaa bbbb" else "cccc dddd eeee"))
      .toDF("doc_id", "text")
    // budget 2 keeps only aaaa/bbbb (cnt 15) — c/d/e never seen
    val (model, _) = Unigram.fit(docs, "text", vocabSize = 6,
      maxPieceLen = 4, seedSize = 32, nIters = 2, maxDriverTypes = 2)
    assert(!model.logp.keySet.exists(p =>
      p.contains("c") || p.contains("d") || p.contains("e")))
    assert(model.logp.keySet.exists(_.contains("a")))
  }
}
