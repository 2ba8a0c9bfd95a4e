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

  test("fitEM: expected counts match the hand-computed two-path " +
      "lattice posterior") {
    // corpus = one type "ab" (cnt 1); seed pieces {a, b, ab} with
    // equal weights -> model p = 1/3 each. Segmentations: [ab] with
    // mass 1/3, [a,b] with mass 1/9; Z = 4/9. Posterior: P([ab]) =
    // 3/4, P([a,b]) = 1/4 -> expected counts ab=0.75, a=b=0.25.
    val docs = Seq((0L, "ab")).toDF("doc_id", "text")
    val (_, table) = Unigram.fitEM(docs, "text", vocabSize = 3,
      maxPieceLen = 2, seedSize = 8, nIters = 1)
    val counts = table.collect()
      .map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(math.abs(counts("ab") - 0.75) < 1e-12, s"got $counts")
    assert(math.abs(counts("a") - 0.25) < 1e-12, s"got $counts")
    assert(math.abs(counts("b") - 0.25) < 1e-12, s"got $counts")
    // and the posterior concentrates across iterations: "ab" wins
    val (model2, _) = Unigram.fitEM(docs, "text", vocabSize = 3,
      maxPieceLen = 2, seedSize = 8, nIters = 5)
    assert(Unigram.segment("ab", model2).toSeq == Seq("ab"))
  }

  test("fitEM: single-path degenerate config yields EXACT char " +
      "counts; deterministic across runs") {
    val docs = Seq.tabulate(25)(i =>
      (i.toLong, "abc aabb c")).toDF("doc_id", "text")
    val (m1, t1) = Unigram.fitEM(docs, "text", vocabSize = 1,
      maxPieceLen = 1, seedSize = 8, nIters = 2)
    // per doc: a x3, b x3, c x2 -> over 25 docs: 75/75/50
    val counts = t1.collect()
      .map(r => r.getString(1) -> math.round(r.getDouble(2))).toMap
    assert(counts == Map("a" -> 75L, "b" -> 75L, "c" -> 50L), s"$counts")
    val (m2, t2) = Unigram.fitEM(docs, "text", vocabSize = 1,
      maxPieceLen = 1, seedSize = 8, nIters = 2)
    assert(m1.logp == m2.logp)
    assert(t1.collect().toSeq == t2.collect().toSeq)
  }

  test("fitEM pruneMode=loss: keeps the high-loss piece the count " +
      "prune would drop; identical to count prune when no shrink is " +
      "needed; deterministic") {
    // Hand-computable divergence (one EM round, maxPieceLen=2):
    // types "a"x50, "b"x50, "ab"x20, "cd"x4. Seed weights a=70, b=70,
    // ab=20, c=4, d=4, cd=4 (total 172). After one full-EM round the
    // expected counts are a=b~61.8, ab~8.24, cd~3.91, c=d~0.09 —
    // count prune at one multi keeps "ab" (8.24 > 3.91). But "ab"
    // decomposes into two HIGH-probability chars: loss(ab) =
    // 8.24*ln(p_ab/(p_a*p_b)) ~ -10 (negative: the piece is worse
    // than its decomposition), while "cd"'s chars are rare: loss(cd)
    // ~ 3.91*ln(p_cd/(p_c*p_d)) ~ +43 — so the loss prune keeps "cd".
    val docs = (Seq.fill(50)("a") ++ Seq.fill(50)("b") ++
      Seq.fill(20)("ab") ++ Seq.fill(4)("cd"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    def multis(m: Unigram.UnigramModel) =
      m.logp.keySet.filter(_.length > 1)
    val (byCount, _) = Unigram.fitEM(docs, "text", vocabSize = 5,
      maxPieceLen = 2, seedSize = 16, nIters = 1)
    assert(multis(byCount) == Set("ab"), s"count prune: ${byCount.logp.keySet}")
    val (byLoss, lossTable) = Unigram.fitEM(docs, "text", vocabSize = 5,
      maxPieceLen = 2, seedSize = 16, nIters = 1, pruneMode = "loss")
    assert(multis(byLoss) == Set("cd"), s"loss prune: ${byLoss.logp.keySet}")
    assert(Set("a", "b", "c", "d").subsetOf(byLoss.logp.keySet))
    // determinism
    val (byLoss2, lossTable2) = Unigram.fitEM(docs, "text", vocabSize = 5,
      maxPieceLen = 2, seedSize = 16, nIters = 1, pruneMode = "loss")
    assert(byLoss.logp == byLoss2.logp)
    assert(lossTable.collect().toSeq == lossTable2.collect().toSeq)
    // budget >= seed vocab: no shrink runs, loss == count exactly
    val (mc, tc) = Unigram.fitEM(docs, "text", vocabSize = 6,
      maxPieceLen = 2, seedSize = 16, nIters = 1)
    val (ml, tl) = Unigram.fitEM(docs, "text", vocabSize = 6,
      maxPieceLen = 2, seedSize = 16, nIters = 1, pruneMode = "loss")
    assert(mc.logp == ml.logp)
    assert(tc.collect().toSeq == tl.collect().toSeq)
  }

  test("fitEM discovers the dominant piece and keeps the char floor " +
      "under a tight budget") {
    val docs = Seq.tabulate(40)(i =>
      (i.toLong, "abab ababab zq abab")).toDF("doc_id", "text")
    val (model, _) = Unigram.fitEM(docs, "text", vocabSize = 8,
      maxPieceLen = 4, seedSize = 64, nIters = 3)
    val pieces = model.logp.keySet
    assert(pieces.exists(p => p.length > 1 && p.contains("ab")),
      s"no ab-piece learned in $pieces")
    assert(Set("a", "b", "z", "q").subsetOf(pieces), s"chars lost: $pieces")
  }

  test("sampleSegment: single-path lattice is returned regardless of " +
      "seed; high alpha concentrates on Viterbi; deterministic per seed") {
    val charOnly = m("a" -> 0.5, "b" -> 0.5)
    for (seed <- 0L to 20L)
      assert(Unigram.sampleSegment("abba", charOnly, 0.5, seed).toSeq ==
        Seq("a", "b", "b", "a"))
    val model = m("a" -> 0.4, "b" -> 0.4, "ab" -> 0.2)
    // P([ab])^alpha dominates at alpha = 50: .2^50 vs .16^50
    val hi = (0L until 200L).count(s =>
      Unigram.sampleSegment("ab", model, 50.0, s).toSeq == Seq("ab"))
    assert(hi == 200, s"high-alpha sampler strayed from Viterbi: $hi/200")
    val one = Unigram.sampleSegment("abab", model, 0.7, 99L).toSeq
    assert(Unigram.sampleSegment("abab", model, 0.7, 99L).toSeq == one)
  }

  test("sampleSegment: empirical segmentation frequency tracks the " +
      "lattice posterior at alpha = 1") {
    // P([ab]) = .2 / (.2 + .16) = 5/9 = 0.5556
    val model = m("a" -> 0.4, "b" -> 0.4, "ab" -> 0.2)
    val n = 4000
    val hits = (0 until n).count(s =>
      Unigram.sampleSegment("ab", model, 1.0, s.toLong * 7919L)
        .toSeq == Seq("ab"))
    val freq = hits.toDouble / n
    assert(math.abs(freq - 5.0 / 9.0) < 0.03,
      f"freq $freq%.4f vs posterior ${5.0 / 9.0}%.4f")
  }

  test("sampleCounts: per-occurrence draws are deterministic, " +
      "bounded by words <= pieces <= chars, and VARY across " +
      "occurrences (the regularizer)") {
    val docs = Seq.tabulate(20)(i =>
      (i.toLong, "ab ab ab ab ab")).toDF("doc_id", "text")
    // handcrafted near-flat model: P([ab]) = .2/(.2+.16) = 5/9 per
    // occurrence at alpha = 1 — a fitted model on this corpus would
    // concentrate on one piece and every draw would agree
    val model = m("a" -> 0.4, "b" -> 0.4, "ab" -> 0.2)
    val a = Unigram.sampleCounts(docs, "doc_id", "text", model,
      alpha = 1.0, seed = 1L).orderBy("doc_id").collect()
    val b = Unigram.sampleCounts(docs, "doc_id", "text", model,
      alpha = 1.0, seed = 1L).orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
    a.foreach { r =>
      assert(r.getLong(1) == 5L)
      assert(r.getLong(2) >= 5L && r.getLong(2) <= 10L)
    }
    // across 20 docs x 5 occurrences of the same word at a flat
    // alpha, at least two different per-doc totals must appear —
    // identical totals everywhere would mean the occurrence seed
    // collapsed (the dictionary-join failure mode this surface
    // deliberately avoids)
    assert(a.map(_.getLong(2)).distinct.length > 1,
      "sampled totals identical across all docs")
    // a different top-level seed draws a different stream
    val c = Unigram.sampleCounts(docs, "doc_id", "text", model,
      alpha = 1.0, seed = 2L).orderBy("doc_id").collect()
    assert(a.map(_.getLong(2)).toSeq != c.map(_.getLong(2)).toSeq)
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

  test("save -> load round trip: bit-identical log-probs and " +
      "unkLogp, identical segmentation") {
    val docs = Seq.tabulate(40)(i =>
      (i.toLong, "abab ababab zq abab")).toDF("doc_id", "text")
    val (model, _) = Unigram.fit(docs, "text", vocabSize = 8,
      maxPieceLen = 4, seedSize = 64, nIters = 3)
    val path = java.nio.file.Files
      .createTempDirectory("unigram_model").toString
    Unigram.save(spark, model, path)
    val loaded = Unigram.load(spark, path)
    assert(loaded.logp == model.logp) // doubles round-trip exactly
    assert(loaded.unkLogp == model.unkLogp)
    assert(Unigram.segment("abababzq", loaded).toSeq ==
      Unigram.segment("abababzq", model).toSeq)
  }
}
