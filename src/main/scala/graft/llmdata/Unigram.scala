package graft.llmdata

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-language-model tokenizer (Kudo 2018, "Subword
  * Regularization: Improving Neural Network Translation Models with
  * Multiple Subword Candidates" — the SentencePiece unigram
  * algorithm), the second half of the tokenizer family next to
  * [[Bpe]]: where BPE grows a vocabulary bottom-up by merge rules,
  * the unigram model starts from a large seed of candidate pieces
  * and PRUNES toward the budget, scoring segmentations by piece
  * log-probabilities (Viterbi).
  *
  * This is the hard-EM (Viterbi-count) variant: each E-step assigns
  * every word type its single best segmentation under the current
  * piece probabilities; the M-step re-estimates probabilities from
  * those counts. Deterministic by construction — ties in the
  * Viterbi lattice break toward the longer final piece, seed and
  * prune orders are (weight desc, piece asc) — so the fitted
  * vocabulary is a pure function of the corpus.
  *
  * Scale shape (the [[Bpe.fit]] venue contract): the corpus is
  * scanned ONCE into the word-type census (distributed; the same
  * tokenize+explode+groupBy shuffle as every census operator here).
  * Everything after is vocabulary-sized: the type table collects
  * under an explicit budget — `maxDriverTypes` rows, top by (cnt
  * desc, token asc) so an over-budget corpus degrades to a
  * DETERMINISTIC bounded-sample fit (the PQ/Lloyd contract) rather
  * than an error — and the EM loop runs in memory, which is how the
  * reference SentencePiece trainer works too (it is a single-node
  * program over the type table). Serving ([[encodeCounts]]) is the
  * [[Bpe.encodeCounts]] dictionary trick: distinct tokens Viterbi-
  * decode once against the broadcast vocabulary, then join back to
  * the occurrence stream.
  */
object Unigram {

  /** A fitted unigram model: piece -> log-probability. Always
    * contains every single character seen at fit time (coverage
    * floor), so any token over the fit alphabet is encodable;
    * unseen characters fall back to one piece per char at
    * `unkLogp`.
    */
  case class UnigramModel(logp: Map[String, Double],
      unkLogp: Double = -20.0) {
    lazy val maxPieceLen: Int =
      if (logp.isEmpty) 1 else logp.keysIterator.map(_.length).max
  }

  /** Viterbi best segmentation of one token under the model: maximize
    * the sum of piece log-probs; ties break toward the longer final
    * piece (the last candidate written wins, lengths iterate
    * ascending). Characters absent from the vocabulary segment as
    * single-char pieces at `unkLogp`.
    */
  private[graft] def segment(tok: String,
      model: UnigramModel): Array[String] = {
    val n = tok.length
    if (n == 0) return Array.empty
    val maxLen = math.max(1, model.maxPieceLen)
    val score = new Array[Double](n + 1)
    val back = new Array[Int](n + 1)
    var j = 1
    while (j <= n) {
      score(j) = Double.NegativeInfinity
      var len = 1
      val lim = math.min(maxLen, j)
      while (len <= lim) {
        val piece = tok.substring(j - len, j)
        val lp = model.logp.get(piece) match {
          case Some(p) => p
          case None => if (len == 1) model.unkLogp
            else Double.NegativeInfinity
        }
        if (lp != Double.NegativeInfinity) {
          val cand = score(j - len) + lp
          if (cand >= score(j)) { score(j) = cand; back(j) = len }
        }
        len += 1
      }
      j += 1
    }
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var p = n
    while (p > 0) {
      out += tok.substring(p - back(p), p)
      p -= back(p)
    }
    out.reverseIterator.toArray
  }

  /** Word-type census `(token, cnt)` — the single corpus scan. */
  private def typeTable(df: DataFrame, text: String): DataFrame =
    df.where(col(text).isNotNull)
      .select(explode(Dedup.normalizeTokens(col(text))).as("__tok"))
      .groupBy(col("__tok")).agg(count(lit(1)).as("__cnt"))

  /** Fit a unigram vocabulary of (at most) `vocabSize` pieces:
    * seed with every single character plus the `seedSize` most
    * frequent substrings up to `maxPieceLen`, run `nIters` hard-EM
    * rounds, prune to the budget by Viterbi-count. Returns the model
    * and the audit table `(rank, piece, count, logp)` (rank 0 = most
    * used piece, single chars always retained).
    */
  def fit(df: DataFrame, text: String, vocabSize: Int,
      maxPieceLen: Int = 6, seedSize: Int = 1 << 14, nIters: Int = 3,
      maxDriverTypes: Int = 1 << 20): (UnigramModel, DataFrame) = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    val spark = df.sparkSession
    // bounded deterministic collect: top types by (cnt desc, tok asc)
    val types = typeTable(df, text)
      .orderBy(desc("__cnt"), asc("__tok"))
      .limit(maxDriverTypes)
      .collect().map(r =>
        (r.getAs[String]("__tok"), r.getAs[Long]("__cnt")))

    // ---- seed: substring census, all chars + top multi-char pieces
    val subW = scala.collection.mutable.HashMap[String, Long]()
    for ((t, c) <- types; i <- 0 until t.length;
         len <- 1 to math.min(maxPieceLen, t.length - i)) {
      val p = t.substring(i, i + len)
      subW(p) = subW.getOrElse(p, 0L) + c
    }
    val chars = subW.keysIterator.filter(_.length == 1).toArray.sorted
    val multis = subW.iterator.filter(_._1.length > 1).toArray
      .sortBy { case (p, w) => (-w, p) }
      .take(math.max(0, seedSize - chars.length)).map(_._1)
    var counts: Map[String, Long] =
      (chars ++ multis).iterator.map(p => p -> subW(p)).toMap

    // ---- hard-EM rounds: Viterbi counts -> re-normalized log-probs
    def toModel(cs: Map[String, Long]): UnigramModel = {
      val total = cs.valuesIterator.sum.toDouble
      UnigramModel(cs.map { case (p, c) =>
        p -> math.log(c / total) })
    }
    var it = 0
    while (it < nIters) {
      val model = toModel(counts)
      val next = scala.collection.mutable.HashMap[String, Long]()
      for ((t, c) <- types; piece <- segment(t, model))
        next(piece) = next.getOrElse(piece, 0L) + c
      // coverage floor: every seen character survives with count >= 1
      for (ch <- chars)
        next(ch) = math.max(next.getOrElse(ch, 0L), 1L)
      counts = next.toMap
      it += 1
    }

    // ---- prune to the budget: chars always kept, multis by count
    val keptMultis = counts.iterator
      .filter { case (p, _) => p.length > 1 }
      .toArray.sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, vocabSize - chars.length))
    val kept = chars.map(c => c -> counts(c)) ++ keptMultis
    val model = toModel(kept.toMap)

    import spark.implicits._
    val table = kept.sortBy { case (p, c) => (-c, p) }.zipWithIndex
      .map { case ((p, c), i) => (i, p, c, model.logp(p)) }.toSeq
      .toDF("rank", "piece", "count", "logp")
    (model, table)
  }

  /** Per-document piece counts against a fitted model:
    * (id, n_words, n_pieces) — the fertility surface shared with
    * [[Bpe.encodeCounts]]. Dictionary-join serving: distinct tokens
    * Viterbi-decode once against the broadcast vocabulary, joined
    * back to the occurrence stream.
    */
  def encodeCounts(df: DataFrame, id: String, text: String,
      model: UnigramModel): DataFrame = {
    val spark = df.sparkSession
    val mB = spark.sparkContext.broadcast(model)
    val nPieces = udf { (tok: String) => segment(tok, mB.value).length }
    val toks = df.where(col(text).isNotNull)
      .select(col(id), explode(Dedup.normalizeTokens(col(text)))
        .as("__tok"))
    val dict = toks.select(col("__tok")).distinct()
      .withColumn("__n", nPieces(col("__tok")))
    toks.join(broadcast(dict), Seq("__tok"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_words"), sum(col("__n")).as("n_pieces"))
  }
}
