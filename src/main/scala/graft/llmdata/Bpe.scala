package graft.llmdata

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer learning and serving (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword
  * Units") as a distributed pipeline — the vocabulary-construction
  * step of an LLM training-data pipeline, and the missing half of the
  * token-counting family (`TextAnalysis.tokenStats` counts
  * whitespace/BPE-ish regex tokens; this LEARNS the subword merges
  * from the corpus).
  *
  * Scale shape — the reason this is cheap at 100 TB:
  *
  *   - The corpus is scanned ONCE, into the word-TYPE table
  *     `(token, cnt)` (one tokenize+explode+groupBy shuffle over a
  *     short string key — the same census shape as every dedup
  *     operator here). Classic BPE learning is defined over word
  *     types weighted by frequency, so every subsequent merge round
  *     touches only the type table (|vocabulary| rows, millions at
  *     worst), never the corpus again.
  *   - Each merge round is two small jobs over the type table:
  *     a weighted pair census (explode adjacent symbol pairs,
  *     sum(cnt)) and a one-row argmax to the driver; then the merge
  *     is applied with a tight-loop UDF. Rounds are bounded by
  *     `nMerges` (the vocabulary budget), so the driver loop is
  *     O(nMerges) jobs by construction — the
  *     [[Dedup.duplicateClusters]] lifecycle pattern (persist next,
  *     materialize, unpersist previous) keeps the plan flat.
  *   - Serving ([[encodeCounts]]) never re-encodes repeated tokens:
  *     the distinct tokens of the frame are encoded once (a
  *     vocabulary-sized job) and joined back to the occurrence
  *     stream — the dictionary trick that turns per-occurrence
  *     subword work into per-TYPE work.
  *
  * Symbols are the characters of [[Dedup.normalizeTokens]] output;
  * merges never cross token boundaries (GPT-2-style pre-split by
  * whitespace, no end-of-word marker — documented contract, pinned by
  * the reference-implementation spec).
  *
  * Determinism: the merge argmax breaks count ties by
  * (sym_l, sym_r) ascending, so the fitted merge list is a pure
  * function of the corpus on any engine; the round-1 pair census is
  * DuckDB-expressible and oracle-checked (q126).
  */
object Bpe {

  /** A fitted BPE model: merges in learned order (rank 0 first). */
  case class BpeModel(merges: Seq[(String, String)]) {
    /** rank lookup used by the greedy encoder */
    lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap
  }

  /** Greedy BPE encode of one token against a rank table: repeatedly
    * merge the lowest-rank adjacent pair (left-to-right,
    * non-overlapping within a pass) until no mergeable pair remains.
    * Standard serving-side algorithm; tight loop, no per-element
    * expression evaluation.
    */
  private[graft] def encodeToken(tok: String,
      ranks: Map[(String, String), Int]): Array[String] = {
    if (tok.isEmpty) return Array.empty
    var syms = tok.map(_.toString).toArray
    var done = false
    while (!done && syms.length >= 2) {
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else syms = mergePass(syms, best, ranks)
    }
    syms
  }

  /** BPE-DROPOUT encode (Provilkov et al. 2020, "BPE-Dropout: Simple
    * and Effective Subword Regularization"): identical pass structure
    * to [[encodeToken]], but each adjacent position draws a fresh
    * Bernoulli(p) DROP decision every pass — dropped positions are
    * invisible to both the best-rank search and the merge pass, so
    * skipped merges produce longer, varied segmentations (the
    * regularizer). p = 0 is bit-identical to [[encodeToken]] (same
    * passes, nothing dropped — spec-pinned); p = 1 drops every merge
    * and yields pure characters (the oracle twin). Draws come from
    * the same splitmix64 stream as [[Unigram.sampleSegment]] —
    * specified arithmetic, not JDK Random — so a (token, seed) pair
    * encodes identically anywhere, forever.
    */
  private[graft] def encodeTokenDropout(tok: String,
      ranks: Map[(String, String), Int], p: Double,
      seed: Long): Array[String] = {
    require(p >= 0.0 && p <= 1.0, s"dropout p must be in [0,1], got $p")
    if (p <= 0.0) return encodeToken(tok, ranks)
    if (tok.isEmpty) return Array.empty
    var syms = tok.map(_.toString).toArray
    var state = seed
    def nextUnit(): Double = {
      state += 0x9e3779b97f4a7c15L
      var x = state
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x = x ^ (x >>> 31)
      (x >>> 11).toDouble / (1L << 53).toDouble
    }
    var done = false
    while (!done && syms.length >= 2) {
      val keep = Array.fill(syms.length - 1)(nextUnit() >= p)
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        if (keep(i)) {
          val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
          if (r < best) best = r
        }
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val out = scala.collection.mutable.ArrayBuffer[String]()
        i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && keep(i) &&
              ranks.getOrElse((syms(i), syms(i + 1)),
                Int.MaxValue) == best) {
            out += syms(i) + syms(i + 1)
            i += 2
          } else {
            out += syms(i)
            i += 1
          }
        }
        syms = out.toArray
      }
    }
    syms
  }

  /** Per-document BPE-dropout token counts — the training-time
    * serving surface: every token OCCURRENCE draws its own encode
    * (the same word varies across occurrences, like
    * [[Unigram.sampleCounts]]), so there is deliberately no
    * dictionary join. Per-occurrence seeds are
    * `xxhash64(id, position, seed)` computed IN the plan, so results
    * are deterministic under any partitioning and replay.
    */
  def dropoutCounts(df: DataFrame, id: String, text: String,
      model: BpeModel, p: Double, seed: Long): DataFrame = {
    val spark = df.sparkSession
    val ranksB = spark.sparkContext.broadcast(model.ranks)
    val nSub = udf { (tok: String, s: Long) =>
      encodeTokenDropout(tok, ranksB.value, p, s).length
    }
    df.where(col(text).isNotNull)
      .select(col(id), posexplode(Dedup.normalizeTokens(col(text)))
        .as(Seq("__pos", "__tok")))
      .withColumn("__seed", xxhash64(col(id), col("__pos"), lit(seed)))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_words"),
        sum(nSub(col("__tok"), col("__seed")).cast("long")).as("n_bpe"))
  }

  /** One left-to-right non-overlapping merge pass of the pair whose
    * rank equals `rank`.
    */
  private def mergePass(syms: Array[String], rank: Int,
      ranks: Map[(String, String), Int]): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 &&
          ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue) == rank) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Word-type table `(token, cnt)` — the single corpus scan. */
  private def typeTable(df: DataFrame, text: String): DataFrame =
    df.where(col(text).isNotNull)
      .select(explode(Dedup.normalizeTokens(col(text))).as("__tok"))
      .groupBy(col("__tok")).agg(count(lit(1)).as("__cnt"))

  /** Weighted adjacent-pair census over a symbol-sequence table
    * `(syms: array<string>, cnt)`: one row per (sym_l, sym_r) with the
    * total number of adjacent occurrences across all token
    * occurrences (overlapping positions count, as in the reference
    * algorithm: "aaa" contributes (a,a) twice).
    */
  private val pairsUdf = udf { (syms: Seq[String]) =>
    if (syms == null || syms.length < 2) Seq.empty[Seq[String]]
    else {
      val out = new Array[Seq[String]](syms.length - 1)
      var i = 0
      while (i < syms.length - 1) {
        out(i) = Seq(syms(i), syms(i + 1))
        i += 1
      }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
    }
  }

  private def pairCensus(types: DataFrame): DataFrame =
    types.select(col("__cnt"),
        explode(pairsUdf(col("__syms"))).as("__p"))
      .groupBy(col("__p").getItem(0).as("sym_l"),
        col("__p").getItem(1).as("sym_r"))
      .agg(sum(col("__cnt")).as("pair_count"))

  /** Round-1 adjacent-pair statistics over the corpus — the
    * oracle-checkable stage of BPE learning (exact counts, exact
    * deterministic order). Computed from the word-type table so the
    * pair explosion is vocabulary-sized, not corpus-sized.
    *
    * Output: (sym_l, sym_r, pair_count).
    */
  def pairStats(df: DataFrame, text: String): DataFrame = {
    val chars = udf { (t: String) => t.map(_.toString) }
    pairCensus(typeTable(df, text)
      .select(chars(col("__tok")).as("__syms"), col("__cnt")))
  }

  /** Learn `nMerges` BPE merges from the corpus. Stops early when no
    * adjacent pair reaches `minPairCount`. Returns the model plus the
    * merge table `(rank, sym_l, sym_r, merged, pair_count)` for
    * auditing (rank 0 = first merge).
    *
    * Loop venue: the corpus-sized work — the word-type census — is
    * always distributed. The merge rounds touch only the type table,
    * and when it fits a documented driver budget (`maxDriverTypes`
    * types; the counts make it exact regardless of venue) the loop
    * runs in memory on the driver — one collect of
    * (token, cnt), then nMerges tight in-memory rounds. This is the
    * standard shape of every production BPE learner (the type table
    * IS the tokenizer's working set), and it matters here because a
    * DataFrame round costs seconds of plan-compile + codegen per
    * merge regardless of data size — measured 52s for 16 merges over
    * a 31-type corpus vs <0.1s in memory. Corpora whose type table
    * exceeds the budget take the distributed rounds, where per-round
    * planning is noise against the data; both venues compute the
    * identical argmax (max weighted count, ties by pair ascending)
    * and BpeSpec pins them equal.
    */
  def fit(df: DataFrame, text: String, nMerges: Int,
      minPairCount: Long = 2L,
      maxDriverTypes: Int = 1 << 20): (BpeModel, DataFrame) = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val spark = df.sparkSession
    val types0 = typeTable(df, text)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nTypes = types0.count()
    val merges =
      if (nTypes <= maxDriverTypes) {
        val collected = types0.collect().map(r =>
          (r.getAs[String]("__tok"), r.getAs[Long]("__cnt")))
        types0.unpersist(blocking = false)
        fitDriver(collected, nMerges, minPairCount)
      } else {
        val m = fitDistributed(types0, nMerges, minPairCount)
        types0.unpersist(blocking = false)
        m
      }
    import spark.implicits._
    val table = merges.zipWithIndex
      .map { case ((l, rr, c), i) => (i, l, rr, l + rr, c) }
      .toDF("rank", "sym_l", "sym_r", "merged", "pair_count")
    (BpeModel(merges.map { case (l, rr, _) => (l, rr) }), table)
  }

  /** In-memory merge loop over the collected type table (bounded by
    * `maxDriverTypes`), with INCREMENTAL pair-count maintenance: the
    * adjacent-pair census and a (count desc, pair asc)-ordered index
    * are built once, then each merge round touches only the types
    * that actually contain the merged pair — decrement their old
    * pairs, rewrite, increment their new pairs — instead of
    * re-counting every symbol of every type. Production vocabularies
    * (tens of thousands of merges) make the difference: a full
    * recount is O(nMerges x total symbols); the incremental rounds
    * are O(affected symbols x log |pairs|), and the argmax is the
    * head of the ordered index. All arithmetic is exact long
    * increments/decrements of the same census, so the merge sequence
    * is bit-identical to the recount loop ([[fitDriverRecount]], the
    * definition-of-record twin BpeSpec pins equal).
    */
  private[graft] def fitDriver(types: Array[(String, Long)],
      nMerges: Int, minPairCount: Long): Seq[(String, String, Long)] = {
    val syms: Array[Array[String]] =
      types.map { case (t, _) => t.map(_.toString).toArray }
    val cnts: Array[Long] = types.map(_._2)

    val census = scala.collection.mutable.HashMap[(String, String), Long]()
    // ordered view of the census: head = current argmax (max count,
    // ties by (sym_l, sym_r) ascending). Kept in lockstep with census.
    val ord = new java.util.TreeSet[(Long, String, String)](
      new java.util.Comparator[(Long, String, String)] {
        def compare(a: (Long, String, String),
            b: (Long, String, String)): Int = {
          val c = java.lang.Long.compare(b._1, a._1) // count desc
          if (c != 0) c
          else {
            val l = a._2.compareTo(b._2)              // sym_l asc
            if (l != 0) l else a._3.compareTo(b._3)   // sym_r asc
          }
        }
      })
    // which type indices (may be stale) contain a given pair
    val where = scala.collection.mutable.HashMap[(String, String),
      scala.collection.mutable.ArrayBuffer[Int]]()

    def bump(k: (String, String), delta: Long, idx: Int): Unit = {
      val old = census.getOrElse(k, 0L)
      if (old != 0L) ord.remove((old, k._1, k._2))
      val nw = old + delta
      if (nw == 0L) census.remove(k)
      else { census(k) = nw; ord.add((nw, k._1, k._2)) }
      if (delta > 0 && idx >= 0)
        where.getOrElseUpdate(k,
          scala.collection.mutable.ArrayBuffer[Int]()) += idx
    }

    var i = 0
    while (i < syms.length) {
      val s = syms(i); val c = cnts(i)
      var j = 0
      while (j < s.length - 1) {
        bump((s(j), s(j + 1)), c, i)
        j += 1
      }
      i += 1
    }

    val merges = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    var stop = false
    while (merges.size < nMerges && !stop) {
      if (ord.isEmpty) stop = true
      else {
        val head = ord.first()
        if (head._1 < minPairCount) stop = true
        else {
          val (l, r) = (head._2, head._3)
          merges += ((l, r, head._1))
          val touched = where.remove((l, r))
            .getOrElse(scala.collection.mutable.ArrayBuffer[Int]())
          // an index can hold duplicates and stale entries; the
          // contains-check below makes both harmless
          val seen = new java.util.HashSet[Integer]()
          var t = 0
          while (t < touched.length) {
            val idx = touched(t)
            if (seen.add(idx)) {
              val s = syms(idx)
              var has = false
              var j = 0
              while (!has && j < s.length - 1) {
                if (s(j) == l && s(j + 1) == r) has = true
                j += 1
              }
              if (has) {
                val c = cnts(idx)
                var j2 = 0
                while (j2 < s.length - 1) {
                  bump((s(j2), s(j2 + 1)), -c, -1)
                  j2 += 1
                }
                val out = scala.collection.mutable.ArrayBuffer[String]()
                var p = 0
                while (p < s.length) {
                  if (p < s.length - 1 && s(p) == l && s(p + 1) == r) {
                    out += l + r; p += 2
                  } else { out += s(p); p += 1 }
                }
                val ns = out.toArray
                syms(idx) = ns
                var j3 = 0
                while (j3 < ns.length - 1) {
                  bump((ns(j3), ns(j3 + 1)), c, idx)
                  j3 += 1
                }
              }
            }
            t += 1
          }
        }
      }
    }
    merges.toSeq
  }

  /** Full-recount merge loop — the definition-of-record twin of
    * [[fitDriver]]: rebuilds the whole pair census every round. Kept
    * for the equality spec (BpeSpec pins the two loops' merge tables
    * identical); [[fit]] always runs the incremental loop.
    */
  private[graft] def fitDriverRecount(types: Array[(String, Long)],
      nMerges: Int, minPairCount: Long): Seq[(String, String, Long)] = {
    var syms: Array[Array[String]] =
      types.map { case (t, _) => t.map(_.toString).toArray }
    val cnts: Array[Long] = types.map(_._2)
    val merges = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    var stop = false
    while (merges.size < nMerges && !stop) {
      val census = scala.collection.mutable.HashMap[(String, String), Long]()
      var i = 0
      while (i < syms.length) {
        val s = syms(i); val c = cnts(i)
        var j = 0
        while (j < s.length - 1) {
          val k = (s(j), s(j + 1))
          census(k) = census.getOrElse(k, 0L) + c
          j += 1
        }
        i += 1
      }
      if (census.isEmpty) stop = true
      else {
        // deterministic argmax: max count, ties by (sym_l, sym_r) asc
        var best: ((String, String), Long) = null
        census.foreach { e =>
          if (best == null || e._2 > best._2 ||
              (e._2 == best._2 &&
                (e._1._1 < best._1._1 ||
                  (e._1._1 == best._1._1 && e._1._2 < best._1._2))))
            best = e
        }
        if (best._2 < minPairCount) stop = true
        else {
          val (l, r) = best._1
          merges += ((l, r, best._2))
          var i2 = 0
          while (i2 < syms.length) {
            val s = syms(i2)
            var has = false
            var j = 0
            while (!has && j < s.length - 1) {
              if (s(j) == l && s(j + 1) == r) has = true
              j += 1
            }
            if (has) {
              val out = scala.collection.mutable.ArrayBuffer[String]()
              var p = 0
              while (p < s.length) {
                if (p < s.length - 1 && s(p) == l && s(p + 1) == r) {
                  out += l + r; p += 2
                } else { out += s(p); p += 1 }
              }
              syms(i2) = out.toArray
            }
            i2 += 1
          }
        }
      }
    }
    merges.toSeq
  }

  /** Distributed merge rounds for type tables past the driver budget
    * (each round: weighted pair census + one-row argmax + merge UDF;
    * the [[Dedup.duplicateClusters]] persist/materialize/unpersist
    * lifecycle keeps the plan flat).
    */
  private def fitDistributed(typesIn: DataFrame, nMerges: Int,
      minPairCount: Long): Seq[(String, String, Long)] = {
    val chars = udf { (t: String) => t.map(_.toString) }
    var types = typesIn
      .select(chars(col("__tok")).as("__syms"), col("__cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    types.count()
    val merges = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    var stop = false
    var r = 0
    while (r < nMerges && !stop) {
      val best = pairCensus(types)
        .orderBy(desc("pair_count"), asc("sym_l"), asc("sym_r"))
        .head(1)
      if (best.isEmpty || best(0).getAs[Long]("pair_count") < minPairCount)
        stop = true
      else {
        val (l, rr, c) = (best(0).getAs[String]("sym_l"),
          best(0).getAs[String]("sym_r"),
          best(0).getAs[Long]("pair_count"))
        merges += ((l, rr, c))
        val applyMerge = udf { (syms: Seq[String]) =>
          val out = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == rr) {
              out += l + rr; i += 2
            } else { out += syms(i); i += 1 }
          }
          out.toSeq
        }
        val next = types
          .select(applyMerge(col("__syms")).as("__syms"), col("__cnt"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        next.count() // materialize before dropping the parent lineage
        types.unpersist(blocking = false)
        types = next
      }
      r += 1
    }
    types.unpersist(blocking = false)
    merges.toSeq
  }

  /** Per-document BPE token counts against a fitted model:
    * (id, n_words, n_bpe) — n_bpe/n_words is the fertility the
    * pipeline monitors when choosing a vocabulary budget.
    *
    * Dictionary-join serving: the frame's DISTINCT tokens are encoded
    * once (vocabulary-sized job, broadcast rank map in a tight loop)
    * and joined back to the occurrence stream, so repeated tokens —
    * virtually all of a natural corpus — cost one lookup, not one
    * encode. Unseen-at-fit tokens encode fine (worst case: one symbol
    * per character).
    */
  def encodeCounts(df: DataFrame, id: String, text: String,
      model: BpeModel): DataFrame = {
    val spark = df.sparkSession
    val ranksB = spark.sparkContext.broadcast(model.ranks)
    val nSub = udf { (tok: String) =>
      encodeToken(tok, ranksB.value).length
    }
    val toks = df.where(col(text).isNotNull)
      .select(col(id), explode(Dedup.normalizeTokens(col(text)))
        .as("__tok"))
    val dict = toks.select(col("__tok")).distinct()
      .withColumn("__n", nSub(col("__tok")))
    toks.join(broadcast(dict), Seq("__tok"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_words"), sum(col("__n")).as("n_bpe"))
  }

  /** STREAMING-SAFE fertility: (id, n_words, n_bpe) computed by one
    * stateless scalar pass per document row — tokenize and encode
    * inside a single tight-loop UDF, no explode, no aggregate — so a
    * stream stays in APPEND mode with no state store and no
    * watermark (the ingest-time fertility monitor; [[encodeCounts]]'s
    * dictionary join is the batch path and needs a streaming-illegal
    * distinct). Identical numbers to encodeCounts, spec-pinned, and
    * stream == batch pinned through a MemoryStream.
    *
    * Repeated tokens within and across rows re-encode against a
    * per-executor memo (bounded, concurrent) rather than per
    * occurrence — the dictionary trick degraded to a cache, which is
    * what a stream allows.
    */
  def fertility(docs: DataFrame, id: String, text: String,
      model: BpeModel): DataFrame = {
    val ranksB = docs.sparkSession.sparkContext.broadcast(model.ranks)
    val counts = udf { (t: String) =>
      val toks = Dedup.tokenizeJvm(t)
      if (toks == null) null
      else {
        var nb = 0L
        val memo = Bpe.memo
        var i = 0
        while (i < toks.length) {
          val tok = toks(i)
          val cached = memo.get(tok)
          if (cached != null) nb += cached.intValue()
          else {
            val n = encodeToken(tok, ranksB.value).length
            if (memo.size < memoCap) memo.put(tok, Integer.valueOf(n))
            nb += n
          }
          i += 1
        }
        (toks.length.toLong, nb)
      }
    }
    docs.where(col(text).isNotNull)
      .select(col(id), counts(col(text)).as("__c"))
      .select(col(id), col("__c").getField("_1").as("n_words"),
        col("__c").getField("_2").as("n_bpe"))
  }

  /** Per-executor (token -> subword count) memo for [[fertility]];
    * bounded, shared across tasks. Correctness never depends on it —
    * a miss just re-encodes.
    */
  private val memoCap = 1 << 17
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** Persist a fitted model: the merge list in learned order as one
    * parquet of `(rank, sym_l, sym_r)`. save -> load -> encode is
    * spec-pinned identical.
    */
  def save(spark: org.apache.spark.sql.SparkSession, model: BpeModel,
      path: String): Unit = {
    import spark.implicits._
    model.merges.zipWithIndex
      .map { case ((l, r), i) => (i, l, r) }
      .toDF("rank", "sym_l", "sym_r")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a model persisted by [[save]] (vocabulary-sized collect;
    * rank order restored explicitly — parquet row order is not a
    * contract).
    */
  def load(spark: org.apache.spark.sql.SparkSession,
      path: String): BpeModel = {
    val merges = spark.read.parquet(path)
      .orderBy(col("rank")).collect()
      .map(r => (r.getAs[String]("sym_l"), r.getAs[String]("sym_r")))
    BpeModel(scala.collection.immutable.ArraySeq.unsafeWrapArray(merges))
  }
}
