package graft.llmdata

import graft.ops.ScanOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Context-window packing: assign documents to fixed-token-budget
  * packs for training-batch assembly.
  *
  * True greedy bin packing is sequential state; the scalable contract
  * here is CONTIGUOUS packing over a deterministic document order:
  * `pack = floor(exclusive_prefix_tokens / capacity)`. Every pack
  * starts on the capacity grid; a pack can run over by at most one
  * document's tokens (cap documents at the context length upstream —
  * they can't pack anyway). The prefix sums come from
  * [[ScanOps.prefixSums]] — range-bucketed two-pass, integer-exact, no
  * single-partition window — so the assignment is reproducible at any
  * scale and in any engine (the oracle is one SQL window).
  */
object Packing {

  /** Add `pack_id` (0-based) and `n_tokens` for packing `df` in
    * ascending `ord` order (a unique numeric column, e.g. the doc id)
    * under a token `capacity`.
    */
  def packBySequence(df: DataFrame, ord: String, tokens: Column,
      capacity: Long, out: String = "pack_id"): DataFrame = {
    require(capacity > 0, s"capacity $capacity")
    val withTok = df.withColumn("n_tokens", tokens.cast("long"))
    ScanOps.prefixSums(withTok, ord, Seq("__cum" -> col("n_tokens")))
      .withColumn(out,
        floor((col("__cum") - col("n_tokens")) /
          lit(capacity.toDouble)).cast("long"))
      .drop("__cum")
  }

  /** Split long documents into fixed-size token windows with overlap
    * — the chunking stage ahead of embedding/packing when documents
    * exceed the context length. Chunk starts sit on the
    * `(maxTokens - overlap)` stride grid: starts s = 0, stride,
    * 2·stride, … while `s <= n - overlap - 1` (every chunk after the
    * first carries at least one token beyond the shared overlap; a
    * doc shorter than the overlap still yields its single chunk at
    * s = 0). Pure array expressions + one explode — embarrassingly
    * parallel, no shuffle, engine-reproducible.
    */
  def chunkDocuments(df: DataFrame, docId: String, text: String,
      maxTokens: Int, overlap: Int = 0): DataFrame = {
    require(maxTokens > 0, s"maxTokens $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap $overlap must be in [0, maxTokens)")
    val stride = maxTokens - overlap
    val toks = df.where(col(text).isNotNull)
      .select(col(docId),
        filter(split(trim(col(text)), "\\s+"), t => t =!= "").as("__t"))
      .where(size(col("__t")) >= 1)
    val starts = sequence(lit(0),
      greatest(size(col("__t")) - overlap - 1, lit(0)), lit(stride))
    toks.select(col(docId), col("__t"), posexplode(starts))
      .select(col(docId), col("pos").as("chunk_idx"),
        least(lit(maxTokens), size(col("__t")) - col("col"))
          .cast("long").as("n_tokens"),
        array_join(slice(col("__t"), col("col") + lit(1), lit(maxTokens)), " ")
          .as("chunk_text"))
  }

  /** Per-pack summary: documents, token total, and fill ratio against
    * the capacity (>1 marks the bounded overflow packs).
    */
  def packStats(packed: DataFrame, capacity: Long,
      packCol: String = "pack_id"): DataFrame =
    packed.groupBy(col(packCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("pack_tokens"),
        (sum(col("n_tokens")) / lit(capacity.toDouble))
          .as("fill_ratio"))
      .orderBy(col(packCol))

  /** PACKED TOKEN-ID SEQUENCES — the training-ready tensor: compose a
    * token-id stream (`(id, word_pos, piece_pos, token_id)`, the
    * [[WordPiece.encodeIds]] shape) with the contiguous
    * [[packBySequence]] assignment into
    * `(pack_id, seq_pos, id, token_id)` — seq_pos the 0-based
    * position inside the pack, documents atomic (a pack overruns by
    * at most one document; cap documents at the context length
    * upstream).
    *
    * All-relational: per-doc piece counts aggregate from the id
    * stream itself, the exclusive prefix sums ride
    * [[ScanOps.prefixSums]] (range-bucketed, no single-partition
    * window), pack starts come from an O(#packs) aggregate joined
    * back broadcast, and the only per-row window partitions by
    * document (bounded by document length). seq_pos =
    * (excl_cum - pack_start) + within-doc index — pure integer
    * arithmetic an oracle replays.
    */
  def packTokenIds(ids: DataFrame, id: String, capacity: Long)
      : DataFrame = {
    require(capacity > 0, s"capacity $capacity")
    val perDoc = ids.groupBy(col(id))
      .agg(count(lit(1)).as("n_tokens"))
    val packed = ScanOps.prefixSums(perDoc, id,
        Seq("__cum" -> col("n_tokens")))
      .withColumn("__excl", col("__cum") - col("n_tokens"))
      .withColumn("pack_id",
        floor(col("__excl") / lit(capacity.toDouble)).cast("long"))
    val packStarts = packed.groupBy(col("pack_id"))
      .agg(min(col("__excl")).as("__pstart"))
    val docPos = packed.join(broadcast(packStarts), Seq("pack_id"))
      .select(col(id), col("pack_id"),
        (col("__excl") - col("__pstart")).as("__doff"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(id)).orderBy(col("word_pos"), col("piece_pos"))
    ids.join(docPos, Seq(id))
      .withColumn("__within", row_number().over(w) - 1)
      .select(col("pack_id"),
        (col("__doff") + col("__within")).as("seq_pos"),
        col(id), col("token_id"))
  }
}
