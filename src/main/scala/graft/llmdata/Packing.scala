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
}
