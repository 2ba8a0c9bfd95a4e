package graft.ml

import graft.frame.SeaFrame
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Epoch/batch iteration for SGD-style training loops — the analog of
  * the reference's Batch/Epoch/WithCycle surface (seafan
  * pipeline.go:22-24, ch.go:326-383):
  *
  *   - sequential batch windows [b*bs, (b+1)*bs) over the explicit
  *     row order;
  *   - rows beyond the last full batch unused within an epoch
  *     (ch.go:337-350);
  *   - optional reshuffle between epochs (the reference's
  *     shuffle-interval);
  *   - cycle=false re-pulls the source each epoch (ch.go:327-336) —
  *     here: recompute vs cache.
  *
  * Batches are DataFrames (executors hold the data); only the batch
  * BOUNDARIES live on the driver. MLlib estimators consume whole
  * DataFrames, so this surface exists for custom training loops and
  * reference parity.
  */
object Epochs {

  /** Number of full batches per epoch. */
  def batchCount(nRows: Long, batchSize: Int): Long = nRows / batchSize

  /** The b-th batch of the epoch under the frame's explicit order. */
  def batch(frame0: SeaFrame, batchSize: Int, b: Long): DataFrame = {
    val frame = frame0.materialized // declared-lazy orders work too
    val seqC = frame.seqCol.getOrElse(throw new IllegalStateException(
      "batching requires an explicit row order"))
    frame.df.where(col(seqC) >= b * batchSize &&
      col(seqC) < (b + 1) * batchSize)
  }

  /** Iterate epochs x batches: calls `fn(epoch, batchIndex, batchDf)`;
    * reshuffles the order every `shuffleEvery` epochs (0 = never),
    * caching the frame when `cycle` so re-iteration is cheap.
    */
  def run(frame: SeaFrame, batchSize: Int, epochs: Int,
      shuffleEvery: Int = 0, cycle: Boolean = true, seed: Long = 42)(
      fn: (Int, Long, DataFrame) => Unit): Unit = {
    // materialize a declared-lazy order ONCE up front — batch() would
    // otherwise re-zip per batch
    val mat = frame.materialized
    var cur = if (cycle) mat.copy(df = mat.df.cache()) else mat
    val n = cur.knownCount.getOrElse(cur.df.count())
    val nb = batchCount(n, batchSize)
    (0 until epochs).foreach { e =>
      if (shuffleEvery > 0 && e > 0 && e % shuffleEvery == 0)
        cur = cur.shuffle(seed + e)
      (0L until nb).foreach { b => fn(e, b, batch(cur, batchSize, b)) }
    }
    if (cycle) cur.df.unpersist()
  }
}
