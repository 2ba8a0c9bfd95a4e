package graft.tools

/** Ad-hoc stage timing for optimization work (not part of the driver
  * contract). Current experiment: incremental vs full-recount BPE
  * driver merge loops at production vocabulary scale (BENCH_NOTES
  * records the conclusions). Earlier experiment (singleScan trades
  * for spanDedup / repeatedSubstringSpans / chunkByContent) recorded
  * in BENCH_NOTES r6.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    // Zipf-ish synthetic word-type table: the shape a real corpus
    // census produces (few massive types, long rare tail).
    val rnd = new scala.util.Random(7L)
    val alpha = "etaoinshrdlucmfwypvbgkqjxz"
    def word(): String = {
      val len = 2 + rnd.nextInt(10)
      (0 until len).map { _ =>
        // skewed letter draw
        alpha(math.min(rnd.nextInt(8) + rnd.nextInt(19),
          alpha.length - 1))
      }.mkString
    }
    for (nTypes <- Seq(10000, 50000); nMerges <- Seq(500, 2000)) {
      val types = (0 until nTypes).map { i =>
        (word(), (nTypes.toLong / (i + 1)) + 1L)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toArray
      def time(f: => Seq[(String, String, Long)]): (Double, Int) = {
        val t0 = System.nanoTime()
        val m = f
        ((System.nanoTime() - t0) / 1e9, m.size)
      }
      val (tInc, nInc) =
        time(graft.llmdata.Bpe.fitDriver(types, nMerges, 2L))
      val (tRec, nRec) =
        time(graft.llmdata.Bpe.fitDriverRecount(types, nMerges, 2L))
      println(f"[scratch] types=${types.length}%6d merges=$nMerges%5d " +
        f"incremental ${tInc}%7.2f s ($nInc) recount ${tRec}%7.2f s " +
        f"($nRec) speedup ${tRec / tInc}%.1fx")
    }
  }
}
