package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage timing for optimization work (not part of the driver
  * contract). Current experiment: the singleScan (pin-the-derived-
  * unit-stream) trade for spanDedup / repeatedSubstringSpans /
  * chunkByContent at the active SF dir (BENCH_NOTES records the
  * conclusions).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def med(label: String)(f: => Long): Unit = {
      f // untimed burn-in
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[scratch] $label: median ${ts(1)}%.2f s (${ts.mkString(", ")})")
    }

    import graft.llmdata.Dedup
    val docs = graft.QH.spread(
      spark.read.parquet(s"$dir/documents.parquet"))
    docs.count()

    for (single <- Seq(false, true)) {
      med(s"q93 spanDedup singleScan=$single") {
        val n = Dedup.spanDedup(docs, "doc_id", "text", 12, 2,
          singleScan = single).count()
        graft.Caches.release(); n
      }
      med(s"q110 repeatedSubstringSpans singleScan=$single") {
        val n = Dedup.repeatedSubstringSpans(docs, "doc_id", "text", 8, 2,
          singleScan = single).count()
        graft.Caches.release(); n
      }
      med(s"q112 chunkByContent singleScan=$single") {
        val n = Dedup.chunkByContent(docs, "doc_id", "text", 16,
          singleScan = single).count()
        graft.Caches.release(); n
      }
    }
    spark.stop()
  }
}
