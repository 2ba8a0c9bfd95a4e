package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage timing for optimization work (not part of the driver
  * contract). Current experiment: q328_communities canonical-skip
  * A/B — old path (labelPropagation re-canonicalizes the fixture)
  * vs new (canonical = true), INTERLEAVED in one JVM so JIT/codegen
  * warm-up is shared and the ±25% solo-run envelope cancels
  * (BENCH_NOTES records the conclusions). Earlier experiments (q328
  * phase split r15, BPE merge loops r14, singleScan trades r6)
  * recorded in BENCH_NOTES.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def entry(canonical: Boolean): Unit = {
      val edges = graft.ops.GraphFixtures.purchaseEdges(spark, sfDir)
      graft.ops.Graph.labelPropagation(edges, rounds = 3,
          canonical = canonical)
        .groupBy(col("label")).agg(count(lit(1)).as("n_members"))
        .orderBy(col("n_members").desc, col("label")).limit(100)
        .collect()
      graft.Caches.release()
      spark.catalog.clearCache()
    }
    // shared warm-up: one untimed rep of EACH shape
    entry(canonical = false)
    entry(canonical = true)
    val times = collection.mutable.Map("old" -> List.empty[Double],
      "new" -> List.empty[Double])
    for (rep <- 1 to 6; (tag, c) <- Seq("old" -> false, "new" -> true)) {
      val t0 = System.nanoTime()
      entry(c)
      val dt = (System.nanoTime() - t0) / 1e9
      times(tag) = times(tag) :+ dt
      println(f"[scratch] rep $rep $tag%-3s $dt%6.2f s")
    }
    for (tag <- Seq("old", "new")) {
      val s = times(tag).sorted
      println(f"[scratch] $tag%-3s median ${s(s.length / 2)}%6.2f s " +
        f"min ${s.head}%6.2f max ${s.last}%6.2f")
    }
    spark.stop()
  }
}
