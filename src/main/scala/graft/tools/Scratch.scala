package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage timing for optimization work (not part of the driver
  * contract).
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

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    import graft.llmdata.{Dedup, TextAnalysis}
    val docs = graft.QH.spread(
      spark.read.parquet(s"$dir/documents.parquet"))
    time("warm")(docs.count())

    def reuse(addK: Double) = {
      val toks = docs.where(col("text").isNotNull)
        .select(col("doc_id"),
          filter(split(Dedup.normalize(col("text")), " "),
            t => t =!= "").as("__t"))
        .where(size(col("__t")) >= 2)
      val bi = toks.select(col("doc_id"),
          explode(transform(sequence(lit(1), size(col("__t")) - 1),
            i => struct(element_at(col("__t"), i).as("w1"),
              element_at(col("__t"), i + 1).as("w2")))).as("__b"))
        .select(col("doc_id"), col("__b.w1").as("w1"), col("__b.w2").as("w2"))
        .repartition(col("w1"), col("w2"))
      val bc = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("__bc"))
      val hc = bc.groupBy(col("w1")).agg(sum(col("__bc")).as("__hc"))
      val vocab = bc.select(col("w1").as("__w"))
        .union(bc.select(col("w2").as("__w")))
        .agg(countDistinct(col("__w")).as("__v"))
      bi.join(bc, Seq("w1", "w2")).join(hc, Seq("w1"))
        .crossJoin(broadcast(vocab))
        .withColumn("__lp", log((col("__bc") + lit(addK)) /
          (col("__hc") + lit(addK) * col("__v"))))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), (-avg(col("__lp"))).as("__nll"))
        .withColumn("perplexity", exp(col("__nll")))
        .select(col("doc_id"), col("n_bigrams"), col("perplexity"))
    }

    (1 to 3).foreach { i =>
      time(s"current default #$i") {
        TextAnalysis.lmPerplexity(docs, "doc_id", "text", 0.5, false).count()
        spark.catalog.clearCache()
      }
      time(s"repartition-reuse #$i") {
        reuse(0.5).count(); spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
