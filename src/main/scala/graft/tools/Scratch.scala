package graft.tools

import graft.llmdata.Dedup
import org.apache.spark.sql.SparkSession

/** Ad-hoc stage timing for optimization work (not part of the driver
  * contract).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    import org.apache.spark.sql.functions._
    time("warm")(docs.count())
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    time("lsh-candidates") {
      val sig = emb.repartition(32)
        .select(col("vec_id").as("__id"), col("embedding").as("__v"),
          graft.llmdata.Similarity.lshSignature(col("embedding"), 64, 8)
            .as("__sig"))
      val a = sig.select(col("__id").as("id_a"), col("__v").as("va"),
        col("__sig").as("sig"))
      val b = sig.select(col("__id").as("id_b"), col("__v").as("vb"),
        col("__sig").as("sig"))
      val pairs = a.join(b, Seq("sig")).where(col("id_a") < col("id_b"))
      println("[scratch] lsh pair count: " + pairs.count())
    }
    time("lsh-full") {
      println("[scratch] lsh neighbors: " + graft.llmdata.Similarity
        .lshNeighbors(emb, "vec_id", "embedding", 64, 8, 0.2).count())
    }
    val sh = docs.select(col("doc_id").as("doc"),
        Dedup.shingles(col("text"), 3).as("sh"))
      .repartition(32)
    time("shingles")(sh.count())
    val banded = sh.select(col("doc"),
        posexplode(Dedup.minhashBandHashes(col("sh"), 8, 4)))
      .toDF("doc", "band", "bucket")
    time("banded")(banded.count())
    val a = banded.as("a"); val b = banded.as("b")
    val joined = a.join(b, col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .distinct()
    time("selfjoin")(println("[scratch] cand: " + joined.count()))
    time("full")(Dedup.minhashDedup(docs, "doc_id", "text", 3, 8, 4, 0.7)
      .count())
    spark.stop()
  }
}
