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

    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    time("warm")(orders.count())
    (1 to 3).foreach { i =>
      time(s"index plain #$i") {
        val f = graft.frame.SeaFrame.withSequence(orders,
          Seq(col("o_orderkey").asc))
        val withIdx = f.copy(df = f.df.withColumn("gidx",
          col("o_orderkey") % 50))
        graft.ops.Gather.index(withIdx, "o_totalprice", "gidx").count()
      }
      time(s"index smallIdxSet #$i") {
        val f = graft.frame.SeaFrame.withSequence(orders,
          Seq(col("o_orderkey").asc))
        val withIdx = f.copy(df = f.df.withColumn("gidx",
          col("o_orderkey") % 50))
        graft.ops.Gather.index(withIdx, "o_totalprice", "gidx",
          smallIdxSet = true).count()
      }
    }
    spark.stop()
  }
}
