package graft.tools

import org.apache.spark.sql.SparkSession

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

    val fn12 = graft.Queries.all("q12_row_take")._1
    val fn04 = graft.Queries.all("q04_subset_rows")._1
    time("warm")(spark.read.parquet(s"$dir/orders.parquet").count())
    (1 to 3).foreach { i =>
      time(s"q12 fn #$i")(fn12(spark, dir).count())
      time(s"q12 fn+clear #$i") {
        fn12(spark, dir).count(); spark.catalog.clearCache()
      }
      time(s"q04 fn #$i")(fn04(spark, dir).count())
    }
    spark.stop()
  }
}
