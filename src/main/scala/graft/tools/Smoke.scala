package graft.tools

import org.apache.spark.sql.SparkSession

/** Driver-contract smoke check: entry() on sf0.001 must return rows. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows: $n")
    require(n > 0, "entry() returned no rows")
    spark.stop()
  }
}
