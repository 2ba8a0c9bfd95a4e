package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints formatted physical plans for headline queries
  * so pushdown / pruning / join strategy / codegen spans can be
  * eyeballed (and greps a few invariants).
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q02_where_in", "q14_groupby_agg", "q58_tpch_q3",
        "q59_tpch_q5", "q08_join_left_fill", "q27_cumulative")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = graft.Queries.all(n)._1(spark, dir)
      df.explain("formatted")
    }
    spark.stop()
  }
}
