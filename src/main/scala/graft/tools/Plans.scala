package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints formatted physical plans for headline queries
  * so pushdown / pruning / join strategy / codegen spans can be
  * eyeballed (and greps a few invariants).
  *
  * Prints TWO plans per query: the static `explain("formatted")` and,
  * after running the query, the FINAL ADAPTIVE plan
  * (`queryExecution.executedPlan` with `isFinalPlan=true`) — AQE
  * decisions like exchange/stage reuse and broadcast demotion only
  * appear in the latter, so claims about them must be evidenced there
  * (the r4 review caught a reuse claim made off the static plan).
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
      // execute THIS QueryExecution (df.count() would plan and run a
      // separate one and leave this plan isFinalPlan=false): AQE
      // finalizes — and stage reuse appears — only on the executed
      // instance
      df.queryExecution.toRdd.count()
      println(s"---------- $n: final adaptive plan (executed) ----------")
      println(df.queryExecution.executedPlan.toString)
      graft.Caches.release()
      try spark.catalog.clearCache() catch { case _: Throwable => }
    }
    spark.stop()
  }
}
