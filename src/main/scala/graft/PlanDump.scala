package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan-audit helper: builds the named catalog entries against a SF
  * dir and prints each one's FORMATTED executed plan (the PLANS.md
  * evidence format). Entries that materialize internally (cache +
  * count before Caches.release) print the plan of the returned
  * (cached) frame plus whatever in-plan gates already ran.
  *
  * Usage: MAIN=graft.PlanDump tools/bench.sh <sfDir> <query> [query…]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      println(s"\n### $name (executed plan, $sfDir)\n")
      val df = fn(spark, sfDir)
      println(df.queryExecution.explainString(
        ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
