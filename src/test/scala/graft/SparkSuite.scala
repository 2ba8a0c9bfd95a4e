package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** One shared local SparkSession for every suite (sbt runs suites in
  * one forked JVM; session startup is ~5s, paid once).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}

abstract class SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  /** The reference expression-corpus pipe: c=[1,2], D=[3,10]
    * (parser_test.go:861-969), with an explicit row order.
    */
  def corpusPipe: DataFrame = {
    import spark.implicits._
    Seq((1.0, 3.0, 0L), (2.0, 10.0, 1L)).toDF("c", "D", "__seq")
  }

  def col1(df: DataFrame, c: String): Seq[Any] =
    df.orderBy("__seq").select(c).collect().map(_.get(0)).toSeq
}
