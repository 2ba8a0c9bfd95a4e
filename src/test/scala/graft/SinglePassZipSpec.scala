package graft

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._

/** The single-pass sorted zip (map-stage row counts via accumulator +
  * submitMapStage + one shuffle read) must agree exactly with the
  * two-pass zip on every row and sequence value.
  */
class SinglePassZipSpec extends SparkSuite {

  private def seqs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.select(col("l_orderkey"), col("__seq")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._2)

  test("single-pass zip equals two-pass zip (asc, ties broken " +
      "identically by the stable sorter)") {
    val li = QH.read(spark, TestSpark.sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
      .repartition(7) // multiple map tasks
    val keys = Seq(col("l_orderkey").asc, col("l_partkey").asc,
      col("l_quantity").asc)
    val (two, nTwo) = GraftBridge.sortedZipWithSequence(li, keys, "__seq")
    val (one, nOne) = GraftBridge.singlePassSortedZip(li, keys, "__seq")
    assert(nOne == nTwo && nOne == li.count())
    assert(seqs(one) == seqs(two))
  }

  test("single-pass zip: desc key and computed key") {
    val li = QH.read(spark, TestSpark.sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_extendedprice")
      .repartition(5)
    val keys = Seq(col("l_extendedprice").desc,
      (col("l_orderkey") * 2).asc, col("l_partkey").asc)
    val (two, _) = GraftBridge.sortedZipWithSequence(li, keys, "__seq")
    val (one, n) = GraftBridge.singlePassSortedZip(li, keys, "__seq")
    assert(n == li.count())
    // computed key columns are dropped from the output
    assert(one.columns.toSeq ==
      Seq("l_orderkey", "l_partkey", "l_extendedprice", "__seq"))
    val a = one.orderBy("__seq").collect().map(_.toSeq).toSeq
    val b = two.orderBy("__seq").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("single-pass zip: empty frame and single partition") {
    val li = QH.read(spark, TestSpark.sfDir, "lineitem")
      .select("l_orderkey").where(lit(false)).repartition(1)
    val (one, n) = GraftBridge.singlePassSortedZip(li,
      Seq(col("l_orderkey").asc), "__seq")
    assert(n == 0 && one.count() == 0)
  }
}
