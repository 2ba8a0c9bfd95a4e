package graft

import graft.io.Sources
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Co-located joins via bucketing: two tables bucketed on the join
  * key must join WITHOUT a shuffle exchange — the write-once,
  * join-many layout strategy for 100 TB fact tables.
  */
class BucketJoinSpec extends SparkSuite {

  test("bucketed tables join with no shuffle exchange") {
    val li = QH.read(spark, TestSpark.sfDir, "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = QH.read(spark, TestSpark.sfDir, "orders")
      .select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    Sources.writeBucketed(li, "b_lineitem", "l_orderkey", 8)
    Sources.writeBucketed(o, "b_orders", "l_orderkey", 8)

    val j = spark.table("b_lineitem")
      .join(spark.table("b_orders"), "l_orderkey")
    val plan = j.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    // SortMergeJoin reads both bucketed layouts directly: the only
    // acceptable Exchange would be none at all on the join keys
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    // and the result is the plain join's result
    val expect = li.join(o, "l_orderkey").count()
    assert(j.count() == expect)
  }
}
