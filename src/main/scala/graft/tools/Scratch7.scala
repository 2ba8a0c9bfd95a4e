package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase probe for q309_cox_fit (r15): construction+persist cost vs
  * the Newton passes (count and per-pass wall time).
  */
object Scratch7 {
  def main(args: Array[String]): Unit = {
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch7] $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    def subjects() = {
      val per = graft.QH.read(spark, sfDir, "orders")
        .groupBy(col("o_custkey"))
        .agg(min(col("o_orderdate")).as("first_d"),
          max(col("o_orderdate")).as("last_d"))
      val mx = per.agg(max(col("last_d")).as("maxd"))
      per.join(graft.QH.read(spark, sfDir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .crossJoin(broadcast(mx))
        .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"),
          expr("datediff(last_d, first_d)").cast("long").as("duration"),
          (expr("datediff(maxd, last_d)") > 360).cast("long")
            .as("event"))
    }
    for (rep <- 1 to 3) {
      println(s"=== rep $rep")
      val subj = subjects()
      val rows = subj.select(col("duration").as("__t"),
          col("event").as("__e"),
          (col("c_acctbal") / 1000.0).cast("double").as("__x0"),
          (col("c_mktsegment") === "BUILDING").cast("double")
            .as("__x1"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("persist+distinct cnt") {
        rows.select(col("__t")).distinct().count()
      }
      // one representative Newton pass (beta = 0)
      for (p <- 1 to 3) t(s"pass $p") {
        val eta = col("__x0") * lit(0.01 * p) +
          col("__x1") * lit(0.02 * p)
        val wgt = exp(eta)
        val census = rows.groupBy(col("__t")).agg(
          sum(col("__e")).as("__d"),
          sum(wgt).as("__w0"),
          sum(when(col("__e") === 1, eta)).as("__seta"),
          sum(wgt * col("__x0")).as("__w1_0"),
          sum(wgt * col("__x1")).as("__w1_1"),
          sum(wgt * col("__x0") * col("__x0")).as("__w2_0_0"),
          sum(wgt * col("__x0") * col("__x1")).as("__w2_0_1"),
          sum(wgt * col("__x1") * col("__x1")).as("__w2_1_1"),
          sum(when(col("__e") === 1, col("__x0"))).as("__sx_0"),
          sum(when(col("__e") === 1, col("__x1"))).as("__sx_1"))
        val Wo = org.apache.spark.sql.expressions.Window
        val W = Wo
          .partitionBy(graft.ops.ScanOps.pinnedZero(col("__d")))
          .orderBy(col("__t").desc)
          .rowsBetween(Wo.unboundedPreceding, 0)
        var suff = census.withColumn("__S0", sum(col("__w0")).over(W))
        for (c <- Seq("__w1_0", "__w1_1", "__w2_0_0", "__w2_0_1",
            "__w2_1_1"))
          suff = suff.withColumn(c + "S", sum(col(c)).over(W))
        suff.where(col("__d") > 0)
          .agg(sum(col("__S0")), sum(col("__w1_0S")),
            count(lit(1))).collect()
      }
      rows.unpersist(blocking = false)
    }
    spark.stop()
  }
}
