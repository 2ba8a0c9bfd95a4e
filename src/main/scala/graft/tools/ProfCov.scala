package graft.tools

import org.apache.spark.sql.SparkSession

/** r12 ask-3 profiler: q257 covariance matrix wall time, decimal vs
  * quantized-long accumulation.
  */
object ProfCov {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cs = Seq("l_quantity", "l_extendedprice", "l_discount",
      "l_tax")
    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag: median ${reps.sorted.apply(1)}%.3f s  $reps")
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.count()
    time("decimal covarianceMatrix") {
      graft.functions.Tabular.covarianceMatrix(li, cs).collect()
    }
    // decompose: how much is the decimal aggregate alone?
    import org.apache.spark.sql.functions._
    time("decimal sums only") {
      li.na.drop(cs).agg(
        graft.QH.dsum(col(cs(0))), graft.QH.dsumsq(col(cs(0))),
        graft.QH.dsum(col(cs(1))), graft.QH.dsumsq(col(cs(1))),
        graft.QH.dsum(col(cs(2))), graft.QH.dsumsq(col(cs(2))),
        graft.QH.dsum(col(cs(3))), graft.QH.dsumsq(col(cs(3))),
        count(lit(1))).collect()
    }
    time("quantized covarianceMatrixQuantized") {
      graft.functions.Tabular.covarianceMatrixQuantized(li, cs)
        .collect()
    }
    time("long sums only (scaled x100, squares split hi/lo)") {
      val q = li.na.drop(cs).select(
        cs.map(c => round(col(c) * 100).cast("long").as(c)): _*)
      q.agg(
        sum(col(cs(0))), sum(col(cs(1))), sum(col(cs(2))),
        sum(col(cs(3))),
        sum(expr(s"${cs(1)} * ${cs(1)} div 2147483648")),
        sum(pmod(col(cs(1)) * col(cs(1)), lit(2147483648L))),
        count(lit(1))).collect()
    }
    spark.stop()
  }
}
