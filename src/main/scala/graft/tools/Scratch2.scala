package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off probe for the q284 ipfWeights cell-space regression
  * (r15): time each phase of the cell path vs the row path.
  */
object Scratch2 {
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

    def read(t: String) =
      graft.QH.read(spark, sfDir, t)

    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch2] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    def body(): Unit = {
      val c = read("customer")
      val samp = graft.llmdata.Sampling.hashSample(c, "c_custkey", 0.3)
        .select(col("c_custkey").as("id"),
          col("c_mktsegment").as("a"),
          col("c_nationkey").cast("long").as("b"))
      val ta = c.groupBy(col("c_mktsegment").as("a"))
        .agg(count(lit(1)).as("t"))
      val tb = c.groupBy(col("c_nationkey").cast("long").as("b"))
        .agg(count(lit(1)).as("t"))
      val taB = broadcast(ta.select(col("a"), col("t").cast("long").as("__ta")))
      val tbB = broadcast(tb.select(col("b"), col("t").cast("long").as("__tb")))
      val cells = t("cells pin+count") {
        val x = graft.Caches.pin(
          samp.groupBy(col("a"), col("b")).agg(count(lit(1)).as("__n")))
        x.count(); x
      }
      var cur = cells.withColumn("w_ppm", lit(1000000L))
      for (r <- 1 to 3) {
        cur = t(s"round $r a-step") {
          val sa = cur.groupBy(col("a"))
            .agg(sum(col("w_ppm") * col("__n")).as("__sa"))
          val nxt = cur.join(broadcast(sa), Seq("a")).join(taB, Seq("a"))
            .withColumn("w_ppm", expr("w_ppm * __ta * 1000000 div __sa"))
            .drop("__sa", "__ta")
          nxt.count(); nxt
        }
        cur = t(s"round $r b-step") {
          val sb = cur.groupBy(col("b"))
            .agg(sum(col("w_ppm") * col("__n")).as("__sb"))
          val nxt = cur.join(broadcast(sb), Seq("b")).join(tbB, Seq("b"))
            .withColumn("w_ppm", expr("w_ppm * __tb * 1000000 div __sb"))
            .drop("__sb", "__tb")
          nxt.count(); nxt
        }
      }
      val w = t("final join + margins") {
        val ww = samp.join(
          broadcast(cur.select(col("a"), col("b"), col("w_ppm"))),
          Seq("a", "b"))
        val ma = ww.groupBy(col("a"))
          .agg(sum(col("w_ppm")).as("achieved_ppm"))
          .join(broadcast(ta), Seq("a"))
          .select(lit("seg").as("dim"), col("a").cast("string")
            .as("level"), col("t").as("target_n"), col("achieved_ppm"))
        val mb = ww.groupBy(col("b"))
          .agg(sum(col("w_ppm")).as("achieved_ppm"))
          .join(broadcast(tb), Seq("b"))
          .select(lit("nation").as("dim"), col("b").cast("string")
            .as("level"), col("t").as("target_n"), col("achieved_ppm"))
        ma.unionByName(mb).orderBy(col("dim"), col("level")).count()
      }
      graft.Caches.release()
      spark.catalog.clearCache()
      w
    }
    // two reps: first warms codegen, second is steady state
    t("TOTAL rep 1")(body())
    t("TOTAL rep 2")(body())
    t("TOTAL rep 3")(body())
    spark.stop()
  }
}
