package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase probe for q251_link_scores' erratic reps (r15): which stage
  * of the in-row wedge shape carries the 9–41s/rep variance.
  */
object Scratch4 {
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
    def gcSec(): Double = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime)
        .sum / 1e3
    }
    def t[T](name: String)(f: => T): T = {
      val g0 = gcSec(); val t0 = System.nanoTime()
      val r = f
      println(f"[scratch4] $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s  gc ${gcSec() - g0}%5.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (rep <- 1 to 3) {
      println(s"=== rep $rep")
      val p = graft.QH.read(spark, sfDir, "part")
      val adj0 = p.select(col("p_partkey").as("node"),
          concat(lit("b:"), col("p_brand")).as("tok"))
        .unionByName(p.select(col("p_partkey").as("node"),
          concat(lit("t:"), col("p_type")).as("tok")))
        .unionByName(p.select(col("p_partkey").as("node"),
          concat(lit("s:"), col("p_size").cast("string")).as("tok")))
      val dict = adj0.select(col("tok")).distinct()
        .withColumn("nbr", xxhash64(col("tok")))
      val adj = adj0.join(broadcast(dict), Seq("tok"))
        .select(col("node"), col("nbr"))
      val e = t("e pin+count") {
        val x = graft.Caches.pin(adj
          .select(col("node").cast("long").as("node"),
            col("nbr").cast("long").as("nbr"))
          .where(col("node").isNotNull && col("nbr").isNotNull)
          .distinct())
        x.count(); x
      }
      val grouped = t("grouped pin+count") {
        val x = graft.Caches.pin(
          e.groupBy(col("nbr"))
            .agg(array_sort(collect_set(col("node"))).as("ns"))
            .select(col("nbr"), col("ns"),
              size(col("ns")).cast("long").as("d")))
        x.count(); x
      }
      val wedge = grouped.where(col("d") >= 2)
        .withColumn("aa_w",
          floor(lit(1000000.0) / log(col("d").cast("double")))
            .cast("long"))
        .withColumn("ra_w", expr("1000000000000L div d"))
        .select(col("ns"), col("aa_w"), col("ra_w"),
          posexplode(col("ns")))
        .select(col("col").as("node_a"),
          explode(slice(col("ns"), col("pos") + lit(2),
            greatest(size(col("ns")) - col("pos") - lit(1), lit(0))))
            .as("node_b"),
          col("aa_w"), col("ra_w"))
      t("wedge noop")(noop(wedge))
      val agg = wedge.groupBy(col("node_a"), col("node_b"))
        .agg(count(lit(1)).as("n_common"), sum(col("aa_w")).as("aa_q"),
          sum(col("ra_w")).as("ra_q"))
        .where(col("n_common") >= 3L)
      t("pair agg noop")(noop(agg))
      val anti = agg.join(e.select(col("node").as("node_a"),
        col("nbr").as("node_b")), Seq("node_a", "node_b"), "left_anti")
      val out = anti.orderBy(col("aa_q").desc, col("node_a"),
        col("node_b")).limit(100)
      t("full count")(out.count())
      graft.Caches.release()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
