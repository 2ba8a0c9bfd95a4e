package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase probe for q270_dbscan (r15): pairs pin, degree/core pin,
  * duplicateClusters round count and per-round cost, border join.
  */
object Scratch6 {
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
      println(f"[scratch6] $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    for (rep <- 1 to 2) {
      println(s"=== rep $rep")
      val pts = graft.QH.read(spark, sfDir, "customer")
        .where(col("c_custkey") <= 1500)
        .select(col("c_custkey").as("id"),
          ((col("c_custkey") * 37 % 16).cast("double") / 10.0)
            .as("lat"),
          ((col("c_custkey") * 73 % 3600).cast("double") / 10.0
            - 180.0).as("lon"))
      val pairs = t("pairs pin+count") {
        val x = graft.Caches.pin(
          graft.ops.Geo.radiusJoinCells(pts, pts, 60000.0,
            selfPairs = true, 100000)
            .select(col("id_a"), col("id_b")))
        x.count(); x
      }
      val nbrs = pairs.select(col("id_a").as("id"), col("id_b").as("nb"))
        .unionByName(pairs.select(col("id_b").as("id"),
          col("id_a").as("nb")))
      val core = t("core pin+count") {
        val x = graft.Caches.pin(nbrs.groupBy(col("id"))
          .agg(count(lit(1)).as("__deg"))
          .where(col("__deg") >= 2).select(col("id")))
        x.count(); x
      }
      val coreEdges = pairs
        .join(core.select(col("id").as("id_a")), Seq("id_a"))
        .join(core.select(col("id").as("id_b")), Seq("id_b"))
      // inline duplicateClusters with per-round timing
      val clusters = t("CC total") {
        val edges = coreEdges.select(col("id_a").as("s"),
            col("id_b").as("t"))
          .union(coreEdges.select(col("id_b").as("s"),
            col("id_a").as("t")))
          .distinct().cache()
        var labels = edges.select(col("s").as("id")).distinct()
          .withColumn("label", col("id")).cache()
        var changed = 1L
        var i = 0
        while (changed > 0 && i < 20) {
          val r0 = System.nanoTime()
          val nbrMin = edges
            .join(labels.select(col("id").as("t"),
              col("label").as("tl")), "t")
            .groupBy(col("s").as("id")).agg(min(col("tl")).as("nl"))
          // NOT adopted (r15 probe): a pointer-jump step here
          // (next2 = label(next), one extra node-sized join/round)
          // cut rounds 6 -> 4 but read 2.61 -> 3.03s total — the
          // extra join costs more than the saved rounds at the
          // catalog's small component diameters
          val updated = labels.join(nbrMin, Seq("id"), "left")
            .select(col("id"), col("label"),
              least(col("label"), coalesce(col("nl"), col("label")))
                .as("next"))
            .localCheckpoint(true)
          changed = updated.where(col("next") < col("label")).count()
          labels = updated.select(col("id"), col("next").as("label"))
          i += 1
          println(f"[scratch6]   round $i: ${(System.nanoTime() - r0) / 1e9}%5.2f s changed=$changed")
        }
        labels
      }
      t("rest (border+out)") {
        val coreLabeled = core.join(
            clusters.select(col("id"), col("label").as("cluster")),
            Seq("id"), "left")
          .select(col("id"), coalesce(col("cluster"), col("id"))
            .as("cluster"))
        val border = nbrs
          .join(core.select(col("id").as("nb")), Seq("nb"))
          .join(core, Seq("id"), "left_anti")
          .join(coreLabeled.select(col("id").as("nb"),
            col("cluster")), Seq("nb"))
          .groupBy(col("id")).agg(min(col("cluster")).as("cluster"))
        coreLabeled.withColumn("is_core", lit(1))
          .unionByName(border.withColumn("is_core", lit(0)))
          .orderBy(col("id")).count()
      }
      graft.Caches.release()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
