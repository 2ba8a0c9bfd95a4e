package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved micro-bench of three wedge-pair formulations for
  * linkScores (r15, q251): (a) two-step posexplode+explode,
  * (b) one-step flatten/transform struct fan-out (the q287 shape),
  * (c) the r14 a⋈b self-join. Each timed to a noop sink (wedge only)
  * and through the pair aggregate.
  */
object Scratch5 {
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
      println(f"[scratch5] $name%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s  gc ${gcSec() - g0}%5.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

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
    val e = graft.Caches.pin(adj
      .select(col("node").cast("long").as("node"),
        col("nbr").cast("long").as("nbr"))
      .where(col("node").isNotNull && col("nbr").isNotNull)
      .distinct())
    e.count()
    val grouped = graft.Caches.pin(
      e.groupBy(col("nbr"))
        .agg(array_sort(collect_set(col("node"))).as("ns"))
        .select(col("nbr"), col("ns"),
          size(col("ns")).cast("long").as("d")))
    grouped.count()

    def wedgeA: DataFrame = grouped.where(col("d") >= 2)
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

    def wedgeB: DataFrame = grouped.where(col("d") >= 2)
      .withColumn("aa_w",
        floor(lit(1000000.0) / log(col("d").cast("double")))
          .cast("long"))
      .withColumn("ra_w", expr("1000000000000L div d"))
      .select(explode(flatten(transform(col("ns"), (x, i) =>
          transform(slice(col("ns"), i + lit(2),
            size(col("ns")) - i - lit(1)),
            y => struct(x.as("na"), y.as("nb")))))).as("pr"),
        col("aa_w"), col("ra_w"))
      .select(col("pr.na").as("node_a"), col("pr.nb").as("node_b"),
        col("aa_w"), col("ra_w"))

    def wedgeC: DataFrame = {
      val deg = e.groupBy(col("nbr")).agg(count(lit(1)).as("d"))
      val w = deg.where(col("d") >= 2).select(col("nbr"),
        floor(lit(1000000.0) / log(col("d").cast("double")))
          .cast("long").as("aa_w"),
        expr("1000000000000L div d").as("ra_w"))
      val a = e.select(col("nbr"), col("node").as("node_a"))
      val b = e.select(col("nbr"), col("node").as("node_b"))
      a.join(b, Seq("nbr"))
        .where(col("node_a") < col("node_b"))
        .join(w, Seq("nbr"))
        .select(col("node_a"), col("node_b"), col("aa_w"), col("ra_w"))
    }

    def agg(w: DataFrame): DataFrame =
      w.groupBy(col("node_a"), col("node_b"))
        .agg(count(lit(1)).as("n_common"), sum(col("aa_w")).as("aa_q"),
          sum(col("ra_w")).as("ra_q"))
        .where(col("n_common") >= 3L)

    // warm, untimed
    noop(agg(wedgeC))
    noop(agg(wedgeC.repartition(col("node_a"), col("node_b"))))
    noop(agg(wedgeC.repartition(col("node_a"))))
    for (rep <- 1 to 4) {
      t(s"C plain    rep$rep")(noop(agg(wedgeC)))
      t(s"C rep(a,b) rep$rep")(noop(agg(
        wedgeC.repartition(col("node_a"), col("node_b")))))
      t(s"C rep(a)   rep$rep")(noop(agg(
        wedgeC.repartition(col("node_a")))))
    }
    graft.Caches.release()
    spark.stop()
  }
}
