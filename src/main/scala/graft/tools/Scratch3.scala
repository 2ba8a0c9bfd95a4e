package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Interleaved in-JVM A/B for the r15 `symmetric` node-universe
  * shortcut in pageRankInt/pprInt: both paths alternate inside one
  * session so JVM/ambient variance cancels. Fixture memo stays warm
  * after the first call, so the probe isolates the OPERATOR cost —
  * exactly the part the flag changes.
  */
object Scratch3 {
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

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch3] $name%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (rows $n)")
    }
    val edges = graft.ops.GraphFixtures.purchaseEdges(spark, sfDir)
    val sources = graft.QH.read(spark, sfDir, "customer")
      .where(col("c_nationkey") === 7)
      .select((col("c_custkey") * 2).as("node"))
    // warm both paths once (codegen/JIT), untimed
    graft.ops.Graph.pageRankInt(edges, 3, symmetric = false).count()
    graft.Caches.release()
    graft.ops.Graph.pageRankInt(edges, 3, symmetric = true).count()
    graft.Caches.release()
    for (rep <- 1 to 4) {
      t(s"pr  old rep$rep") {
        val n = graft.ops.Graph.pageRankInt(edges, 3,
          symmetric = false).count()
        graft.Caches.release(); n
      }
      t(s"pr  new rep$rep") {
        val n = graft.ops.Graph.pageRankInt(edges, 3,
          symmetric = true).count()
        graft.Caches.release(); n
      }
      t(s"ppr old rep$rep") {
        val n = graft.ops.Graph.pprInt(edges, sources, 3,
          symmetric = false).count()
        graft.Caches.release(); n
      }
      t(s"ppr new rep$rep") {
        val n = graft.ops.Graph.pprInt(edges, sources, 3,
          symmetric = true).count()
        graft.Caches.release(); n
      }
    }
    // result equality (beyond the oracle): both paths, same rows
    val a = graft.ops.Graph.pageRankInt(edges, 3, symmetric = false)
    val b = graft.ops.Graph.pageRankInt(edges, 3, symmetric = true)
    println(s"[scratch3] pr  exceptAll both ways: " +
      s"${a.exceptAll(b).count()} / ${b.exceptAll(a).count()}")
    val c = graft.ops.Graph.pprInt(edges, sources, 3, symmetric = false)
    val d = graft.ops.Graph.pprInt(edges, sources, 3, symmetric = true)
    println(s"[scratch3] ppr exceptAll both ways: " +
      s"${c.exceptAll(d).count()} / ${d.exceptAll(c).count()}")
    graft.Caches.release()
    spark.stop()
  }
}
