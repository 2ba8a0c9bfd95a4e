package graft

import graft.io.Layout
import org.apache.spark.sql.functions._

/** Z-order layout: Morton arithmetic against a reference interleave,
  * and the pruning claim measured directly — a bounding-box query
  * intersects far fewer file envelopes under Z-order clustering than
  * under a single-column sort.
  */
class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  private def refZ(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zValue equals the reference bit interleave, masks to the " +
      "bit budget, and is monotone on the curve") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 9L), (255L, 255L),
      (1023L, 1L), (1L, 1023L), (4096L + 3L, 7L)) // 4099 folds to 3
    val df = pts.toDF("x", "y")
      .withColumn("z", Layout.zValue(col("x"), col("y"), 10))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2)))
    got.foreach { case (x, y, z) =>
      assert(z == refZ(x & 1023L, y & 1023L, 10),
        s"z($x,$y) = $z != ref")
    }
  }

  test("bounding-box query touches far fewer file envelopes under " +
      "Z-order than under a single-column sort (the pruning claim)") {
    val n = 64
    val grid = (for (x <- 0 until n; y <- 0 until n)
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val zDir = System.getProperty("java.io.tmpdir") + "/graft_zorder"
    val sDir = System.getProperty("java.io.tmpdir") + "/graft_singlesort"
    Layout.writeZOrdered(grid, zDir, "x", "y", bits = 6, nFiles = 16)
    // baseline: same file count, sorted on x only — y stats useless
    grid.repartitionByRange(16, col("x"), col("y"))
      .sortWithinPartitions(col("x"), col("y"))
      .write.mode("overwrite").parquet(sDir)
    def touched(dir: String): Long = {
      val env = Layout.fileEnvelopes(spark.read.parquet(dir), "x", "y")
      // the box: a 16x16 corner square
      env.where(col("max_a") >= 0 && col("min_a") <= 15 &&
        col("max_b") >= 0 && col("min_b") <= 15).count()
    }
    val z = touched(zDir)
    val s = touched(sDir)
    // 16 files over a 64x64 grid: Z-order puts the 16x16 corner into
    // 1-2 files; the x-sort spreads every y through each x-slice, so
    // the 4 files covering x in [0,15] ALL intersect
    assert(z < s, s"z-order touched $z files, x-sort $s")
    assert(z <= 2, s"z-order corner box should sit in <= 2 files, got $z")
    // both layouts hold the same rows
    assert(spark.read.parquet(zDir).count() == n.toLong * n)
    assert(spark.read.parquet(zDir).agg(sum("x"), sum("y")).head() ==
      spark.read.parquet(sDir).agg(sum("x"), sum("y")).head())
  }

  test("zValueN: 3-dim interleave places bit i of dim d at 3i+d; " +
      "2-dim form equals zValue") {
    import spark.implicits._
    val df = Seq((5L, 3L, 6L)).toDF("a", "b", "c")
    // a=101, b=011, c=110 -> bit layout (pos = 3i+d):
    // i=0: a0=1 ->0, b0=1 ->1, c0=0 ->2 : 011
    // i=1: a1=0 ->3, b1=1 ->4, c1=1 ->5 : 110
    // i=2: a2=1 ->6, b2=0 ->7, c2=1 ->8 : 101
    // value = 0b101_110_011 = 371
    val z3 = df.select(graft.io.Layout.zValueN(
      Seq(col("a"), col("b"), col("c")), 3)).head().getLong(0)
    assert(z3 == 371L, s"got $z3")
    val two = df.select(
      graft.io.Layout.zValueN(Seq(col("a"), col("b")), 8),
      graft.io.Layout.zValue(col("a"), col("b"), 8)).head()
    assert(two.getLong(0) == two.getLong(1))
  }

  test("compact: splinter files merge to the byte-sized count with " +
      "every row intact") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_compact").toString
    val frag = s"$tmp/frag"
    val out = s"$tmp/out"
    (1 to 1000).map(i => (i.toLong, s"row $i")).toDF("id", "s")
      .repartition(32).write.parquet(frag)
    // generous target -> everything fits one file
    val (before, after) = graft.io.Layout.compact(spark, frag, out,
      targetFileBytes = 64L << 20)
    assert(before == 32L && after == 1)
    val files = new java.io.File(out)
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 1)
    val got = spark.read.parquet(out)
    assert(got.count() == 1000L)
    assert(got.agg(sum("id")).head().getLong(0) == 500500L)
    // tiny target -> multiple output files, still all rows
    val out2 = s"$tmp/out2"
    val bytes = new java.io.File(frag).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val (_, after2) = graft.io.Layout.compact(spark, frag, out2,
      targetFileBytes = bytes / 4)
    assert(after2 >= 4 && after2 <= 5, s"got $after2")
    assert(spark.read.parquet(out2).count() == 1000L)
  }

  test("compact: hive-partitioned (nested) input is sized from the " +
      "recursive listing, not silently collapsed to one file") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_compact_nested").toString
    val frag = s"$tmp/frag"
    (1 to 1000).map(i => (i.toLong, i % 4, s"row $i"))
      .toDF("id", "p", "s")
      .repartition(8).write.partitionBy("p").parquet(frag)
    // data files live under p=0/..p=3/ — nothing at the top level
    val bytes = {
      def walk(f: java.io.File): Long =
        if (f.isFile) { if (f.getName.endsWith(".parquet")) f.length else 0L }
        else f.listFiles().map(walk).sum
      walk(new java.io.File(frag))
    }
    assert(bytes > 0)
    val out = s"$tmp/out"
    val (before, after) = graft.io.Layout.compact(spark, frag, out,
      targetFileBytes = bytes / 3)
    assert(before >= 8L, s"before $before") // every nested part seen
    assert(after >= 3, s"after $after")     // sized from real bytes
    assert(spark.read.parquet(out).count() == 1000L)
    // an input with NO parquet files refuses instead of rewriting
    val emptyDir = s"$tmp/empty"
    new java.io.File(emptyDir).mkdirs()
    val ex = intercept[IllegalArgumentException] {
      graft.io.Layout.compact(spark, emptyDir, s"$tmp/never", 1L << 20)
    }
    assert(ex.getMessage.contains("no parquet data files"))
  }
}
