package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT for scan pruning: Z-order (Morton)
  * clustering — interleave the bits of two sort dimensions so rows
  * close in BOTH columns land in the same files, and a range
  * predicate on either (or both) touches a small fraction of the
  * layout instead of every file. The write-side complement of
  * predicate pushdown: pushdown skips row groups whose min/max
  * stats exclude the filter, and Z-ordering is what makes those
  * stats TIGHT on two columns at once (a single-column sort gives
  * perfect stats on one dimension and useless stats on the other).
  * The technique lakehouse table formats document publicly
  * (Morton-curve clustering); at 100 TB it is the difference
  * between a bounding-box query reading ~sqrt(files) and reading
  * all of them.
  *
  * The z-value is pure integer bit arithmetic built from Column
  * expressions (shifts/masks/or) — whole-stage-codegen'd, no UDF,
  * and exactly recomputable by any engine (the q138 oracle).
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative
    * integer columns: bit i of `a` lands at position 2i, bit i of
    * `b` at 2i+1. Columns are masked to `bits` first, so out-of-range
    * values fold rather than corrupt high bits. bits <= 31 keeps the
    * result in a long without sign trouble.
    */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val am = a.cast("long").bitwiseAND(lit((1L << bits) - 1))
    val bm = b.cast("long").bitwiseAND(lit((1L << bits) - 1))
    (0 until bits).map { i =>
      shiftleft(shiftright(am, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(bm, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** N-dimensional Morton interleave — [[zValue]] generalized: bit i
    * of dimension d lands at position i*D + d, so any prefix of the
    * key still covers a compact hyper-box in all D dimensions.
    * D * bits <= 62 keeps the key in a non-negative long. Same pure
    * codegen'd bit arithmetic, same cross-engine recomputability.
    */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    val d = cols.size
    require(d >= 2, s"zValueN: need >= 2 dims, got $d")
    require(bits >= 1 && d * bits <= 62,
      s"zValueN: $d dims x $bits bits exceeds 62")
    val masked = cols.map(c =>
      c.cast("long").bitwiseAND(lit((1L << bits) - 1)))
    (for {
      i <- 0 until bits
      (m, dim) <- masked.zipWithIndex
    } yield shiftleft(shiftright(m, i).bitwiseAND(lit(1L)),
        i * d + dim))
      .reduce(_ bitwiseOR _)
  }

  /** Write `df` as parquet clustered on the Z-order of (`ca`, `cb`):
    * range-partition on the z-value into `nFiles` files, sort within
    * each, drop the key. Every file then covers a compact square-ish
    * region of the (ca, cb) plane, so per-file min/max stats exclude
    * a bounding-box query everywhere outside the box neighborhood —
    * the [[graft.io.Sources.writeBucketed]] idea applied to RANGE
    * predicates instead of join keys.
    */
  def writeZOrdered(df: DataFrame, path: String, ca: String,
      cb: String, bits: Int, nFiles: Int): Unit =
    df.withColumn("__z", zValue(col(ca), col(cb), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Per-file (min, max) envelopes of two columns for a parquet
    * layout — the audit surface for [[writeZOrdered]]: how many
    * files' envelopes intersect a bounding box is exactly how many
    * files a stats-pruning scan of that box must read.
    */
  def fileEnvelopes(df: DataFrame, ca: String, cb: String): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(min(col(ca)).as("min_a"), max(col(ca)).as("max_a"),
        min(col(cb)).as("min_b"), max(col(cb)).as("max_b"))

  /** Small-file COMPACTION: rewrite a fragmented parquet layout into
    * ceil(totalBytes / targetFileBytes) files. The operational
    * counterpart of the write-side layouts — streaming ingest and
    * fine-grained partitioned writes both accrete kilobyte files, and
    * at 100 TB an uncompacted table turns every scan into millions of
    * opens, tiny row groups, useless min/max stats, and a
    * task-per-file scheduler storm. Sizing from the CURRENT on-disk
    * bytes (a metadata listing, no data read) keeps output files near
    * the target regardless of compression ratio drift.
    *
    * Returns (filesBefore, filesAfter). The rewrite itself is one
    * round-robin repartition — no keys, no skew; use
    * [[writeZOrdered]] / [[graft.io.Sources.writeBucketed]] instead
    * when the layout should also cluster.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
      outPath: String, targetFileBytes: Long): (Long, Int) = {
    require(targetFileBytes > 0, s"targetFileBytes $targetFileBytes")
    val in = new org.apache.hadoop.fs.Path(inPath)
    val fs = in.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // RECURSIVE listing: a hive-partitioned or otherwise nested input
    // keeps its data files under subdirectories — a top-level
    // listStatus would see zero bytes and silently compact the whole
    // dataset into one file
    val parts = {
      val it = fs.listFiles(in, /* recursive = */ true)
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.hadoop.fs.LocatedFileStatus]
      // Skip files under hidden/temporary directories (_temporary,
      // .hive-staging from a concurrent writer) — Hadoop's
      // hiddenFileFilter convention. Counting them double-counts
      // bytes and copies uncommitted data into the output.
      val rootUri = fs.makeQualified(in).toUri
      def hidden(p: org.apache.hadoop.fs.Path): Boolean = {
        // only components BELOW the input root count — the caller's
        // own path is allowed to contain dotted directories
        var cur = p
        var h = false
        while (cur != null && fs.makeQualified(cur).toUri != rootUri
            && !h) {
          val n = cur.getName
          h = n.startsWith("_") || n.startsWith(".")
          cur = cur.getParent
        }
        h
      }
      while (it.hasNext) {
        val f = it.next()
        if (f.isFile && f.getPath.getName.endsWith(".parquet") &&
          !hidden(f.getPath)) buf += f
      }
      buf.toArray
    }
    require(parts.nonEmpty,
      s"compact: no parquet data files under $inPath")
    val totalBytes = parts.map(_.getLen).sum
    val nOut = math.max(1L,
      (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(inPath).repartition(nOut)
      .write.mode("overwrite").parquet(outPath)
    (parts.length.toLong, nOut)
  }
}
