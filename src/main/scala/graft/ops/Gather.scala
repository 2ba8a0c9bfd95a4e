package graft.ops

import graft.frame.SeaFrame
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's vector-indexing operators that need a join rather
  * than a Column expression (SURVEY §2.8).
  */
object Gather {

  /** index(x, idx): gather x at positions idx (reference
    * data.go:641-660; errors on out-of-bounds). Implemented as an
    * equi-join of the index column against the frame's sequence —
    * distributed, no collect.
    */
  /** `smallIdxSet = true` declares that the gather touches a BOUNDED
    * set of distinct positions (the reference's common "look up a few
    * rows" shape): the values side is pre-pruned to the distinct
    * index set, whose runtime size AQE then sees — both joins turn
    * into broadcasts and the fact rows never shuffle. With a
    * row-count-sized index set the pruning is a wasted narrow
    * shuffle, so the default stays the plain equi-join.
    */
  def index(frame0: SeaFrame, xCol: String, idxCol: String,
      smallIdxSet: Boolean = false): DataFrame = {
    val frame = frame0.materialized // a declared-lazy order is fine too
    val seqC = frame.seqCol.getOrElse(throw new IllegalStateException(
      "index() needs an explicit row order"))
    val values0 = frame.df.select(col(seqC).as("__pos"), col(xCol)
      .as("__val"))
    val values = if (!smallIdxSet) values0 else {
      val needed = frame.df
        .select(col(idxCol).cast("long").as("__need"))
        .where(col("__need").isNotNull).distinct()
      // the caller declared the set bounded — force the broadcast
      // (the zip output is an RDD scan with no stats for AQE to act on)
      broadcast(values0.join(broadcast(needed),
        col("__pos") === col("__need"), "left_semi"))
    }
    // zip-produced frames carry their count — no extra job
    val n = frame.knownCount.getOrElse(frame.df.count())
    val joined = frame.df
      .withColumn("__idx", col(idxCol).cast("long"))
      .join(values, col("__idx") === col("__pos"), "left")
    // the bounds check lives INSIDE the output column so it cannot be
    // pruned away (a dropped side-column would be optimized out)
    val vt = values.schema("__val").dataType
    joined.withColumn(s"${xCol}_at_${idxCol}",
        when(col("__idx") < 0 || col("__idx") >= n,
          raise_error(concat(lit("index(): position out of bounds: "),
            col("__idx").cast("string"))).cast(vt))
          .otherwise(col("__val")))
      .drop("__pos", "__val", "__idx")
  }

  /** range(a, b): integer sequence a..b (exclusive), direction-aware
    * (reference parser.go:682-723) — a 1-column pipe built from
    * spark.range, with its order column.
    */
  def rangePipe(spark: SparkSession, a: Long, b: Long): SeaFrame = {
    val df =
      if (a <= b) spark.range(a, b).toDF("value")
      else spark.range(b + 1, a + 1).toDF("value")
        .orderBy(col("value").desc)
    SeaFrame.withSequence(df, Seq(
      if (a <= b) col("value").asc else col("value").desc))
  }

  /** one2Many: replicate a 1-row pipe to n rows (reference
    * parser.go:1661-1691, used to combine scalar pipes with vector
    * expressions) — a cross join against spark.range, no driver loop.
    */
  def one2Many(frame: SeaFrame, n: Long): SeaFrame = {
    require(frame.knownCount.getOrElse(frame.df.count()) == 1,
      "one2Many: pipe must have exactly 1 row")
    val spark = frame.spark
    val expanded = frame.result.crossJoin(
      spark.range(n).toDF(SeaFrame.SEQ))
    SeaFrame(expanded, frame.schema, Some(SeaFrame.SEQ))
  }
}
