package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The query catalog: name -> (query fn, optional DuckDB oracle SQL).
  *
  * Conventions for oracle hash-match (driver sorts columns by name and
  * hashes values):
  *   - identical column NAMES both sides (alias every computed column);
  *   - deterministic row set: every query ends in an unambiguous ORDER BY
  *     or is a grouped result (driver-side sort handles row order);
  *   - floating aggregates over many rows go through an exact-decimal
  *     sum (`dsum`) then back to double — bit-identical across engines;
  *   - genuinely floating outputs (stddev, corr, softmax) are rounded to
  *     a fixed number of decimals on BOTH sides;
  *   - rank-like ints are cast to BIGINT on the Spark side to match
  *     DuckDB's BIGINT window results.
  */
object Queries {

  /** Exact sum of a money-like double: associate via decimal(25,6) so the
    * result is order-independent, then return to double. Matches DuckDB's
    * `CAST(sum(CAST(x AS DECIMAL(25,6))) AS DOUBLE)` bit-for-bit.
    */
  def dsum(c: Column): Column = sum(c.cast("decimal(25,6)")).cast("double")

  /** Exact-sum-then-double-divide: deterministic avg across engines
    * (decimal division would truncate scale differently per engine).
    */
  def davg(c: Column): Column =
    sum(c.cast("decimal(25,6)")).cast("double") / count(c)

  /** DuckDB-side spellings of dsum/davg. */
  def sqlDsum(e: String): String =
    s"CAST(sum(CAST($e AS DECIMAL(25,6))) AS DOUBLE)"
  def sqlDavg(e: String): String =
    s"CAST(sum(CAST($e AS DECIMAL(25,6))) AS DOUBLE) / count($e)"

  type QFn = (SparkSession, String) => DataFrame

  private def read(s: SparkSession, dir: String, table: String): DataFrame =
    s.read.parquet(s"$dir/$table.parquet")

  // ---------------------------------------------------------------------
  // Aggregations (SURVEY §2.7)
  // ---------------------------------------------------------------------

  /** TPC-H Q1-style grouped aggregate: the flagship scan→agg pipeline.
    * Reference analog: summary functions sum/mean/count over slices
    * (seafan parser.go:749-760 + slicer iteration) collapsed into one
    * hash aggregate with map-side partial aggregation.
    */
  private val q14: (QFn, Option[String]) = (
    (s, dir) =>
      read(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some(s"""
      SELECT l_returnflag, l_linestatus,
             ${sqlDsum("l_quantity")} AS sum_qty,
             ${sqlDsum("l_extendedprice")} AS sum_base_price,
             ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
             ${sqlDavg("l_quantity")} AS avg_qty,
             ${sqlDavg("l_discount")} AS avg_disc,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  // ---------------------------------------------------------------------
  val all: Map[String, (QFn, Option[String])] = Map(
    "q14_groupby_agg" -> q14
  )
}
