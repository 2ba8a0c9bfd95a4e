package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the query catalog: readers plus cross-engine
  * deterministic aggregation.
  *
  * Doubles summed in different orders differ in the last ulps, so any
  * floating aggregate that must hash-match a DuckDB oracle goes
  * through an exact decimal accumulator and returns to double only at
  * the end; derived statistics (avg, stddev) are then computed with
  * the SAME double-arithmetic formula on both engines, making them
  * bit-identical without rounding.
  */
object QH {
  type QFn = (SparkSession, String) => DataFrame
  type Q = (QFn, Option[String])

  /** Normalize an events-shaped `ts` column to TIMESTAMP (LTZ),
    * whatever the parquet encoding of the generated data:
    * TIMESTAMP(NANOS) surfaces as long under nanosAsLong sessions
    * (truncate to micros, matching DuckDB's ns->us cast);
    * MICROS-not-adjusted-to-UTC infers as TIMESTAMP_NTZ (cast — the
    * session timezone is pinned UTC, so wall values are unchanged and
    * the column becomes watermarkable, which streaming requires).
    */
  def normalizeTs(df: DataFrame): DataFrame =
    if (!df.columns.contains("ts")) df
    else df.schema("ts").dataType.typeName match {
      case "long" =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case "timestamp_ntz" =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }

  /** Table reader (ts-normalizing, see [[normalizeTs]]). */
  def read(s: SparkSession, dir: String, table: String): DataFrame =
    normalizeTs(s.read.parquet(s"$dir/$table.parquet"))

  /** Spread a small single-row-group scan across all cores before
    * CPU-heavy per-row work (text analysis, hashing). At production
    * scale multi-row-group files parallelize naturally and this is a
    * no-op decision for the caller.
    */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Exact order-independent sum of a money-like double. */
  def dsum(c: Column): Column = sum(c.cast("decimal(25,6)")).cast("double")
  def sqlDsum(e: String): String =
    s"CAST(sum(CAST($e AS DECIMAL(25,6))) AS DOUBLE)"

  /** Exact-sum, double-divide average. */
  def davg(c: Column): Column = dsum(c) / count(c)
  def sqlDavg(e: String): String = s"${sqlDsum(e)} / count($e)"

  /** Exact sum of squares (wider scale for the squared magnitude). */
  def dsumsq(c: Column): Column =
    sum((c.cast("double") * c.cast("double")).cast("decimal(38,10)"))
      .cast("double")
  def sqlDsumsq(e: String): String =
    s"CAST(sum(CAST(CAST($e AS DOUBLE) * CAST($e AS DOUBLE) AS DECIMAL(38,10))) AS DOUBLE)"

  /** Deterministic sample stddev from exact sums:
    * sqrt((S2 - S1^2/n) / (n-1)) evaluated in identical double ops on
    * both engines.
    */
  def dstd(c: Column): Column = {
    val s1 = dsum(c); val s2 = dsumsq(c); val n = count(c).cast("double")
    sqrt((s2 - s1 * s1 / n) / (n - lit(1.0)))
  }
  def sqlDstd(e: String): String = {
    val s1 = sqlDsum(e); val s2 = sqlDsumsq(e)
    s"sqrt(($s2 - $s1 * $s1 / count($e)) / (count($e) - 1.0))"
  }
}
