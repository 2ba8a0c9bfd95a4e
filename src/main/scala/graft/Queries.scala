package graft

import graft.QH._
import org.apache.spark.sql.functions._

/** The query catalog: name -> (query fn, optional DuckDB oracle SQL).
  *
  * Conventions for oracle hash-match (the driver sorts columns by name
  * and hashes values):
  *   - identical column NAMES both sides (every computed column
  *     aliased);
  *   - deterministic total row order on both sides (ORDER BY a unique
  *     key);
  *   - floating aggregates go through QH's exact-decimal accumulators
  *     (bit-identical across engines); genuinely floating outputs
  *     (corr, softmax, exp/log paths) are rounded identically on both
  *     sides;
  *   - rank-like ints cast to BIGINT to match DuckDB window results;
  *   - hash-based operators (minhash/simhash/xxhash64) have no DuckDB
  *     equivalent -> rows-only entries (no oracle SQL).
  */
object Queries {

  /** TPC-H Q1 shape: the flagship scan -> grouped aggregate. */
  private val q14: Q = (
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

  val all: Map[String, Q] =
    QueriesRelational.all ++
      QueriesAgg.all ++
      QueriesExpr.all ++
      QueriesML.all ++
      QueriesLLM.all ++
      QueriesStream.all ++
      QueriesStats.all +
      ("q14_groupby_agg" -> q14)
}
