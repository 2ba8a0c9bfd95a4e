package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep per-group MERGEABLE state
  * (count, exact decimal sum, min, max) so a new batch of rows
  * updates a standing aggregate by merging two small state tables —
  * never by re-scanning the history. This is the batch counterpart
  * of Structured Streaming's stateful aggregation and the pattern
  * behind every incremental ETL/rollup at scale: at 100 TB the
  * history scan is the cost you build the state table to avoid;
  * merging states costs the size of the GROUPS, not the data.
  *
  * The state columns are chosen to be associative-commutative
  * monoids (count/sum add, min/max lattice-join), so merge order and
  * batch slicing can never change the result — and the sum is the
  * repo's exact-decimal accumulator, so a merged state is
  * bit-identical to a from-scratch aggregate, spec- and
  * oracle-pinned.
  */
object Incremental {

  /** Per-group mergeable state for `valueCol` grouped by `keys`. */
  def aggState(df: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      count(col(valueCol)).as("cnt"),
      sum(col(valueCol).cast("decimal(25,6)")).as("sum_dec"),
      min(col(valueCol)).as("vmin"),
      max(col(valueCol)).as("vmax"))

  /** Merge any number of state tables (associative + commutative —
    * slicing-invariant by construction).
    */
  def merge(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "merge: at least one state")
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*).agg(
        sum(col("cnt")).as("cnt"),
        sum(col("sum_dec")).as("sum_dec"),
        min(col("vmin")).as("vmin"),
        max(col("vmax")).as("vmax"))
  }

  /** Collapse state to the user-facing aggregate row (double sum/avg
    * derived with the repo's exact-sum-then-double-divide
    * convention).
    */
  def finish(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(keys.map(col) ++ Seq(
      col("cnt"),
      col("sum_dec").cast("double").as("total"),
      (col("sum_dec").cast("double") / col("cnt")).as("avg"),
      col("vmin"), col("vmax")): _*)
}
