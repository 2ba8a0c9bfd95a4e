package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Warehouse maintenance operators: slowly-changing-dimension
  * history and keyed upsert (the MERGE INTO core) — the mutation
  * patterns a lakehouse table format implements, expressed as pure
  * relational transforms so they run (and verify) on any engine.
  */
object Scd {

  /** Type-2 slowly-changing-dimension history from a change stream:
    * one row per (key, state VERSION) with `valid_from`/`valid_to`
    * ([from, to) interval; open version has NULL valid_to).
    * Consecutive events whose tracked attributes are UNCHANGED
    * collapse into the version that opened them — only actual
    * transitions cut a new row (the textbook SCD2 contract).
    *
    * Shape: everything runs in per-key windows ordered by
    * (ts, tiebreak) — one shuffle on the key, the same inherent
    * per-key bound sessionize rides; change detection is a lag
    * comparison, version close a lead. No joins, no state.
    */
  def scd2(df: DataFrame, key: String, ts: String, tiebreak: String,
      attrs: Seq[String]): DataFrame = {
    require(attrs.nonEmpty, "scd2: at least one tracked attribute")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(col(ts), col(tiebreak))
    // a version opens where any tracked attribute differs from the
    // previous event (null-safe: <=> catches null transitions)
    val changed = attrs.map(a =>
      !(col(a) <=> lag(col(a), 1).over(w))).reduce(_ || _)
    val opens = df.withColumn("__open",
      when(lag(col(ts), 1).over(w).isNull || changed, 1L).otherwise(0L))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(col(ts), col(tiebreak))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    opens.withColumn("__ver", sum(col("__open")).over(w2))
      .where(col("__open") === 1L)
      .withColumn("valid_to", lead(col(ts), 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(key)).orderBy(col("__ver"))))
      .select(Seq(col(key), col("__ver").as("version"),
        col(ts).as("valid_from"), col("valid_to")) ++
        attrs.map(col): _*)
  }

  /** Keyed UPSERT (the relational core of MERGE INTO): rows of
    * `updates` replace same-key rows of `target`; unmatched update
    * keys insert. Expressed as a full outer join with
    * update-side-wins coalescing — one co-partitioned shuffle on the
    * key, broadcastable when the delta is small (the common case at
    * scale: a day's changes against years of history).
    */
  def upsert(target: DataFrame, updates: DataFrame,
      key: String): DataFrame = {
    require(target.columns.sameElements(updates.columns),
      s"upsert: schemas must match, ${target.columns.toSeq} vs " +
        s"${updates.columns.toSeq}")
    val t = target.columns.foldLeft(target)((d, c) =>
      d.withColumnRenamed(c, s"__t_$c"))
    val u = updates.columns.foldLeft(updates)((d, c) =>
      d.withColumnRenamed(c, s"__u_$c"))
    // row-wins (not column-coalesce): an update row replaces the whole
    // target row, nulls included — MERGE's UPDATE SET * contract
    t.join(u, col(s"__t_$key") === col(s"__u_$key"), "full_outer")
      .select(target.columns.map(c =>
        when(col(s"__u_$key").isNotNull, col(s"__u_$c"))
          .otherwise(col(s"__t_$c")).as(c)): _*)
  }

  /** CDC APPLY — fold a timestamped I/U/D change feed onto a base
    * snapshot in ONE pass: the latest change per key wins (ordered by
    * `ts` then `tiebreak`), a latest-op 'D' removes the key, any
    * other latest op replaces the whole row (MERGE's UPDATE SET *
    * rule, like [[upsert]]), and unchanged keys keep their base row.
    *
    * Equivalent to folding the feed through [[upsert]]/delete one
    * timestamp at a time (spec-pinned), but O(changes) instead of
    * O(timestamps) passes: a per-key window picks the winning change
    * (map-side WindowGroupLimit — the rank-1 filter pushes before the
    * key exchange), then one co-partitioned full-outer join applies
    * it. At scale the feed is delta-sized, so the join broadcasts;
    * the streaming twin ([[graft.streaming.Streams.cdcApply]])
    * maintains the same latest-change-wins state incrementally.
    *
    * `changes` must carry `opCol` ('I'/'U'/'D'), `ts`, `tiebreak`,
    * and every `target` column. (ts, tiebreak) must be unique per key
    * or the winner is nondeterministic. Returns target-shaped rows.
    */
  def applyChanges(target: DataFrame, changes: DataFrame, key: String,
      ts: String, tiebreak: String, opCol: String = "op"): DataFrame = {
    val cols = target.columns
    require(cols.contains(key), s"applyChanges: key $key not in target")
    val need = Seq(opCol, ts, tiebreak) ++ cols
    require(need.forall(changes.columns.contains),
      s"applyChanges: changes missing ${need.filterNot(changes.columns.contains).toSeq}")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(col(ts).desc, col(tiebreak).desc)
    val latest = changes.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select((col(opCol).as("__c_op") +:
        cols.map(c => col(c).as(s"__c_$c"))): _*)
    val t = cols.foldLeft(target)((d, c) =>
      d.withColumnRenamed(c, s"__t_$c"))
    t.join(latest, col(s"__t_$key") === col(s"__c_$key"), "full_outer")
      .where(col(s"__c_$key").isNull || col("__c_op") =!= "D")
      .select(cols.map(c =>
        when(col(s"__c_$key").isNotNull, col(s"__c_$c"))
          .otherwise(col(s"__t_$c")).as(c)): _*)
  }

  /** Snapshot DIFF — the inverse of [[upsert]]: compare two versions
    * of a keyed table and emit one row per changed key with
    * `op` = 'I' (key only in new), 'D' (only in old), 'U' (present
    * in both, any column differs — null-safe comparison). Unchanged
    * keys are absent, so the diff is delta-sized, and
    * `upsert(old, diff I+U rows)` minus the D keys reproduces `new`
    * exactly (spec-pinned). One co-partitioned full-outer join —
    * the change-data-feed primitive for auditing what an ingest
    * actually did to 100 TB of state.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame,
      key: String): DataFrame = {
    require(oldDf.columns.sameElements(newDf.columns),
      s"diff: schemas must match, ${oldDf.columns.toSeq} vs " +
        s"${newDf.columns.toSeq}")
    val cols = oldDf.columns
    val o = cols.foldLeft(oldDf)((d, c) =>
      d.withColumnRenamed(c, s"__o_$c"))
    val n = cols.foldLeft(newDf)((d, c) =>
      d.withColumnRenamed(c, s"__n_$c"))
    val changed = cols.filter(_ != key).map(c =>
      !(col(s"__o_$c") <=> col(s"__n_$c"))).reduceOption(_ || _)
      .getOrElse(lit(false))
    o.join(n, col(s"__o_$key") === col(s"__n_$key"), "full_outer")
      .withColumn("op",
        when(col(s"__o_$key").isNull, "I")
          .when(col(s"__n_$key").isNull, "D")
          .when(changed, "U"))
      .where(col("op").isNotNull)
      .select(col("op") +: cols.map(c =>
        when(col("op") === "D", col(s"__o_$c"))
          .otherwise(col(s"__n_$c")).as(c)): _*)
  }
}
