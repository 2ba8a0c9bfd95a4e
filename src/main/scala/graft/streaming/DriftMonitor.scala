package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Tokenizer-fertility drift monitor over ingest batches — the
  * ALERT-on-drift half of the streaming vocabulary-health story
  * ([[graft.llmdata.Bpe.fertility]] computes the per-document
  * observations; this module decides, per source and ingest bucket,
  * whether fertility has drifted from everything seen before).
  *
  * The statistic is deliberately EXACT-INTEGER: the baseline is the
  * cumulative prior ratio sum(units)/sum(words), and the alert
  * comparison `|batch_ratio / baseline - 1| > tolNum/tolDen` is
  * evaluated as a cross-multiplied integer inequality
  * (`tolDen*bu*pw` vs `(tolDen±tolNum)*bw*pu` in 38-digit decimals /
  * BigInt), so there is NO floating point anywhere in the decision —
  * batch, streaming, and the DuckDB oracle agree bit-for-bit, and a
  * replay of the same stream can never flip an alert. (An EWMA
  * variant would put libm in the decision path; the cumulative-prior
  * form is the exact one, and at 100 TB the state is still just two
  * longs per source.)
  *
  * Streaming form: state per source is (cum words, cum units) — two
  * longs, no per-document retention — and observations fold in
  * ascending `batch_id` order WITHIN each micro-batch, so output is
  * invariant to how the stream is sliced into micro-batches (one
  * bucket per trigger or all at once yield identical rows;
  * DriftSpec pins both against the batch plan).
  */
object DriftMonitor {

  /** One fertility observation: a document (or pre-aggregated shard)
    * of `n_words` words encoding to `n_units` tokenizer units.
    */
  case class DriftObs(source: String, batch_id: Long, n_words: Long,
      n_units: Long)

  /** Cumulative per-source state carried across micro-batches. */
  case class DriftState(words: Long, units: Long)

  /** One monitor verdict: the bucket's own fertility vs the
    * cumulative prior baseline. `baseline` is None on the first
    * bucket of a source (no prior), and `drifted` is false there.
    */
  case class DriftRow(source: String, batch_id: Long,
      batch_words: Long, batch_units: Long, prior_words: Long,
      prior_units: Long, fertility: Double, baseline: Option[Double],
      drifted: Boolean)

  /** Exact two-sided drift test: true iff
    * `bu/bw` lies outside `[ (1 - tolNum/tolDen), (1 + tolNum/tolDen) ] * pu/pw`.
    */
  private[graft] def drifted(bw: Long, bu: Long, pw: Long,
      pu: Long, tolNum: Long, tolDen: Long): Boolean = {
    if (pw == 0L || bw == 0L) false
    else {
      val l = BigInt(bu) * BigInt(pw) * BigInt(tolDen)
      val r = BigInt(bw) * BigInt(pu)
      l > (BigInt(tolDen + tolNum) * r) ||
        l < (BigInt(tolDen - tolNum) * r)
    }
  }

  /** Batch form of the monitor (the oracle-checkable twin): fold
    * observations to (source, bucket), window the cumulative prior
    * sums, and evaluate the exact integer alert. `obs` needs columns
    * `(source, batch_id, n_words, n_units)`; the decision arithmetic
    * runs in decimal(38,0) so corpus-scale products cannot overflow.
    */
  def report(obs: DataFrame, tolNum: Long, tolDen: Long): DataFrame = {
    require(tolNum >= 0 && tolDen > 0 && tolNum <= tolDen,
      s"tolerance must satisfy 0 <= tolNum <= tolDen, got $tolNum/$tolDen")
    val grouped = obs.groupBy(col("source"), col("batch_id"))
      .agg(sum(col("n_words")).as("batch_words"),
        sum(col("n_units")).as("batch_units"))
    val w = Window.partitionBy(col("source")).orderBy(col("batch_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val d = "decimal(38,0)"
    val bw = col("batch_words").cast(d)
    val bu = col("batch_units").cast(d)
    val pw = col("prior_words").cast(d)
    val pu = col("prior_units").cast(d)
    grouped
      .withColumn("prior_words",
        coalesce(sum(col("batch_words")).over(w), lit(0L)))
      .withColumn("prior_units",
        coalesce(sum(col("batch_units")).over(w), lit(0L)))
      .withColumn("fertility",
        col("batch_units").cast("double") /
          col("batch_words").cast("double"))
      .withColumn("baseline",
        when(col("prior_words") === 0L, lit(null).cast("double"))
          .otherwise(col("prior_units").cast("double") /
            col("prior_words").cast("double")))
      .withColumn("drifted",
        when(col("prior_words") === 0L || col("batch_words") === 0L,
          lit(false))
          .otherwise(
            bu * pw * lit(tolDen) > bw * pu * lit(tolDen + tolNum) ||
            bu * pw * lit(tolDen) < bw * pu * lit(tolDen - tolNum)))
  }

  /** Streaming form: identical rows to [[report]] for the same
    * observations, state bounded at two longs per source. Works over
    * a bounded Dataset too (one group pass) — DriftSpec drives both
    * and a real MemoryStream through it.
    *
    * The per-(source, micro-batch) buffer is the bucket list of that
    * trigger — bounded by buckets per trigger, not by documents,
    * when observations are pre-aggregated; raw per-document
    * observations are also fine (they fold into their bucket first).
    */
  def monitor(obs: Dataset[DriftObs], tolNum: Long,
      tolDen: Long): Dataset[DriftRow] = {
    require(tolNum >= 0 && tolDen > 0 && tolNum <= tolDen,
      s"tolerance must satisfy 0 <= tolNum <= tolDen, got $tolNum/$tolDen")
    import obs.sparkSession.implicits._
    obs.groupByKey(_.source)
      .flatMapGroupsWithState[DriftState, DriftRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, rows: Iterator[DriftObs],
         state: GroupState[DriftState]) =>
          val prev = state.getOption.getOrElse(DriftState(0L, 0L))
          var pw = prev.words
          var pu = prev.units
          val byBucket = rows.toSeq.groupBy(_.batch_id).toSeq
            .sortBy(_._1)
          val out = byBucket.map { case (bid, rs) =>
            var bw = 0L; var bu = 0L
            rs.foreach { r => bw += r.n_words; bu += r.n_units }
            val row = DriftRow(src, bid, bw, bu, pw, pu,
              bu.toDouble / bw.toDouble,
              if (pw == 0L) None else Some(pu.toDouble / pw.toDouble),
              drifted(bw, bu, pw, pu, tolNum, tolDen))
            pw += bw; pu += bu
            row
          }
          state.update(DriftState(pw, pu))
          out.iterator
      }
  }
}
