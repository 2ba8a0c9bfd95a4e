package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One progressive Mantel-Haenszel readout: the pooled OR / χ² / p
  * over everything ingested through bucket `batch_id`, strata with
  * cumulative n_s ≥ 2 only (below that V is undefined and the
  * stratum is PENDING — the batch/stream shared contract).
  */
case class MhRow(batch_id: Long, n_strata: Long, n: Long,
    a_total: Long, or_mh: Option[Double], chi2_mh: Option[Double],
    p_value: Option[Double])

private[streaming] case class MhState(lastBucket: Long,
    cells: Map[String, (Long, Long, Long, Long)])

/** STREAMING MANTEL-HAENSZEL — the ingest-time twin of
  * [[graft.ops.Experiment.mantelHaenszelProgressive]]: subject rows
  * (bucket, stratum, exposed, outcome) arrive bucket by bucket and
  * each bucket close emits the pooled stratified-A/B verdict over
  * the CUMULATIVE per-stratum 2×2 cells — completing the
  * batch/stream symmetry the drift (q139/q374), fertility, and Elo
  * (q388/q392) families already have, for the stratified A/B
  * (q394) family.
  *
  * Stream == batch bit-for-bit: the per-stratum ratio terms are
  * computed in the EXACT operand order of
  * [[graft.ops.Experiment.mhAggExprs]] (double products of the
  * long cells), quantized to decimal scale 6 with the same HALF_UP
  * rule Spark's double→decimal(38,6) cast applies, summed exactly,
  * and closed with the same fixed-shape double arithmetic
  * ([[phiAbsD]] mirrors [[graft.ops.Experiment.phiAbs]] literally) —
  * so any order-respecting micro-batch slicing reproduces the batch
  * rows and the oracle is the progressive form's SQL
  * (StreamingMhSpec pins slicings, pending-strata entry, and
  * last-row == strict [[graft.ops.Experiment.mantelHaenszel]]).
  *
  * The state is ONE group holding the strata cell table — four
  * longs per stratum, bounded by `maxStrata` as the fold runs,
  * never data-sized (the Elo-stream precedent: the pooled readout
  * needs every stratum's current cells, which a per-stratum key
  * could not see). Subject order WITHIN a bucket is immaterial
  * (cells are commutative counts); ACROSS triggers buckets must
  * arrive strictly increasing — equal buckets must share a trigger
  * — and violations fail fast. Buckets where no stratum has
  * n_s ≥ 2 yet emit nothing (matching the batch groupBy, which has
  * no qualifying rows there). For unbounded stratum universes use
  * the batch path, which censuses before pooling.
  */
object MhStream {

  /** Scalar mirror of [[graft.ops.Experiment.phiAbs]] — identical
    * literals and operation order, so both paths produce the same
    * double bit pattern.
    */
  private[graft] def phiAbsD(z: Double): Double = {
    val t = 1.0 / (1.0 + 0.2316419 * z)
    val poly = t * (0.319381530 +
      t * (-0.356563782 +
        t * (1.781477937 +
          t * (-1.821255978 + t * 1.330274429))))
    1.0 - math.exp(-(z * z) / 2.0) / 2.5066282746310002 * poly
  }

  /** Spark's double→decimal(38,6) cast, scalar: Double.toString
    * canonicalization then HALF_UP at scale 6 (what
    * `Decimal.set(BigDecimal(d)).changePrecision(38, 6)` does).
    */
  private def q6(x: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP)

  /** Spark's `round(col, 6)` on a double, scalar (Round passes
    * NaN/Infinity through untouched).
    */
  private def round6(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  /** The bucket close over the cumulative cell table: pool strata
    * with n_s ≥ 2; None when none qualify.
    */
  private def close(bucket: Long,
      cells: Map[String, (Long, Long, Long, Long)])
      : Option[MhRow] = {
    val qualified = cells.valuesIterator
      .filter { case (a, b, c, d) => a + b + c + d >= 2L }.toArray
    if (qualified.isEmpty) None
    else {
      var nStrata = 0L
      var nTot = 0L
      var aTot = 0L
      val zero = java.math.BigDecimal.ZERO.setScale(6)
      var adS = zero; var bcS = zero; var eS = zero; var vS = zero
      qualified.foreach { case (a, b, c, d) =>
        val n = a + b + c + d
        nStrata += 1L; nTot += n; aTot += a
        val nD = n.toDouble
        val r1 = (a + b).toDouble
        val r2 = (c + d).toDouble
        val c1 = (a + c).toDouble
        val c2 = (b + d).toDouble
        adS = adS.add(q6(a.toDouble * d.toDouble / nD))
        bcS = bcS.add(q6(b.toDouble * c.toDouble / nD))
        eS = eS.add(q6(r1 * c1 / nD))
        vS = vS.add(q6(r1 * r2 * c1 * c2 /
          (nD * nD * (nD - 1.0))))
      }
      val orMh =
        if (bcS.doubleValue > 0.0)
          Some(round6(adS.doubleValue / bcS.doubleValue))
        else None
      val (chi2, p) =
        if (vS.doubleValue > 0.0) {
          val gap = aTot.toDouble - eS.doubleValue
          val x2 = gap * gap / vS.doubleValue
          (Some(round6(x2)),
            Some(round6(2.0 * (1.0 - phiAbsD(math.sqrt(x2))))))
        } else (None, None)
      Some(MhRow(bucket, nStrata, nTot, aTot, orMh, chi2, p))
    }
  }

  def mhStream(obs: DataFrame, bucketCol: String,
      stratumCol: String, exposedCol: String, outcomeCol: String,
      maxStrata: Int = 10000): Dataset[MhRow] = {
    val ss = obs.sparkSession
    import ss.implicits._
    obs.select(col(bucketCol).cast("long").as("bid"),
        col(stratumCol).cast("string").as("s"),
        col(exposedCol).cast("boolean").as("e"),
        col(outcomeCol).cast("boolean").as("o"))
      .where(col("bid").isNotNull && col("s").isNotNull &&
        col("e").isNotNull && col("o").isNotNull)
      .as[(Long, String, Boolean, Boolean)]
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[MhState, MhRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, it: Iterator[(Long, String, Boolean, Boolean)],
         state: GroupState[MhState]) =>
          val batch = it.toArray
          var st = state.getOption.getOrElse(
            MhState(Long.MinValue, Map.empty))
          val out = Vector.newBuilder[MhRow]
          if (batch.nonEmpty) {
            val byBucket = batch.groupBy(_._1).toSeq.sortBy(_._1)
            require(byBucket.head._1 > st.lastBucket,
              s"mhStream: out-of-order arrival (bucket " +
                s"${byBucket.head._1} after ${st.lastBucket}) — " +
                "equal buckets must share a trigger")
            var cells = st.cells
            byBucket.foreach { case (bid, rs) =>
              rs.foreach { case (_, s, e, o) =>
                val (a, b, c, d) =
                  cells.getOrElse(s, (0L, 0L, 0L, 0L))
                val upd =
                  if (e && o) (a + 1L, b, c, d)
                  else if (e) (a, b + 1L, c, d)
                  else if (o) (a, b, c + 1L, d)
                  else (a, b, c, d + 1L)
                cells = cells.updated(s, upd)
                require(cells.size <= maxStrata,
                  s"mhStream: ${cells.size} strata > maxStrata " +
                    s"$maxStrata — use the batch census path")
              }
              close(bid, cells).foreach(out += _)
              st = MhState(bid, cells)
            }
            state.update(st)
          }
          out.result().iterator
      }
  }
}
