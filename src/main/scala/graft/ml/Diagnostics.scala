package graft.ml

import org.apache.spark.ml.Transformer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model diagnostics needing a fitted model (the rest of diags.go
  * lives in graft.functions.Stats as plain aggregates).
  */
object Diagnostics {

  /** A deterministic linear scorer as a [[Transformer]]: prediction =
    * intercept + sum(w_i * col_i), evaluated on plain columns (no
    * vector assembly, no fitted state) in the declared weight order.
    * The serve-only twin of a fitted regression for pipelines where
    * the score must be an engine-replayable closed form — exactly the
    * q144/q145 exact-serving rule, lifted to the Transformer surface
    * so [[marginal]] and friends accept it.
    */
  class LinearModel(val weights: Seq[(String, Double)],
      val intercept: Double) extends Transformer {
    override val uid: String =
      org.apache.spark.ml.util.Identifiable.randomUID("graftLinear")
    override def transform(ds: org.apache.spark.sql.Dataset[_]): DataFrame =
      ds.withColumn("prediction", weights.foldLeft(lit(intercept)) {
        case (acc, (c, w)) => acc + col(c) * lit(w)
      })
    override def transformSchema(schema: org.apache.spark.sql.types.StructType)
        : org.apache.spark.sql.types.StructType =
      schema.add("prediction", org.apache.spark.sql.types.DoubleType)
    override def copy(extra: org.apache.spark.ml.param.ParamMap)
        : LinearModel = new LinearModel(weights, intercept)
  }

  /** Marginal effects (reference diags.go:534-731): segment the data
    * by model-score quantiles, take each segment's median feature
    * vector, sweep ONE feature across its global quantiles, and
    * re-predict — the per-segment response curve for that feature.
    *
    * The reference loops slices on the driver; here it is one scoring
    * pass, one grouped median, a (nSeg x sweepPoints) literal grid,
    * and one batch predict over the tiny grid. Continuous features
    * only (categoricals would need per-level grids).
    *
    * `tiebreak` columns extend the segment ordering past the score —
    * pass a unique key set when scores can tie, or tied rows land in
    * arrival order (the standard SQL ntile caveat). `exactMedians`
    * swaps the scale-path percentile_approx for the exact percentile
    * aggregate: segment medians become engine-replayable (DuckDB's
    * quantile_cont) at the cost of collecting each segment's values
    * into the aggregation state — fine for bounded/audit runs, not
    * the 100 TB default. `sweepErr` is the sweep-quantile sketch's
    * relative rank error (GK); 0.0 forces exact discrete quantiles
    * for the oracle twin, the 1e-4 default keeps sketch state bounded
    * at scale. `auditRankTol > 0` (sketch-median path only) verifies
    * the GK promise in-plan: each segment median estimate's TRUE rank
    * interval [count(<est)+1, count(<=est)] must overlap
    * n*(0.5 ± tol) or the query raises — the q130 rank-contract gate
    * applied to the path that actually runs at 100 TB.
    */
  def marginal(model: Transformer, df: DataFrame,
      ctsFeatures: Seq[String], sweepFeature: String,
      nSeg: Int = 6, sweepPoints: Int = 5,
      tiebreak: Seq[org.apache.spark.sql.Column] = Nil,
      exactMedians: Boolean = false, sweepErr: Double = 1e-4,
      auditRankTol: Double = 0.0,
      medianAccuracy: Int = 10000): DataFrame = {
    require(ctsFeatures.contains(sweepFeature),
      "sweepFeature must be one of ctsFeatures")
    require(sweepErr >= 0 && sweepErr < 1, s"sweepErr $sweepErr")
    val doAudit = !exactMedians && auditRankTol > 0
    // segment by exact ntile over the score WITHOUT a global
    // single-partition window (ScanOps.ntile: ranged rank +
    // closed-form bucket)
    val scored0 = graft.ops.ScanOps.ntile(model.transform(df),
      col("prediction").asc +: tiebreak.map(_.asc), nSeg, "__seg")
    // the audit re-reads the scored stream to rank the estimates
    val scored = if (doAudit) graft.Caches.pin(scored0) else scored0
    def med(f: String) =
      if (exactMedians) percentile(col(f), lit(0.5)).as(f)
      else percentile_approx(col(f), lit(0.5), lit(medianAccuracy)).as(f)
    val medians0 = scored.groupBy(col("__seg"))
      .agg(med(ctsFeatures.head), ctsFeatures.tail.map(med): _*)
    val medians = if (!doAudit) medians0 else {
      val est = medians0.select(col("__seg") +:
        ctsFeatures.map(f => col(f).as(s"__m_$f")): _*)
      val aggs = ctsFeatures.flatMap(f => Seq(
        first(col(s"__m_$f")).as(s"__m_$f"),
        count(when(col(f) < col(s"__m_$f"), 1)).as(s"__lt_$f"),
        count(when(col(f) <= col(s"__m_$f"), 1)).as(s"__le_$f")))
      val ranked = scored.join(broadcast(est), Seq("__seg"))
        .groupBy(col("__seg"))
        .agg(count(lit(1)).as("__n"), aggs: _*)
      ctsFeatures.foldLeft(ranked) { (acc, f) =>
        acc.withColumn(f,
          when((col(s"__lt_$f") + lit(1)).cast("double") >
              lit(0.5 + auditRankTol) * col("__n") ||
              col(s"__le_$f").cast("double") <
              lit(0.5 - auditRankTol) * col("__n"),
            raise_error(concat(
              lit(s"marginal: sketch median of $f in segment "),
              col("__seg"), lit(" has rank ["),
              col(s"__lt_$f") + lit(1), lit(","), col(s"__le_$f"),
              lit(s"] outside n*(0.5 +- $auditRankTol) — GK broke "),
              lit("its contract"))).cast("double"))
            .otherwise(col(s"__m_$f")))
      }.select(col("__seg") +: ctsFeatures.map(col): _*)
    }
    val probs = (0 until sweepPoints)
      .map(i => i.toDouble / (sweepPoints - 1)).toArray
    val sweeps = df.stat.approxQuantile(sweepFeature, probs, sweepErr)
      .distinct
    val sweepDf = df.sparkSession
      .createDataFrame(sweeps.map(Tuple1(_)).toSeq)
      .toDF("__sweep")
    val grid = medians.crossJoin(sweepDf)
      .withColumn(sweepFeature, col("__sweep"))
    model.transform(grid)
      .select(col("__seg").as("segment"),
        col("__sweep").as(s"${sweepFeature}_value"),
        col("prediction"))
      .orderBy(col("segment"), col(s"${sweepFeature}_value"))
  }
}
