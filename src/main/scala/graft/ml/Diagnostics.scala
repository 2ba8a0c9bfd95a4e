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
    * the 100 TB default.
    */
  def marginal(model: Transformer, df: DataFrame,
      ctsFeatures: Seq[String], sweepFeature: String,
      nSeg: Int = 6, sweepPoints: Int = 5,
      tiebreak: Seq[org.apache.spark.sql.Column] = Nil,
      exactMedians: Boolean = false): DataFrame = {
    require(ctsFeatures.contains(sweepFeature),
      "sweepFeature must be one of ctsFeatures")
    // segment by exact ntile over the score WITHOUT a global
    // single-partition window (ScanOps.ntile: ranged rank +
    // closed-form bucket)
    val scored = graft.ops.ScanOps.ntile(model.transform(df),
      col("prediction").asc +: tiebreak.map(_.asc), nSeg, "__seg")
    def med(f: String) =
      if (exactMedians) percentile(col(f), lit(0.5)).as(f)
      else percentile_approx(col(f), lit(0.5), lit(10000)).as(f)
    val medians = scored.groupBy(col("__seg"))
      .agg(med(ctsFeatures.head), ctsFeatures.tail.map(med): _*)
    val probs = (0 until sweepPoints)
      .map(i => i.toDouble / (sweepPoints - 1)).toArray
    val sweeps = df.stat.approxQuantile(sweepFeature, probs, 0.0).distinct
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
