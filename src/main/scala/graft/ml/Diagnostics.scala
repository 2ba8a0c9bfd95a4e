package graft.ml

import org.apache.spark.ml.Transformer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model diagnostics needing a fitted model (the rest of diags.go
  * lives in graft.functions.Stats as plain aggregates).
  */
object Diagnostics {

  /** Marginal effects (reference diags.go:534-731): segment the data
    * by model-score quantiles, take each segment's median feature
    * vector, sweep ONE feature across its global quantiles, and
    * re-predict — the per-segment response curve for that feature.
    *
    * The reference loops slices on the driver; here it is one scoring
    * pass, one grouped median, a (nSeg x sweepPoints) literal grid,
    * and one batch predict over the tiny grid. Continuous features
    * only (categoricals would need per-level grids).
    */
  def marginal(model: Transformer, df: DataFrame,
      ctsFeatures: Seq[String], sweepFeature: String,
      nSeg: Int = 6, sweepPoints: Int = 5): DataFrame = {
    require(ctsFeatures.contains(sweepFeature),
      "sweepFeature must be one of ctsFeatures")
    // segment by exact ntile over the score WITHOUT a global
    // single-partition window (ScanOps.ntile: ranged rank +
    // closed-form bucket)
    val scored = graft.ops.ScanOps.ntile(model.transform(df),
      Seq(col("prediction").asc), nSeg, "__seg")
    val medians = scored.groupBy(col("__seg"))
      .agg(percentile_approx(col(ctsFeatures.head), lit(0.5), lit(10000))
        .as(ctsFeatures.head),
        ctsFeatures.tail.map(f =>
          percentile_approx(col(f), lit(0.5), lit(10000)).as(f)): _*)
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
