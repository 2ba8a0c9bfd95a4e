package graft.ml

import graft.types._
import org.apache.spark.ml.{Pipeline, PipelineModel, PipelineStage}
import org.apache.spark.ml.classification.{LogisticRegression, MultilayerPerceptronClassifier}
import org.apache.spark.ml.feature.{OneHotEncoder, StandardScaler, StringIndexer, VectorAssembler}
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.DataFrame

/** The reference's model-spec DSL mapped onto MLlib Pipelines
  * (seafan modspec.go:55-470, SURVEY §2.12).
  *
  * Layer grammar (reference nn_test.go:136-141):
  *   Input(x1+x2+x4oh)  FC(size:8, activation:relu)  DropOut(.1)
  *   FC(size:1, activation:sigmoid)  Target(y)
  *
  * Mapping: Input -> StringIndexer/OneHotEncoder/StandardScaler +
  * VectorAssembler; FC stack -> MultilayerPerceptronClassifier layers
  * (sigmoid hidden activations — MLlib's fixed choice; LeakyRelu etc.
  * are documented deviations, SURVEY §7.4 risk 7); a single linear
  * output -> LinearRegression; single sigmoid output ->
  * LogisticRegression. DropOut is parsed and recorded but has no MLP
  * equivalent — a documented no-op.
  */
object ModSpec {

  sealed trait Layer
  case class Input(features: Seq[FeatureRef]) extends Layer
  case class FC(size: Int, activation: String) extends Layer
  case class DropOut(p: Double) extends Layer
  case class Target(field: String) extends Layer

  /** A feature reference: plain continuous, or one-hot/embedded
    * categorical (`E(x4oh, 3)` embeds; we one-hot instead and record
    * the requested width).
    */
  case class FeatureRef(name: String, oneHot: Boolean, embed: Int = 0)

  private val fcRe = """FC\(\s*size:(\d+)\s*(?:,\s*activation:(\w+))?\s*\)""".r
  private val doRe = """DropOut\(([\d.]+)\)""".r
  private val inRe = """Input\((.+)\)""".r
  private val tgRe = """Target\((\w+)\)""".r
  private val embRe = """E\((\w+)\s*,\s*(\d+)\)""".r

  def parse(spec: Seq[String]): Seq[Layer] = spec.map {
    case inRe(fs) => Input(fs.split("\\+").map(_.trim).map {
      case embRe(n, k) => FeatureRef(n.stripSuffix("oh"), oneHot = true,
        embed = k.toInt)
      case f if f.endsWith("oh") => FeatureRef(f.stripSuffix("oh"),
        oneHot = true)
      case f => FeatureRef(f, oneHot = false)
    }.toIndexedSeq)
    case fcRe(size, act) => FC(size.toInt,
      Option(act).getOrElse("linear"))
    case doRe(p) => DropOut(p.toDouble)
    case tgRe(f) => Target(f)
    case other => throw new IllegalArgumentException(
      s"modspec: cannot parse layer '$other'")
  }

  /** Build the MLlib pipeline for a parsed spec. `classification`
    * selects MLP/LogisticRegression vs LinearRegression for the output
    * layer.
    */
  def toPipeline(layers: Seq[Layer], classification: Boolean,
      nClasses: Int = 2): Pipeline = {
    val input = layers.collectFirst { case i: Input => i }.getOrElse(
      throw new IllegalArgumentException("modspec: no Input layer"))
    val target = layers.collectFirst { case t: Target => t }.getOrElse(
      throw new IllegalArgumentException("modspec: no Target layer"))
    val fcs = layers.collect { case f: FC => f }

    val stages = scala.collection.mutable.ArrayBuffer[PipelineStage]()
    val assembled = input.features.map { f =>
      if (f.oneHot) {
        // sorted-value level coding to match the engine's appendD
        stages += new StringIndexer().setInputCol(f.name)
          .setOutputCol(s"${f.name}__idx")
          .setStringOrderType("alphabetAsc").setHandleInvalid("keep")
        stages += new OneHotEncoder().setInputCols(Array(s"${f.name}__idx"))
          .setOutputCols(Array(s"${f.name}__oh")).setDropLast(false)
        s"${f.name}__oh"
      } else f.name
    }
    stages += new VectorAssembler().setInputCols(assembled.toArray)
      .setOutputCol("__features")

    val estimator: PipelineStage =
      if (!classification)
        new LinearRegression().setFeaturesCol("__features")
          .setLabelCol(target.field).setMaxIter(100)
      else if (fcs.length <= 1)
        new LogisticRegression().setFeaturesCol("__features")
          .setLabelCol(target.field).setMaxIter(100)
      else {
        // hidden sizes from all but the final FC; output = nClasses
        val hidden = fcs.dropRight(1).map(_.size)
        val mlp = new MultilayerPerceptronClassifier()
          .setFeaturesCol("__features").setLabelCol(target.field)
          .setSeed(42).setMaxIter(100)
        // input layer size is resolved at fit time by MLlib >= 3.1 only
        // when layers are set; caller may override via setLayersFor.
        mlp.setLayers(Array(-1) ++ hidden ++ Array(nClasses))
        mlp
      }
    stages += estimator
    new Pipeline().setStages(stages.toArray)
  }

  /** Fit with a driver-side early-stopping loop over maxIter
    * increments (the analog of Fit.Do's validation-wait early stop,
    * nn.go:598-840): trains with increasing iteration budgets and
    * keeps the first model whose validation metric stops improving.
    */
  def fitEarlyStop(pipeline: Pipeline, train: DataFrame, valid: DataFrame,
      metric: PipelineModel => Double, patience: Int = 2,
      steps: Seq[Int] = Seq(10, 25, 50, 100)): PipelineModel = {
    var best: PipelineModel = null
    var bestScore = Double.MaxValue
    var waits = 0
    steps.takeWhile { iters =>
      pipeline.getStages.lastOption.foreach {
        case lr: LogisticRegression => lr.setMaxIter(iters)
        case lr: LinearRegression => lr.setMaxIter(iters)
        case m: MultilayerPerceptronClassifier => m.setMaxIter(iters)
        case _ =>
      }
      val model = pipeline.fit(train)
      val score = metric(model)
      if (score < bestScore - 1e-9) { best = model; bestScore = score; waits = 0 }
      else waits += 1
      waits < patience
    }
    if (best == null) best = pipeline.fit(train)
    best
  }
}
