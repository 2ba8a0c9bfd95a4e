package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.MultilayerPerceptronClassifier
import org.apache.spark.ml.feature.{OneHotEncoder, StringIndexer, VectorAssembler}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable categorical embeddings — the reference's `E(field, k)`
  * feature (seafan modspec.go:306-414): a per-level k-dimensional
  * vector LEARNED against the target, not a one-hot substitute.
  *
  * Training: one-hot the level (sorted coding, like appendD), fit a
  * minimal MLP `[V, k, nClasses]` on just this feature, and read the
  * input->hidden weight matrix (V x k) back as the lookup table. That
  * weight block is precisely what the reference's NN graph trains for
  * an embedded feature (nn.go:216-417) — here isolated into its own
  * tiny fit so the embedding composes with any downstream estimator.
  *
  * Scale shape: the fit streams the frame through MLlib's distributed
  * LBFGS (no driver materialization); the resulting table is O(V * k)
  * doubles on the driver, applied as a codegen'd column expression —
  * no join, no shuffle, no UDF.
  */
object Embeddings {

  /** A fitted embedding: level -> k doubles; unseen levels take
    * `default` (the trained weight column of the indexer's
    * handle-invalid slot when present, else zeros).
    */
  case class EmbeddingModel(feature: String, dim: Int,
      table: Map[String, Array[Double]], default: Array[Double]) {

    /** Output column names `<feature>__e0 .. __e{k-1}`. */
    def columnNames: Seq[String] =
      (0 until dim).map(i => s"${feature}__e$i")

    /** The lookup expression for dimension `i`. Small dictionaries
      * compile to a chain of codegen'd WHEN branches; larger ones
      * become a literal-map element_at (same split as
      * [[graft.encode.Encode.encodeD]] — a high-V when-chain would
      * blow generated-code size past JIT limits). Either way: no
      * join, no shuffle.
      */
    def lookup(i: Int): Column =
      if (table.size <= 32)
        table.toSeq.sortBy(_._1).foldLeft(when(lit(false), 0.0)) {
          case (acc, (v, vec)) => acc.when(col(feature) === lit(v), vec(i))
        }.otherwise(default(i))
      else {
        val m = table.map { case (v, vec) => v -> vec(i) }
        val looked = element_at(typedlit(m), col(feature).cast("string"))
        when(looked.isNotNull, looked).otherwise(default(i))
      }

    /** Append the k embedding columns. */
    def apply(df: DataFrame): DataFrame =
      columnNames.zipWithIndex.foldLeft(df) { case (d, (n, i)) =>
        d.withColumn(n, lookup(i))
      }
  }

  /** Fit a k-dim embedding for `feature` against a binary (0/1 double)
    * `target` column. `maxIter` bounds the LBFGS work — embeddings
    * need signal, not convergence.
    */
  def fit(df: DataFrame, feature: String, target: String, k: Int,
      nClasses: Int = 2, maxIter: Int = 40, seed: Long = 42L,
      maxLevels: Int = graft.encode.Encode.MaxLevels): EmbeddingModel = {
    require(k >= 1, "embedding dim must be >= 1")
    // cardinality guard, mirroring Encode.fitD: the V x k table is
    // driver-resident and the one-hot fit layer is V-wide — an
    // unbounded "categorical" must error before either materializes
    val approx = df.agg(approx_count_distinct(df(feature), 0.05))
      .head().getLong(0)
    require(approx <= maxLevels * 1.2,
      s"embedding: column '$feature' has ~$approx distinct values " +
        s"(cap $maxLevels); the lookup table is driver-resident — " +
        "bucket or hash the column instead of embedding it")
    val indexer = new StringIndexer().setInputCol(feature)
      .setOutputCol("__emb_idx")
      .setStringOrderType("alphabetAsc").setHandleInvalid("keep")
    val ohe = new OneHotEncoder().setInputCols(Array("__emb_idx"))
      .setOutputCols(Array("__emb_oh")).setDropLast(false)
      .setHandleInvalid("keep")
    val asm = new VectorAssembler().setInputCols(Array("__emb_oh"))
      .setOutputCol("__emb_feat")
    val prep = new Pipeline().setStages(Array(indexer, ohe, asm)).fit(df)
    // cache: the prepped frame is read by the width probe and then by
    // every LBFGS iteration — without this each pass re-runs the
    // indexer/encoder/assembler transform chain
    val prepped = prep.transform(df)
      .select(col("__emb_feat"), col(target)).cache()
    val v = prepped.select("__emb_feat").head()
      .getAs[Vector](0).size
    val mlp = new MultilayerPerceptronClassifier()
      .setFeaturesCol("__emb_feat").setLabelCol(target)
      .setLayers(Array(v, k, nClasses))
      .setMaxIter(maxIter).setSeed(seed)
    val m = try mlp.fit(prepped) finally prepped.unpersist()
    val w = m.weights.toArray
    // first affine layer = V*k weights (column-major: input v is the
    // k-slice starting at v*k) followed by k biases
    val levels = prep.stages.head
      .asInstanceOf[org.apache.spark.ml.feature.StringIndexerModel]
      .labelsArray.head.toSeq
    val vecFor = (idx: Int) => Array.tabulate(k)(i => w(idx * k + i))
    val table = levels.zipWithIndex
      .map { case (lvl, idx) => lvl -> vecFor(idx) }.toMap
    val default =
      if (v > levels.length) vecFor(levels.length)
      else Array.fill(k)(0.0)
    EmbeddingModel(feature, k, table, default)
  }
}
