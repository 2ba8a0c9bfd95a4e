package graft

import graft.functions.{CosineSimilarity, JaccardSimilarity, PortableTokenHash}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions, so
  * `spark.sql("SELECT cosine_similarity(a, b) ...")` works alongside
  * the Column API.
  *
  * Install with:
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *   // or spark.sql.extensions=graft.GraftExtensions
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.cosineSimilarityDescriptor)
    e.injectFunction(GraftExtensions.jaccardSimilarityDescriptor)
    e.injectFunction(GraftExtensions.portableTokenHashDescriptor)
  }
}

object GraftExtensions {
  /** Register the functions into an already-built session (the
    * extensions path only applies at session build time).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Seq(cosineSimilarityDescriptor, jaccardSimilarityDescriptor,
        portableTokenHashDescriptor)
      .foreach { case (id, info, builder) =>
        spark.sessionState.functionRegistry
          .registerFunction(id, info, builder)
      }

  private[graft] val cosineSimilarityDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName,
        "cosine_similarity"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "cosine_similarity expects exactly 2 arguments")
        CosineSimilarity(children.head, children(1))
      })

  private[graft] val portableTokenHashDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("portable_token_hash"),
      new ExpressionInfo(classOf[PortableTokenHash].getName,
        "portable_token_hash"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          "portable_token_hash expects exactly 1 argument")
        PortableTokenHash(children.head)
      })

  private[graft] val jaccardSimilarityDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("jaccard_similarity"),
      new ExpressionInfo(classOf[JaccardSimilarity].getName,
        "jaccard_similarity"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "jaccard_similarity expects exactly 2 arguments")
        JaccardSimilarity(children.head, children(1))
      })
}
