package graft

import graft.functions.CosineSimilarity
import org.apache.spark.sql.functions._

/** The native codegen'd CosineSimilarity expression: value parity
  * with hand math, null handling, and SQL registration through
  * GraftExtensions.
  */
class NativeExprSpec extends SparkSuite {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
    (2L, Array(1.0f, 1.0f), Array(1.0f, 1.0f)),
    (3L, Array(3.0f, 4.0f), Array(4.0f, 3.0f))).toDF("id", "a", "b")

  test("native expression matches hand-computed cosine") {
    val got = vecs.select(col("id"), CosineSimilarity(col("a"), col("b"))
      .as("c")).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(1L) - 0.0) < 1e-12)
    assert(math.abs(got(2L) - 1.0) < 1e-12)
    assert(math.abs(got(3L) - 24.0 / 25.0) < 1e-12)
  }

  test("null-intolerant: null array yields null") {
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    val r = df.select(CosineSimilarity(col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }

  test("registered as a SQL function via GraftExtensions") {
    GraftExtensions.register(spark)
    vecs.createOrReplaceTempView("vecs_native")
    val got = spark.sql(
      "SELECT id, cosine_similarity(a, b) AS c FROM vecs_native " +
        "WHERE id = 2").head().getDouble(1)
    assert(math.abs(got - 1.0) < 1e-12)
  }

  test("interpreted eval path agrees with codegen (eval fallback)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    // force interpreted evaluation through the expression directly
    val e = CosineSimilarity(
      Literal.create(Array(1.0f, 2.0f), ArrayType(FloatType)),
      Literal.create(Array(2.0f, 1.0f), ArrayType(FloatType)))
    val v = e.eval(null).asInstanceOf[Double]
    assert(math.abs(v - 4.0 / 5.0) < 1e-12)
  }
}
