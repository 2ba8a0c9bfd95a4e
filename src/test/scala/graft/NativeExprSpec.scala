package graft

import graft.functions.{CosineSimilarity, JaccardSimilarity}
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

  test("native jaccard matches the HOF set formula incl duplicates, " +
      "empty sets, and codegen/eval parity") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a b", "b c", "c d"), Seq("b c", "c d", "d e")),
      (2L, Seq("a b", "a b", "b c"), Seq("b c")), // duplicates collapse
      (3L, Seq.empty[String], Seq.empty[String]), // NaN via 0/0
      (4L, Seq("x"), Seq.empty[String]))
      .toDF("id", "sa", "sb")
    // the HOF form raises ANSI divide-by-zero on two empty sets, so
    // compare it only where defined; the native expression is total
    // (NaN for empty/empty, matching non-ANSI double division)
    val both = df.where(col("id") =!= 3).select(col("id"),
      JaccardSimilarity(col("sa"), col("sb")).as("native"),
      (size(array_intersect(col("sa"), col("sb"))).cast("double") /
        size(array_union(col("sa"), col("sb")))).as("hof"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(both.length == 3)
    both.foreach { case (id, n, h) =>
      assert(n == h, s"id=$id native=$n hof=$h")
    }
    val empty = df.where(col("id") === 3)
      .select(JaccardSimilarity(col("sa"), col("sb")))
      .head().getDouble(0)
    assert(empty.isNaN)
    // interpreted eval path
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val e = JaccardSimilarity(
      Literal.create(Seq("a", "b", "c"), ArrayType(StringType)),
      Literal.create(Seq("b", "c", "d"), ArrayType(StringType)))
    assert(math.abs(e.eval(null).asInstanceOf[Double] - 0.5) < 1e-12)
    // plan shows the native expression, not a UDF
    val plan = df.select(JaccardSimilarity(col("sa"), col("sb")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("jaccard_similarity"), plan)
  }
}
