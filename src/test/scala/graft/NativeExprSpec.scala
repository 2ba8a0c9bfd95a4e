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

  test("jaro_winkler: exact double parity with DuckDB-probed goldens " +
      "(byte semantics, 0.7 boost threshold, half transpositions)") {
    import graft.functions.JaroWinkler
    def jw(a: String, b: String): Double = JaroWinkler.similarity(
      a.getBytes("UTF-8"), b.getBytes("UTF-8"))
    // goldens probed from DuckDB jaro_winkler_similarity — EXACT
    assert(jw("martha", "marhta") == 0.9611111111111111)
    assert(jw("dixon", "dicksonx") == 0.8133333333333332)
    assert(jw("jellyfish", "smellyfish") == 0.8962962962962964)
    assert(jw("", "abc") == 0.0 && jw("", "") == 0.0)
    assert(jw("a", "a") == 1.0 && jw("abc", "abc") == 1.0)
    assert(jw("ab", "ba") == 0.0) // window 0: no cross-position match
    assert(jw("crate", "trace") == 0.7333333333333334) // prefix 0
    assert(jw("dwayne", "duane") == 0.8400000000000001)
    assert(jw("ab" + "qqqqqq", "ab" + "zzzzzz") == 0.5) // <= 0.7: no boost
    assert(jw("ababab", "bababa") == 0.8333333333333334)
    assert(jw("josé", "jose") == 0.8483333333333334) // BYTE lengths
    // ODD half-transposition counts: the floor (integer t2/2) path.
    // Probed 2026-08: DuckDB floors like strcmp95 — fractional t/2
    // would give 0.9166... / 0.8266... here instead.
    assert(jw("abcxyz", "bcaxyz") == 0.9444444444444445) // t2=3
    assert(jw("abcde", "bcade") == 0.8666666666666667)   // t2=3, no prefix
    assert(jw("abcdef", "badcfe") == 0.8333333333333334) // t2=6 even, pin
    assert(jw("abc", "bca") == 0.0) // window 0 at len 3: no matches
    // column form, null handling, codegen plan
    import spark.implicits._
    val df = Seq(("martha", Some("marhta")),
      ("x", Option.empty[String])).toDF("a", "b")
    val rows = df.select(JaroWinkler(col("a"), col("b"))).collect()
    assert(rows(0).getDouble(0) == 0.9611111111111111)
    assert(rows(1).isNullAt(0))
    val plan = df.select(JaroWinkler(col("a"), col("b")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("jaro_winkler"), plan)
  }

  test("nfc_normalize: composes decomposed sequences, ASCII and " +
      "already-NFC pass through, supplementary planes survive") {
    import graft.functions.NfcNormalize
    val rows = Seq(
      (1L, "plain ascii"),
      (2L, "e\u0301 clair"),        // decomposed e + acute
      (3L, "\u00e9clair"),          // already precomposed
      (4L, "\ud83d\ude00 A\u030a"), // emoji (supplementary) + A + ring
      (5L, "ga\u0308rten u\u0308")) // a/u + diaeresis
      .toDF("id", "s")
    val got = rows.select(col("id"), NfcNormalize(col("s")).as("n"),
        length(NfcNormalize(col("s"))).as("len"))
      .collect().map(r => r.getLong(0) -> (r.getString(1),
        r.getInt(2))).toMap
    assert(got(1L) == (("plain ascii", 11)))
    assert(got(2L) == (("\u00e9 clair", 7)))
    assert(got(3L) == (("\u00e9clair", 6)))
    assert(got(4L) == (("\ud83d\ude00 \u00c5", 3))) // emoji counts 1 cp
    assert(got(5L) == (("g\u00e4rten \u00fc", 8)))
    // null-intolerant
    val n = Seq(Option.empty[String]).toDF("s")
      .select(NfcNormalize(col("s"))).head()
    assert(n.isNullAt(0))
    // interpreted eval agrees with the codegen'd path
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = NfcNormalize(Literal("e\u0301 A\u030a x"))
    assert(e.eval(null).toString == "\u00e9 \u00c5 x")
    // plan shows the native expression, not a UDF
    val plan = rows.select(NfcNormalize(col("s")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("nfc_normalize"), plan)
  }
}
