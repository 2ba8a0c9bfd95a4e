package graft

import graft.llmdata.TextAnalysis
import graft.ops.Experiment
import org.apache.spark.sql.functions._

/** Hand cases for TextRank keywords and PS caliper matching. */
class TextRankMatchSpec extends SparkSuite {
  import spark.implicits._

  override protected def withFixture(test: NoArgTest) =
    try super.withFixture(test) finally graft.Caches.release()

  test("textRankKeywords: the hub word of a star adjacency ranks " +
      "first; an isolated pair ranks below it") {
    // "hub a", "hub b", "hub c" -> hub adjacent to 3 words;
    // "x y" an isolated edge. hub must out-rank every other word.
    val docs = Seq("hub a", "hub b", "hub c", "x y").toDF("text")
    val out = TextAnalysis.textRankKeywords(docs, "text", iters = 3,
      k = 10).collect()
    assert(out.head.getAs[String]("word") == "hub")
    val ranks = out.map(r =>
      r.getAs[String]("word") -> r.getAs[Long]("rank")).toMap
    assert(ranks("hub") > ranks("x") && ranks("hub") > ranks("a"))
    // spokes a/b/c are symmetric — identical ranks
    assert(ranks("a") == ranks("b") && ranks("b") == ranks("c"))
  }

  test("textRankKeywords: self-adjacency (repeated word) adds no " +
      "edge; normalization strips punctuation") {
    val docs = Seq("go go GO!", "go stop").toDF("text")
    val out = TextAnalysis.textRankKeywords(docs, "text", iters = 2,
      k = 10).collect()
    // only edge is go—stop: two symmetric nodes, equal rank
    assert(out.length == 2)
    assert(out.map(_.getAs[Long]("rank")).distinct.length == 1)
  }

  test("psMatchAtt: nearest control within the caliper wins by " +
      "|delta| then tiebreak; out-of-caliper treated stay unmatched") {
    // treated: t1 sq=100 y=1, t2 sq=500 y=1 (no control within 25)
    // controls: c1 sq=103 y=0, c2 sq=98 y=1, c3 sq=130 y=0
    // t1's candidates: c2 (|2|), c1 (|3|), c3 (|30| -> out)
    val df = Seq(
      (1, 1.0, 100L, 1L), (1, 1.0, 500L, 2L),
      (0, 0.0, 103L, 11L), (0, 1.0, 98L, 12L), (0, 0.0, 130L, 13L))
      .toDF("t", "y", "sq", "id")
    val r = Experiment.psMatchAtt(df, col("t"), col("y"), col("sq"),
      col("id"), caliper = 25L).collect()(0)
    assert(r.getAs[Long]("n_treated") == 2L)
    assert(r.getAs[Long]("n_matched") == 1L)
    assert(r.getAs[Long]("match_ppm") == 500000L)
    assert(r.getAs[Double]("att") == 0.0) // y_t 1 - y_c2 1
  }

  test("psMatchAtt: with-replacement — two treated can share one " +
      "control; the score-census guard refuses an unbounded grid") {
    val df = Seq(
      (1, 1.0, 100L, 1L), (1, 0.0, 101L, 2L),
      (0, 0.5, 100L, 11L))
      .toDF("t", "y", "sq", "id")
    val r = Experiment.psMatchAtt(df, col("t"), col("y"), col("sq"),
      col("id"), caliper = 25L).collect()(0)
    assert(r.getAs[Long]("n_matched") == 2L)
    // att = ((1-0.5) + (0-0.5)) / 2 = 0
    assert(r.getAs[Double]("att") == 0.0)

    val wide = (1L to 50L).map(i =>
      (if (i % 2 == 0) 1 else 0, 1.0, i * 100L, i))
      .toDF("t", "y", "sq", "id")
    val e = intercept[IllegalArgumentException] {
      Experiment.psMatchAtt(wide, col("t"), col("y"), col("sq"),
        col("id"), caliper = 25L, maxDistinctScores = 10L)
    }
    assert(e.getMessage.contains("scores"))
  }

  test("psMatchAtt: equidistant candidate scores resolve by the " +
      "min-tiebreak control across BOTH scores") {
    // treated sq=100; controls at 98 (tb 20, y=1) and 102 (tb 3, y=0)
    // — equidistant, tb 3 wins -> matched y = 0
    val df = Seq(
      (1, 1.0, 100L, 1L),
      (0, 1.0, 98L, 20L), (0, 0.0, 102L, 3L))
      .toDF("t", "y", "sq", "id")
    val r = Experiment.psMatchAtt(df, col("t"), col("y"), col("sq"),
      col("id"), caliper = 25L).collect()(0)
    assert(r.getAs[Double]("att") == 1.0) // 1.0 - 0.0
  }
}
