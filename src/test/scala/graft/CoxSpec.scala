package graft

import graft.ops.Cox
import org.apache.spark.sql.functions._

/** Cox proportional hazards against an INDEPENDENT in-spec reference:
  * the naive O(n²) Breslow partial likelihood (direct risk-set loops,
  * no census/suffix machinery) maximized by scalar Newton. Any bug in
  * the distributed census/suffix/Newton path would have to be
  * mirrored exactly in this 20-line loop to pass.
  */
class CoxSpec extends SparkSuite {
  import spark.implicits._

  test("riskSets: hand-computed suffix sums, deaths only") {
    val df = Seq(
      (1L, 1L, 2L, 1L), (2L, 0L, 1L, 2L),
      (2L, 1L, 3L, 0L), (3L, 1L, 1L, 1L)
    ).toDF("t", "e", "w", "x")
    val got = Cox.riskSets(df, col("t"), col("e"), col("w"), col("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toList
    // suffix over census: s0(3)=1 s1(3)=1; s0(2)=5 s1(2)=3;
    // s0(1)=7 s1(1)=5
    assert(got == List((1L, 1L, 7L, 5L), (2L, 1L, 5L, 3L),
      (3L, 1L, 1L, 1L)), s"got $got")
  }

  /** Naive Breslow partial log-likelihood for one covariate. */
  private def naiveLl(data: Seq[(Long, Long, Double)],
      b: Double): Double = {
    val eventTimes = data.filter(_._2 == 1L).map(_._1).distinct
    eventTimes.map { t =>
      val atT = data.filter(d => d._1 == t && d._2 == 1L)
      val risk = data.filter(_._1 >= t)
      atT.map(_._3 * b).sum -
        atT.size * math.log(risk.map(d => math.exp(b * d._3)).sum)
    }.sum
  }

  private def naiveFit(data: Seq[(Long, Long, Double)]): Double = {
    var b = 0.0
    val h = 1e-5
    for (_ <- 0 until 60) {
      val g = (naiveLl(data, b + h) - naiveLl(data, b - h)) / (2 * h)
      val hess = (naiveLl(data, b + h) - 2 * naiveLl(data, b) +
        naiveLl(data, b - h)) / (h * h)
      b -= g / hess
    }
    b
  }

  test("fit matches the naive reference on a 24-subject cohort") {
    // deterministic synthetic cohort: higher x -> earlier failure
    val data = (1 to 24).map { i =>
      val x = (i % 3).toDouble
      val t = (20 - 2 * (i % 3) + (i * 7) % 5).toLong
      val e = if (i % 4 == 0) 0L else 1L
      (t, e, x)
    }
    val expect = naiveFit(data)
    val df = data.toDF("t", "e", "x")
    val r = Cox.fit(df, col("t"), col("e"), Seq("x" -> col("x")))
      .collect()(0)
    val beta = r.getAs[Double]("beta")
    assert(math.abs(beta - expect) < 1e-4,
      s"beta=$beta naive=$expect")
    assert(math.abs(r.getAs[Double]("hr") - math.exp(expect)) < 1e-3)
    assert(r.getAs[Double]("se") > 0)
    assert(r.getAs[Double]("ll") >= r.getAs[Double]("ll0"))
  }

  test("fit: two covariates, gates hold, order deterministic") {
    val data = (1 to 30).map { i =>
      (((i * 13) % 17 + 3).toLong, (i % 5 != 0),
        (i % 4).toDouble, if (i % 2 == 0) 1.0 else 0.0)
    }
    val df = data.toDF("t", "e", "x1", "x2")
    val rows = Cox.fit(df, col("t"), col("e").cast("long"),
      Seq("x1" -> col("x1"), "x2" -> col("x2"))).collect()
    assert(rows.map(_.getString(0)).toList == List("x1", "x2"))
    assert(rows.forall(_.getAs[Double]("se") > 0))
  }

  test("fit refuses exactly collinear covariates") {
    val data = (1 to 20).map(i =>
      ((i % 7 + 1).toLong, 1L, (i % 3).toDouble))
    val df = data.toDF("t", "e", "x")
    val e = intercept[IllegalArgumentException] {
      Cox.fit(df, col("t"), col("e"),
        Seq("a" -> col("x"), "b" -> (col("x") * 2.0)))
    }
    assert(e.getMessage.contains("singular"))
  }
}
