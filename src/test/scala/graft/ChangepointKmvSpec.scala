package graft

import graft.llmdata.Sketches
import graft.ops.Experiment
import org.apache.spark.sql.functions._

/** Hand cases for the round-11 additions: single-changepoint
  * detection, Aalen-Johansen cumulative incidence, and the KMV
  * distinct sketch family — pencil-checkable fixtures pinning the
  * arithmetic independently of the oracle replay.
  */
class ChangepointKmvSpec extends SparkSuite {
  import spark.implicits._

  test("changepoint: a clean level shift splits exactly at the " +
      "break; emitted sums are the exact segment integers") {
    // series: 10,10,10, 50,50,50 — the split after ord 3 is optimal
    val df = Seq(("a", 1L, 10L), ("a", 2L, 10L), ("a", 3L, 10L),
      ("a", 4L, 50L), ("a", 5L, 50L), ("a", 6L, 50L))
      .toDF("k", "o", "v")
    val r = graft.functions.Stats.changepoint(df, "k", "o", col("v"))
      .collect()(0)
    assert(r.getAs[Long]("split_ord") == 3L)
    assert(r.getAs[Long]("n_left") == 3L &&
      r.getAs[Long]("sum_left") == 30L)
    assert(r.getAs[Long]("n_right") == 3L &&
      r.getAs[Long]("sum_right") == 150L)
  }

  test("changepoint: a constant series ties every split — the " +
      "earliest ord wins deterministically") {
    val df = Seq(("a", 1L, 7L), ("a", 2L, 7L), ("a", 3L, 7L))
      .toDF("k", "o", "v")
    val r = graft.functions.Stats.changepoint(df, "k", "o", col("v"))
      .collect()(0)
    // g(l) = 49l + 49(n-l) = 49n for every l — all equal, pick l=1
    assert(r.getAs[Long]("split_ord") == 1L)
  }

  test("cumulativeIncidence: four-subject hand table — CIFs " +
      "accumulate S(t-)*d_k/n and close to total failure mass") {
    // t=1 cause1; t=2 cause2; t=3 censored; t=4 cause1
    val df = Seq((1L, 1L), (2L, 2L), (3L, 0L), (4L, 1L))
      .toDF("dur", "cause")
    val out = Experiment.cumulativeIncidence(df, col("dur"),
      col("cause")).collect()
    val cif = out.map(r => (r.getAs[Long]("cause"),
      r.getAs[Long]("t")) -> r.getAs[Double]("cif")).toMap
    // S(0-)=1: CIF1(1) = 1 * 1/4 = 0.25 ; S(1) = 0.75
    assert(cif((1L, 1L)) == 0.25)
    // CIF2(2) = 0.75 * 1/3 = 0.25 ; S(2) = 0.5
    assert(cif((2L, 2L)) == 0.25)
    // censored row leaves both CIFs flat
    assert(cif((1L, 3L)) == 0.25 && cif((2L, 3L)) == 0.25)
    // CIF1(4) = 0.25 + 0.5 * 1/1 = 0.75 — and CIF1+CIF2 = 1.0:
    // every subject failed or was censored before the horizon
    assert(cif((1L, 4L)) == 0.75 && cif((2L, 4L)) == 0.25)
  }

  test("cumulativeIncidence: refuses unbounded cause sets") {
    val df = (1L to 40L).map(i => (i, i)).toDF("dur", "cause")
    val e = intercept[IllegalArgumentException] {
      Experiment.cumulativeIncidence(df, col("dur"), col("cause"),
        maxCauses = 8).collect()
    }
    assert(e.getMessage.contains("causes"))
  }

  test("kmv: below k the sketch is the exact distinct set and the " +
      "estimate is exact") {
    val df = (1L to 100L).map(i => ("s", i)).toDF("seg", "id")
    val sk = Sketches.kmv(df, "seg", col("id"), k = 256)
    assert(sk.count() == 100L)
    val est = Sketches.kmvEstimate(sk, k = 256).collect()(0)
    assert(est.getAs[Long]("n_sketch") == 100L)
    assert(est.getAs[Long]("est_distinct") == 100L)
  }

  test("kmv: far above k the estimator lands within 15% of truth") {
    val n = 20000L
    val df = (1L to n).map(i => ("s", i)).toDF("seg", "id")
    val est = Sketches.kmvEstimate(
      Sketches.kmv(df, "seg", col("id"), k = 256), k = 256)
      .collect()(0)
    val e = est.getAs[Long]("est_distinct").toDouble
    assert(math.abs(e - n) / n < 0.15,
      s"estimate $e vs $n out of tolerance")
  }

  test("kmvIntersect: identical segments read Jaccard 1e6; disjoint " +
      "segments read 0; a half-overlap lands near its true Jaccard") {
    val a = (1L to 5000L).map(i => ("a", i))
    val same = Sketches.kmv((a ++ a.map(x => ("b", x._2)))
      .toDF("seg", "id"), "seg", col("id"), k = 256)
    val rSame = Sketches.kmvIntersect(
      same.where(col("segment") === "a"),
      same.where(col("segment") === "b"), k = 256).collect()(0)
    assert(rSame.getAs[Long]("jaccard_ppm") == 1000000L)

    val disj = (a ++ (5001L to 10000L).map(i => ("b", i)))
      .toDF("seg", "id")
    val skD = Sketches.kmv(disj, "seg", col("id"), k = 256)
    val rD = Sketches.kmvIntersect(
      skD.where(col("segment") === "a"),
      skD.where(col("segment") === "b"), k = 256).collect()(0)
    assert(rD.getAs[Long]("jaccard_ppm") == 0L)

    // A = 1..6000, B = 3001..9000: |A∩B|=3000, |A∪B|=9000, J=1/3
    val half = ((1L to 6000L).map(i => ("a", i)) ++
      (3001L to 9000L).map(i => ("b", i))).toDF("seg", "id")
    val skH = Sketches.kmv(half, "seg", col("id"), k = 256)
    val rH = Sketches.kmvIntersect(
      skH.where(col("segment") === "a"),
      skH.where(col("segment") === "b"), k = 256).collect()(0)
    val j = rH.getAs[Long]("jaccard_ppm").toDouble / 1e6
    assert(math.abs(j - 1.0 / 3.0) < 0.08, s"jaccard $j vs 1/3")
    val inter = rH.getAs[Long]("est_intersection").toDouble
    assert(math.abs(inter - 3000.0) / 3000.0 < 0.25,
      s"intersection $inter vs 3000")
  }
}
