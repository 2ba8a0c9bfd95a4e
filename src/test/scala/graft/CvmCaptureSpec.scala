package graft

import graft.ops.RankStats
import org.apache.spark.sql.functions._

/** Hand cases for Cramér-von Mises and capture-recapture. */
class CvmCaptureSpec extends SparkSuite {
  import spark.implicits._

  test("cramerVonMises: identical samples score 0; fully separated " +
      "samples match the pencil sum") {
    val same = Seq((false, 1L), (false, 2L), (true, 1L), (true, 2L))
      .toDF("b", "v")
    val r0 = RankStats.cramerVonMises(same, col("b"), col("v"))
      .collect()(0)
    assert(r0.getAs[Double]("t_stat") == 0.0)

    // A={1,2}, B={3,4}: gaps (Am-Bn) = 2,4,2,0 -> num = 4+16+4 = 24
    // T = 24 / (N² n m) = 24 / (16*4) = 0.375
    val sep = Seq((false, 1L), (false, 2L), (true, 3L), (true, 4L))
      .toDF("b", "v")
    val r1 = RankStats.cramerVonMises(sep, col("b"), col("v"))
      .collect()(0)
    assert(r1.getAs[Long]("n_a") == 2L && r1.getAs[Long]("n_b") == 2L)
    assert(r1.getAs[Double]("t_stat") == 0.375)
  }

  test("captureRecapture: Chapman and Lincoln-Petersen match the " +
      "pencil estimates; empty overlap nulls LP") {
    // A-only u1..u3, B-only u4,u5, both u6
    val df = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"),
      (4L, "b"), (5L, "b"),
      (6L, "a"), (6L, "b"),
      (7L, "x")) // seen by neither channel -> excluded
      .toDF("k", "ch")
    val r = graft.functions.Stats.captureRecapture(df, col("k"),
      col("ch") === "a", col("ch") === "b").collect()(0)
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Long]("overlap") == 1L && r.getAs[Long]("seen") == 6L)
    assert(r.getAs[Long]("chapman_est") == 9L)  // floor(5*4/2) - 1
    assert(r.getAs[Long]("lincoln_petersen_est") == 12L) // 4*3/1

    val disj = Seq((1L, "a"), (2L, "b")).toDF("k", "ch")
    val r2 = graft.functions.Stats.captureRecapture(disj, col("k"),
      col("ch") === "a", col("ch") === "b").collect()(0)
    assert(r2.isNullAt(r2.fieldIndex("lincoln_petersen_est")))
    assert(r2.getAs[Long]("chapman_est") == 3L) // floor(2*2/1) - 1
  }
}
