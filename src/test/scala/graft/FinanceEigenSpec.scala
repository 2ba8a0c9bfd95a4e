package graft

import org.apache.spark.sql.functions._

/** Hand cases for the oracle-replayable solver twins added in round
  * 12: distributed bisection IRR and the closed-form 2x2 eigen.
  */
class FinanceEigenSpec extends SparkSuite {
  import spark.implicits._

  test("irrBisect: matches the driver bisection solver to < 1e-5 " +
      "on hand cashflows and drops no-sign-change rows") {
    // order 1: -100 at t0, +60 at t1, +60 at t2 -> irr ~ 0.1306
    // order 2: -100 at t0, +230 at t1 -> irr = 1.3 exactly
    // order 3: all positive -> no bracket sign change -> dropped
    val df = Seq(
      (1L, 0, -100.0), (1L, 1, 60.0), (1L, 2, 60.0),
      (2L, 0, -100.0), (2L, 1, 230.0),
      (3L, 0, 50.0), (3L, 1, 60.0))
      .toDF("k", "t", "cf")
    val out = graft.ops.Finance.irrBisect(df, col("k"), col("t"),
        col("cf"), steps = 48, maxPeriods = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(1L, 2L))
    val ref1 = graft.exprlang.Financial.irr(
      Array(-100.0, 60.0, 60.0))
    assert(math.abs(out(1L) / 1e6 - ref1) < 1e-5,
      s"got ${out(1L)} ppm vs driver solver $ref1")
    assert(out(2L) == 1300000L, s"2-flow closed form: ${out(2L)}")
  }

  test("irrBisect: negative rates solve (inflows below outflow)") {
    // -100 then +40 +40: irr < 0, root of 40/u + 40/u^2 = 100
    val df = Seq((9L, 0, -100.0), (9L, 1, 40.0), (9L, 2, 40.0))
      .toDF("k", "t", "cf")
    val out = graft.ops.Finance.irrBisect(df, col("k"), col("t"),
      col("cf"), steps = 48, maxPeriods = 3).collect()(0).getLong(1)
    val ref = graft.exprlang.Financial.irr(Array(-100.0, 40.0, 40.0))
    assert(ref < 0 && math.abs(out / 1e6 - ref) < 1e-5)
  }

  test("eigen2: recovers a hand 2x2 — shares and the unit " +
      "principal direction") {
    // x in {0,2}, y = x exactly: cov = [[var, var],[var, var]],
    // lam1 = 2*var (share 1e6), lam2 = 0, pc1 = (1,1)/sqrt(2)
    val df = Seq((0.0, 0.0), (2.0, 2.0), (0.0, 0.0), (2.0, 2.0))
      .toDF("x", "y")
    val r = graft.functions.Tabular.eigen2(df, "x", "y").collect()(0)
    assert(r.getAs[Long]("lam1_share_ppm") == 1000000L)
    assert(r.getAs[Long]("lam2_share_ppm") == 0L)
    val c = 707107L // floor(1/sqrt(2) * 1e6 + 0.5)
    assert(r.getAs[Long]("pc1_x_ppm") == c)
    assert(r.getAs[Long]("pc1_y_ppm") == c)
    // trace = 2 * var = 2 * (4*1/3)... sample var of {0,2,0,2} =
    // (8 - 16/4) / 3 = 4/3; trace = 8/3 -> floor(8/3 + 0.5) = 3
    assert(r.getAs[Long]("trace_unit") == 3L)
  }

  test("eigen2: anti-correlated axis flips the principal direction " +
      "sign convention (pc1_y >= 0 branch via lam1 - a)") {
    val df = Seq((0.0, 2.0), (2.0, 0.0), (0.0, 2.0), (2.0, 0.0))
      .toDF("x", "y")
    val r = graft.functions.Tabular.eigen2(df, "x", "y").collect()(0)
    assert(r.getAs[Long]("lam1_share_ppm") == 1000000L)
    // b < 0: direction (b, lam1-a) ~ (-1, 1)/sqrt(2)
    assert(r.getAs[Long]("pc1_x_ppm") == -707106L ||
      r.getAs[Long]("pc1_x_ppm") == -707107L)
    assert(r.getAs[Long]("pc1_y_ppm") == 707107L)
  }
}
