package graft

import graft.ops.RankStats
import org.apache.spark.sql.functions._

/** Rank statistics against hand-computed textbook cases: every
  * statistic here is small enough to check by pencil, which pins the
  * census/doubled-rank arithmetic independently of the DuckDB
  * oracle's replay of the same formulas.
  */
class RankStatsSpec extends SparkSuite {
  import spark.implicits._

  test("auc: perfect separation gives 1.0, reversed gives 0.0, " +
      "all-tied gives 0.5") {
    val perfect = Seq((1L, 0), (2L, 0), (3L, 1), (4L, 1))
      .toDF("s", "l")
    val r = RankStats.auc(perfect, col("s"), col("l")).collect()(0)
    assert(r.getAs[Double]("auc") == 1.0)
    assert(r.getAs[Long]("n_pos") == 2 && r.getAs[Long]("n_neg") == 2)
    val rev = RankStats.auc(perfect, -col("s"), col("l")).collect()(0)
    assert(rev.getAs[Double]("auc") == 0.0)
    val tied = Seq((5L, 0), (5L, 1), (5L, 0), (5L, 1)).toDF("s", "l")
    assert(RankStats.auc(tied, col("s"), col("l"))
      .collect()(0).getAs[Double]("auc") == 0.5)
  }

  test("auc: hand case with a tie straddling the classes") {
    // neg scores {1, 3}, pos scores {3, 5}:
    // pairs: (1<3)=1, (1<5)=1, (3=3)=0.5, (3<5)=1 -> U=3.5, AUC=0.875
    val df = Seq((1L, 0), (3L, 0), (3L, 1), (5L, 1)).toDF("s", "l")
    val r = RankStats.auc(df, col("s"), col("l")).collect()(0)
    assert(r.getAs[Double]("u_stat") == 3.5)
    assert(r.getAs[Double]("auc") == 0.875)
  }

  test("auc: census guard refuses an unbounded score grid") {
    val df = (1 to 100).map(i => (i.toLong, i % 2)).toDF("s", "l")
    val e = intercept[IllegalArgumentException] {
      RankStats.auc(df, col("s"), col("l"), maxDistinct = 10)
    }
    assert(e.getMessage.contains("maxDistinct"))
  }

  test("spearman: monotone nonlinear is exactly 1, anti-monotone -1") {
    val df = Seq((1L, 1L), (2L, 4L), (3L, 9L), (4L, 16L), (5L, 25L))
      .toDF("x", "y")
    assert(RankStats.spearman(df, col("x"), col("y"))
      .collect()(0).getAs[Double]("rho") == 1.0)
    assert(RankStats.spearman(df, col("x"), -col("y"))
      .collect()(0).getAs[Double]("rho") == -1.0)
  }

  test("spearman: ties get average ranks (hand case)") {
    // x: 1,2,2,4 -> ranks 1, 2.5, 2.5, 4; y: 10,20,30,40 -> 1,2,3,4
    // rho = 1 - complicated; compute Pearson on ranks by hand:
    // rx = (1, 2.5, 2.5, 4), ry = (1,2,3,4); cov terms:
    // mean rx = 2.5, mean ry = 2.5
    // num = (−1.5)(−1.5) + 0·(−0.5) + 0·0.5 + 1.5·1.5 = 4.5
    // den = sqrt(4.5) * sqrt(5) = sqrt(22.5) -> rho = 4.5/4.7434165
    val df = Seq((1L, 10L), (2L, 20L), (2L, 30L), (4L, 40L))
      .toDF("x", "y")
    val rho = RankStats.spearman(df, col("x"), col("y"))
      .collect()(0).getAs[Double]("rho")
    assert(math.abs(rho - 4.5 / math.sqrt(22.5)) < 1e-6, s"rho=$rho")
  }

  test("kruskalWallis: textbook three-group case") {
    // groups a={1,2}, b={3,4}, c={5,6}; no ties
    // ranks 1..6; Ra=3, Rb=7, Rc=11; N=6
    // H = 12/(6*7) * (9/2 + 49/2 + 121/2) - 3*7 = 12/42*89.5 - 21
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L),
      ("c", 5L), ("c", 6L)).toDF("g", "v")
    val rows = RankStats.kruskalWallis(df, col("g"), col("v"))
      .collect()
    assert(rows.length == 3)
    val h = rows(0).getAs[Double]("h")
    val expect = 12.0 / 42.0 * 89.5 - 21.0
    assert(math.abs(h - expect) < 1e-6, s"h=$h expect=$expect")
    assert(rows(0).getAs[Long]("df") == 2)
    // no ties -> h_adj == h
    assert(rows(0).getAs[Double]("h_adj") == h)
    val ra = rows.find(_.getString(0) == "a").get
    assert(ra.getAs[Double]("rank_sum") == 3.0)
    assert(ra.getAs[Double]("mean_rank") == 1.5)
  }

  test("welchT: equal groups give t=0, p=1; known asymmetric case") {
    val eq = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0))
      .toDF("g", "v")
    val r0 = RankStats.welchT(eq, col("g") === "a", col("g") === "b",
      col("v")).collect()(0)
    assert(r0.getAs[Double]("t_stat") == 0.0)
    assert(r0.getAs[Double]("p_value") == 1.0)
    // a = {1,2,3}, b = {2,4,6}: ma=2, mb=4, va=1, vb=4
    // t = -2 / sqrt(1/3 + 4/3) = -2/sqrt(5/3)
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 4.0), ("b", 6.0)).toDF("g", "v")
    val r = RankStats.welchT(df, col("g") === "a", col("g") === "b",
      col("v")).collect()(0)
    val tExpect = -2.0 / math.sqrt(5.0 / 3.0)
    assert(math.abs(r.getAs[Double]("t_stat") - tExpect) < 1e-6)
    assert(r.getAs[Double]("mean_a") == 2.0)
    assert(r.getAs[Double]("mean_b") == 4.0)
  }

  test("mannKendall: monotone series hits S = ±n(n-1)/2 with the " +
      "textbook variance; a constant series is all-ties (var 0, " +
      "p 1); the per-series guard trips") {
    val up = (1L to 5L).map(i => ("u", i, i * 10))
    val down = (1L to 5L).map(i => ("d", i, 60 - i * 10))
    val const = (1L to 5L).map(i => ("c", i, 7L))
    val df = (up ++ down ++ const).toDF("s", "t", "v")
    val got = RankStats.mannKendall(df, col("s"), col("t"), col("v"))
      .collect().map(r => r.getAs[String]("series") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("s_stat"),
          r.getAs[Double]("var_s"), r.getAs[Double]("z"),
          r.getAs[Double]("p_value")))).toMap
    graft.Caches.release()
    // n=5, no ties: Var S = 5*4*15/18 = 16.666667
    val varS = math.rint(300.0 / 18.0 * 1e6) / 1e6
    val z = 9.0 / math.sqrt(300.0 / 18.0)
    assert(got("u")._1 == 5 && got("u")._2 == 10L)
    assert(got("u")._3 == varS)
    assert(math.abs(got("u")._4 - z) < 1e-6)
    assert(got("u")._5 < 0.05) // a clean 5-point monotone trend
    assert(got("d")._2 == -10L)
    assert(math.abs(got("d")._4 + z) < 1e-6) // symmetric
    assert(got("d")._5 == got("u")._5)
    // constant: every pair tied -> S = 0, tie term kills the variance
    assert(got("c")._2 == 0L && got("c")._3 == 0.0 &&
      got("c")._4 == 0.0 && got("c")._5 == 1.0)
    val e = intercept[IllegalArgumentException] {
      RankStats.mannKendall(df, col("s"), col("t"), col("v"),
        maxPoints = 3)
    }
    assert(e.getMessage.contains("coarser time grain"))
    graft.Caches.release()
  }

  test("theilSenCi: a perfect line collapses the band to the slope; " +
      "noise opens an interval containing the median that widens " +
      "with z") {
    import graft.functions.Stats
    import spark.implicits._
    val line = (1L to 5L).map(i => ("l", i, 2 * i)).toDF("s", "x", "y")
    val rl = Stats.theilSenCi(line, "s", "x", "y").collect()(0)
    graft.Caches.release()
    assert(rl.getAs[Long]("n_pairs") == 10)
    assert(rl.getAs[Double]("slope") == 2.0)
    assert(rl.getAs[Double]("slope_lo") == 2.0 &&
      rl.getAs[Double]("slope_hi") == 2.0)
    val noisy = Seq(("n", 1L, 10L), ("n", 2L, 25L), ("n", 3L, 28L),
      ("n", 4L, 50L), ("n", 5L, 49L), ("n", 6L, 70L))
      .toDF("s", "x", "y")
    val rn = Stats.theilSenCi(noisy, "s", "x", "y").collect()(0)
    graft.Caches.release()
    val (lo, sl, hi) = (rn.getAs[Double]("slope_lo"),
      rn.getAs[Double]("slope"), rn.getAs[Double]("slope_hi"))
    assert(lo <= sl && sl <= hi && lo < hi, s"($lo, $sl, $hi)")
    val rw = Stats.theilSenCi(noisy, "s", "x", "y", z = 3.0)
      .collect()(0)
    graft.Caches.release()
    assert(rw.getAs[Double]("slope_lo") <= lo &&
      rw.getAs[Double]("slope_hi") >= hi)
    intercept[IllegalArgumentException] {
      Stats.theilSenCi(noisy, "s", "x", "y", maxPoints = 3)
    }
    graft.Caches.release()
  }

  test("mannKendallSeasonal: per-season S and variance sum before " +
      "one z; a pure seasonal cycle reads as NO trend") {
    // series u: both seasons monotone up across 4 years
    val up = for (sea <- 1L to 2L; y <- 1L to 4L)
      yield ("u", sea, y, y * 10 + sea)
    // series c: flat within season, seasons at different levels — the
    // cycle plain MK on interleaved time would misread as signal
    val cyc = for (sea <- 1L to 2L; y <- 1L to 4L)
      yield ("c", sea, y, sea * 100)
    val df = (up ++ cyc).toDF("s", "sea", "t", "v")
    val got = RankStats.mannKendallSeasonal(df, col("s"), col("sea"),
        col("t"), col("v"))
      .collect().map(r => r.getAs[String]("series") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_seasons"),
          r.getAs[Long]("s_stat"), r.getAs[Double]("var_s"),
          r.getAs[Double]("z"), r.getAs[Double]("p_value")))).toMap
    graft.Caches.release()
    // per season: S = 6, varnum = 4*3*13 = 156; two seasons
    val varS = math.rint(312.0 / 18.0 * 1e6) / 1e6
    assert(got("u")._1 == 8 && got("u")._2 == 2 && got("u")._3 == 12)
    assert(got("u")._3 == 12 && got("u")._4 == varS)
    assert(math.abs(got("u")._5 - 11.0 / math.sqrt(312.0 / 18.0)) < 1e-6)
    assert(got("u")._6 < 0.05)
    // all within-season ties: S = 0, variance fully tie-corrected
    assert(got("c")._3 == 0L && got("c")._5 == 0.0 && got("c")._6 == 1.0)
    val e = intercept[IllegalArgumentException] {
      RankStats.mannKendallSeasonal(df, col("s"), col("sea"),
        col("t"), col("v"), maxPerSeason = 3)
    }
    assert(e.getMessage.contains("coarsen"))
    graft.Caches.release()
  }

  test("kendallTau: monotone -> +1e6, reversed -> -1e6, balanced " +
      "ties -> 0; all-tied margin -> null; cell guard fires") {
    val up = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("x", "y")
    val r1 = RankStats.kendallTau(up, col("x"), col("y")).collect()(0)
    assert(r1.getAs[Long]("n") == 3 && r1.getAs[Long]("n_cells") == 3)
    assert(r1.getAs[Long]("concordant") == 3 &&
      r1.getAs[Long]("discordant") == 0)
    assert(r1.getAs[Long]("tau_b_ppm") == 1000000L)
    graft.Caches.release()

    val down = Seq((1L, 3L), (2L, 2L), (3L, 1L)).toDF("x", "y")
    val r2 = RankStats.kendallTau(down, col("x"), col("y"))
      .collect()(0)
    assert(r2.getAs[Long]("tau_b_ppm") == -1000000L)
    graft.Caches.release()

    // 2x2 grid: one concordant, one discordant, two y-ties ->
    // C = D = 1, tau = 0; tie pairs 4 on each margin
    val grid = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L))
      .toDF("x", "y")
    val r3 = RankStats.kendallTau(grid, col("x"), col("y"))
      .collect()(0)
    assert(r3.getAs[Long]("concordant") == 1 &&
      r3.getAs[Long]("discordant") == 1)
    assert(r3.getAs[Long]("tau_b_ppm") == 0L)
    graft.Caches.release()

    val flatX = Seq((5L, 1L), (5L, 2L)).toDF("x", "y")
    val r4 = RankStats.kendallTau(flatX, col("x"), col("y"))
      .collect()(0)
    assert(r4.isNullAt(r4.fieldIndex("tau_b_ppm")))
    graft.Caches.release()

    val e2 = intercept[IllegalArgumentException] {
      RankStats.kendallTau(up, col("x"), col("y"), maxCells = 2L)
    }
    assert(e2.getMessage.contains("quantize coarser"))
    graft.Caches.release()
  }
  test("cochranArmitage: linear dose-response (2/10, 5/10, 8/10) " +
      "-> z = 6/sqrt(5); all-success -> nulls; one group refused") {
    val df = (Seq.fill(2)((1L, true)) ++ Seq.fill(8)((1L, false)) ++
      Seq.fill(5)((2L, true)) ++ Seq.fill(5)((2L, false)) ++
      Seq.fill(8)((3L, true)) ++ Seq.fill(2)((3L, false)))
      .toDF("g", "x")
    val r = RankStats.cochranArmitage(df, col("g"), col("x"))
      .collect()(0)
    assert(r.getAs[Long]("n") == 30 &&
      r.getAs[Long]("k_groups") == 3 &&
      r.getAs[Long]("successes") == 15)
    assert(math.abs(r.getAs[Double]("z") - 6.0 / math.sqrt(5.0))
      < 1e-6)
    assert(r.getAs[Double]("p_value") < 0.01)

    val allS = Seq((1L, true), (2L, true), (2L, true)).toDF("g", "x")
    val r2 = RankStats.cochranArmitage(allS, col("g"), col("x"))
      .collect()(0)
    assert(r2.isNullAt(r2.fieldIndex("z")) &&
      r2.isNullAt(r2.fieldIndex("p_value")))

    val one = Seq((1L, true), (1L, false)).toDF("g", "x")
    val e3 = intercept[IllegalArgumentException] {
      RankStats.cochranArmitage(one, col("g"), col("x"))
    }
    assert(e3.getMessage.contains("at least 2 score groups"))
  }

  test("mantelHaenszel: two balanced strata -> OR_MH = 6, " +
      "chi2 = 4/(4/3); zero-variance and singleton strata handled") {
    def stratum(s: String, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((s, true, true)) ++ Seq.fill(b)((s, true, false)) ++
      Seq.fill(c)((s, false, true)) ++ Seq.fill(d)((s, false, false))
    val df = (stratum("s1", 4, 1, 2, 3) ++ stratum("s2", 3, 2, 1, 4))
      .toDF("s", "e", "o")
    val r = graft.ops.Experiment.mantelHaenszel(df, col("s"),
      col("e"), col("o")).collect()(0)
    graft.Caches.release()
    assert(r.getAs[Long]("n_strata") == 2 && r.getAs[Long]("n") == 20
      && r.getAs[Long]("a_total") == 7)
    // ad/n = 1.2 both, bc/n = 0.2 both -> OR 6.0; E = 3 + 2 = 5,
    // V = 2 * 600/900 -> chi2 = (7-5)^2 / 1.333334
    assert(r.getAs[Double]("or_mh") == 6.0)
    assert(math.abs(r.getAs[Double]("chi2_mh") - 3.0) < 1e-5)

    val single = (stratum("s1", 2, 2, 2, 2) ++
      Seq(("s2", true, true))).toDF("s", "e", "o")
    val e2 = intercept[IllegalArgumentException] {
      graft.ops.Experiment.mantelHaenszel(single, col("s"),
        col("e"), col("o"))
    }
    assert(e2.getMessage.contains("fewer than 2 subjects"))
    graft.Caches.release()

    // all exposed -> b = c = 0 in every stratum -> OR null, V = 0
    val allE = (Seq.fill(3)(("s1", true, true)) ++
      Seq.fill(3)(("s1", true, false))).toDF("s", "e", "o")
    val r3 = graft.ops.Experiment.mantelHaenszel(allE, col("s"),
      col("e"), col("o")).collect()(0)
    graft.Caches.release()
    assert(r3.isNullAt(r3.fieldIndex("or_mh")) &&
      r3.isNullAt(r3.fieldIndex("chi2_mh")))
  }
}
