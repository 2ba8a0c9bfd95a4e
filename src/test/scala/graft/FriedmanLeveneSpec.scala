package graft

import graft.ops.{Eval, RankStats}
import org.apache.spark.sql.functions._

/** Hand-computed textbook cases for the Brown–Forsythe variance
  * test, the Friedman repeated-measures rank test, and average
  * precision at k.
  */
class FriedmanLeveneSpec extends SparkSuite {
  import spark.implicits._

  override protected def withFixture(test: NoArgTest) =
    try super.withFixture(test) finally graft.Caches.release()

  test("brownForsythe: A=[1..5] vs B=[10,10,10,10] -> medians 3/10, " +
      "mean devs 1.2/0, F = 8 with df (1, 7)") {
    val df = (Seq(1, 2, 3, 4, 5).map(("A", _)) ++
      Seq(10, 10, 10, 10).map(("B", _))).toDF("g", "v")
    val r = RankStats.brownForsythe(df, col("g"), col("v"))
      .orderBy(col("grp")).collect()
    assert(r.map(_.getAs[Long]("n")).toSeq == Seq(5L, 4L))
    assert(r.map(_.getAs[Long]("median")).toSeq == Seq(3L, 10L))
    assert(r.map(_.getAs[Double]("mean_dev")).toSeq == Seq(1.2, 0.0))
    // Between = 5(1.2-2/3)^2 + 4(2/3)^2 = 3.2; Within = 10-36/5 = 2.8
    // F = (7/1) * 3.2/2.8 = 8
    assert(math.abs(r(0).getAs[Double]("f_stat") - 8.0) <= 2e-6)
    assert(r(0).getAs[Long]("df1") == 1L)
    assert(r(0).getAs[Long]("df2") == 7L)
  }

  test("brownForsythe: even-n group uses the LOWER median") {
    val df = Seq(("A", 1), ("A", 2), ("A", 3), ("A", 4),
      ("B", 5), ("B", 5)).toDF("g", "v")
    val r = RankStats.brownForsythe(df, col("g"), col("v"))
      .orderBy(col("grp")).collect()
    assert(r(0).getAs[Long]("median") == 2L) // pos (4+1) div 2 = 2
  }

  test("bartlett: two 5-point groups, variances 2.5 vs 10 -> " +
      "T matches the closed form; constant group refused") {
    val df = ((1 to 5).map(v => ("a", v.toLong)) ++
      Seq(2L, 4L, 6L, 8L, 10L).map(("b", _))).toDF("g", "v")
    val r = RankStats.bartlett(df, col("g"), col("v"))
      .orderBy(col("grp")).collect()
    assert(r.map(_.getAs[Long]("n")).toSeq == Seq(5L, 5L))
    assert(r(0).getAs[Double]("var_g") == 2.5)
    assert(r(1).getAs[Double]("var_g") == 10.0)
    // T = [8 ln 6.25 - (4 ln 2.5 + 4 ln 10)] / (1 + (0.5-0.125)/3)
    val expT = (8.0 * math.log(6.25) -
      (4.0 * math.log(2.5) + 4.0 * math.log(10.0))) / 1.125
    assert(math.abs(r(0).getAs[Double]("t_stat") - expT) < 1e-5)
    assert(r(0).getAs[Long]("df") == 1L)
    graft.Caches.release()

    val const = Seq(("a", 1L), ("a", 2L), ("b", 7L), ("b", 7L))
      .toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      RankStats.bartlett(const, col("g"), col("v"))
    }
    assert(e.getMessage.contains("zero variance"))
    graft.Caches.release()

    val oneGroup = Seq(("a", 1L), ("a", 2L), ("a", 5L)).toDF("g", "v")
    val e2 = intercept[IllegalArgumentException] {
      RankStats.bartlett(oneGroup, col("g"), col("v"))
    }
    assert(e2.getMessage.contains("at least 2 groups"))
    graft.Caches.release()

    val tiny = Seq(("a", 1L), ("a", 2L), ("b", 7L)).toDF("g", "v")
    val e3 = intercept[IllegalArgumentException] {
      RankStats.bartlett(tiny, col("g"), col("v"))
    }
    assert(e3.getMessage.contains("n >= 2"))
    graft.Caches.release()
  }

  test("friedman: 3 complete blocks x 3 treatments, no ties -> " +
      "rank sums 5/6/7, chi2 = 2/3, df 2") {
    val df = Seq(
      ("b1", "t1", 1.0), ("b1", "t2", 2.0), ("b1", "t3", 3.0),
      ("b2", "t1", 1.0), ("b2", "t2", 2.0), ("b2", "t3", 3.0),
      ("b3", "t1", 5.0), ("b3", "t2", 4.0), ("b3", "t3", 3.0))
      .toDF("b", "t", "v")
    val r = RankStats.friedman(df, col("b"), col("t"), col("v"))
      .orderBy(col("treatment")).collect()
    assert(r.map(_.getAs[Double]("rank_sum")).toSeq ==
      Seq(5.0, 6.0, 7.0))
    // chi2 = 12/(3*3*4) * (25+36+49) - 3*3*4 = 110/3 - 36 = 2/3
    assert(math.abs(r(0).getAs[Double]("chi2") - 2.0 / 3.0) <= 2e-6)
    assert(r(0).getAs[Double]("chi2") ==
      r(0).getAs[Double]("chi2_adj")) // no ties
    assert(r(0).getAs[Long]("df") == 2L)
  }

  test("friedman: within-block ties get average ranks on the 2-rank " +
      "lattice and shrink chi2_adj's denominator") {
    // b1: t1=t2=1 (avg rank 1.5 each), t3=2 (rank 3)
    val df = Seq(
      ("b1", "t1", 1.0), ("b1", "t2", 1.0), ("b1", "t3", 2.0),
      ("b2", "t1", 1.0), ("b2", "t2", 2.0), ("b2", "t3", 3.0))
      .toDF("b", "t", "v")
    val r = RankStats.friedman(df, col("b"), col("t"), col("v"))
      .orderBy(col("treatment")).collect()
    assert(r.map(_.getAs[Double]("rank_sum")).toSeq ==
      Seq(2.5, 3.5, 6.0))
    // tie term: one pair -> T = 2^3-2 = 6; corr = 1 - 6/(2*3*8) = 7/8
    val chi = r(0).getAs[Double]("chi2")
    assert(math.abs(r(0).getAs[Double]("chi2_adj") - chi / 0.875)
      <= 2e-6)
  }

  test("friedman: incomplete blocks are rejected, not silently " +
      "ranked") {
    val df = Seq(
      ("b1", "t1", 1.0), ("b1", "t2", 2.0),
      ("b2", "t1", 1.0)).toDF("b", "t", "v")
    intercept[IllegalArgumentException] {
      RankStats.friedman(df, col("b"), col("t"), col("v"))
    }
  }

  test("friedman: equal-sized blocks over DISJOINT treatment sets " +
      "are refused — the global distinct-treatment leg") {
    // both blocks have k=2 distinct treatments, but {t1,t2} vs
    // {t3,t4}: the old two-legged check silently accepted this
    val df = Seq(
      ("b1", "t1", 1.0), ("b1", "t2", 2.0),
      ("b2", "t3", 1.0), ("b2", "t4", 2.0)).toDF("b", "t", "v")
    val e = intercept[IllegalArgumentException] {
      RankStats.friedman(df, col("b"), col("t"), col("v"))
    }
    assert(e.getMessage.contains("SAME"))
  }

  test("cochranQ: textbook 4 blocks x 3 binary treatments -> " +
      "Q = 2(3*14-36)/(18-14) = 3, df 2") {
    val df = Seq(
      ("b1", "t1", 1), ("b1", "t2", 1), ("b1", "t3", 0),
      ("b2", "t1", 1), ("b2", "t2", 0), ("b2", "t3", 0),
      ("b3", "t1", 1), ("b3", "t2", 1), ("b3", "t3", 1),
      ("b4", "t1", 0), ("b4", "t2", 0), ("b4", "t3", 0))
      .toDF("b", "t", "x")
    val r = graft.ops.Eval.cochranQ(df, col("b"), col("t"),
      col("x") === 1).orderBy(col("treatment")).collect()
    assert(r.map(_.getAs[Long]("successes")).toSeq == Seq(3L, 2L, 1L))
    assert(r(0).getAs[Double]("q_stat") == 3.0)
    assert(r(0).getAs[Long]("df") == 2L)
  }

  test("cochranQ: incomplete blocks rejected") {
    val df = Seq(("b1", "t1", 1), ("b1", "t2", 0), ("b2", "t1", 1))
      .toDF("b", "t", "x")
    intercept[IllegalArgumentException] {
      graft.ops.Eval.cochranQ(df, col("b"), col("t"), col("x") === 1)
    }
  }

  test("cochranQ: disjoint equal-width treatment sets refused; " +
      "all-constant blocks yield NULL q_stat, not NaN") {
    val disjoint = Seq(
      ("b1", "t1", 1), ("b1", "t2", 0),
      ("b2", "t3", 1), ("b2", "t4", 0)).toDF("b", "t", "x")
    intercept[IllegalArgumentException] {
      graft.ops.Eval.cochranQ(disjoint, col("b"), col("t"),
        col("x") === 1)
    }
    // every block all-success: k·N − ΣR² = 2·4 − (4+4) = 0 -> null
    val const = Seq(
      ("b1", "t1", 1), ("b1", "t2", 1),
      ("b2", "t1", 1), ("b2", "t2", 1)).toDF("b", "t", "x")
    val r = graft.ops.Eval.cochranQ(const, col("b"), col("t"),
      col("x") === 1).collect()
    assert(r.forall(_.isNullAt(r(0).fieldIndex("q_stat"))))
  }

  test("cronbachAlpha: disjoint equal-width item panels refused") {
    val df = Seq(
      ("u1", "i1", 1L), ("u1", "i2", 2L),
      ("u2", "i3", 1L), ("u2", "i4", 2L)).toDF("u", "i", "x")
    intercept[IllegalArgumentException] {
      graft.ops.Eval.cronbachAlpha(df, col("u"), col("i"), col("x"))
    }
  }

  test("cronbachAlpha: perfectly-aligned items -> alpha = 1; " +
      "partly-aligned -> 2/3") {
    val perfect = Seq(("u1", "i1", 1L), ("u1", "i2", 1L),
      ("u2", "i1", 2L), ("u2", "i2", 2L),
      ("u3", "i1", 3L), ("u3", "i2", 3L)).toDF("u", "i", "x")
    val r1 = graft.ops.Eval.cronbachAlpha(perfect, col("u"),
      col("i"), col("x")).collect()(0)
    assert(r1.getAs[Long]("n_units") == 3 &&
      r1.getAs[Long]("k_items") == 2)
    assert(r1.getAs[Long]("alpha_ppm") == 1000000L)
    // A = 2*(3*14-36) = 12; T = (3,3,6) -> B = 3*54-144 = 18
    // alpha = 2 * (1 - 12/18) = 2/3
    val partial = Seq(("u1", "i1", 1L), ("u1", "i2", 2L),
      ("u2", "i1", 2L), ("u2", "i2", 1L),
      ("u3", "i1", 3L), ("u3", "i2", 3L)).toDF("u", "i", "x")
    val r2 = graft.ops.Eval.cronbachAlpha(partial, col("u"),
      col("i"), col("x")).collect()(0)
    assert(r2.getAs[Long]("alpha_ppm") == 666667L)
  }

  test("heapsLaw: hand-placed first occurrences give exact vocab " +
      "counts at power-of-two checkpoints") {
    // global token stream (doc order): a b a b | c a d e
    val df = Seq((1L, "a b a b"), (2L, "c a d e"))
      .toDF("doc_id", "text")
    val r = graft.llmdata.TextAnalysis.heapsLaw(df, "doc_id", "text",
      minN = 1L).orderBy(col("n_tokens")).collect()
    assert(r.map(_.getAs[Long]("n_tokens")).toSeq ==
      Seq(1L, 2L, 4L, 8L))
    // firsts: a@1 b@2 c@5 d@7 e@8 -> V = 1, 2, 2, 5
    assert(r.map(_.getAs[Long]("vocab")).toSeq == Seq(1L, 2L, 2L, 5L))
    assert(r(0).getAs[Long]("slope_q") > 0L)
  }

  test("psi: 2-bin hand case — exact decile edge, add-half " +
      "smoothing, terms sum to the headline score") {
    // base 1..4 (edge at 2), current all 3s
    val df = (Seq(1, 2, 3, 4).map((true, _)) ++
      Seq(3, 3, 3).map((false, _))).toDF("b", "v")
    val r = graft.ops.Eval.psi(df, col("b"), col("v"), bins = 2)
      .orderBy(col("bin")).collect()
    assert(r.map(_.getAs[Long]("bin")).toSeq == Seq(0L, 1L))
    assert(r(0).isNullAt(r(0).fieldIndex("lo_q")))
    assert(r(1).getAs[Long]("lo_q") == 2L)
    assert(r.map(_.getAs[Long]("base_n")).toSeq == Seq(2L, 2L))
    assert(r.map(_.getAs[Long]("cur_n")).toSeq == Seq(0L, 3L))
    // bin0: (2.5/5 - 0.5/4)*ln((2.5/5)/(0.5/4)) = 0.375*ln 4
    // bin1: (2.5/5 - 3.5/4)*ln((2.5/5)/(3.5/4))
    val t0 = 0.375 * math.log(4.0)
    val t1 = (0.5 - 0.875) * math.log(0.5 / 0.875)
    assert(math.abs(r(0).getAs[Long]("term_e6") -
      math.floor(t0 * 1e6 + 0.5)) <= 1)
    assert(math.abs(r(0).getAs[Long]("psi_e6") -
      math.floor((t0 + t1) * 1e6 + 0.5)) <= 1)
    assert(r(0).getAs[Long]("psi_e6") == r(1).getAs[Long]("psi_e6"))
  }

  test("jonckheereTerpstra: fully-separated ordered groups -> " +
      "2J = 8, z = 4/(2*sqrt(5/3)); ties count half; one group " +
      "refused") {
    val df = Seq((1L, 1L), (1L, 2L), (2L, 3L), (2L, 4L))
      .toDF("g", "v")
    val r = RankStats.jonckheereTerpstra(df, col("g"), col("v"))
      .collect()(0)
    graft.Caches.release()
    assert(r.getAs[Long]("n") == 4 && r.getAs[Long]("k_groups") == 2)
    assert(r.getAs[Long]("j_x2") == 8L)
    val expZ = 4.0 / (2.0 * math.sqrt(5.0 / 3.0))
    assert(math.abs(r.getAs[Double]("z") - expZ) < 1e-6)
    assert(r.getAs[Double]("p_value") < 0.07)

    val tied = Seq((1L, 5L), (2L, 5L)).toDF("g", "v")
    val r2 = RankStats.jonckheereTerpstra(tied, col("g"), col("v"))
      .collect()(0)
    graft.Caches.release()
    assert(r2.getAs[Long]("j_x2") == 1L) // the tie's half-pair

    val one = Seq((1L, 1L), (1L, 2L)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      RankStats.jonckheereTerpstra(one, col("g"), col("v"))
    }
    graft.Caches.release()
  }

  test("effectSize: shifted equal-variance groups -> d from the " +
      "pooled SD, g shrunk by Hedges' J; zero variance -> nulls") {
    val df = ((1 to 5).map(v => ("a", v.toLong)) ++
      (3 to 7).map(v => ("b", v.toLong))).toDF("g", "v")
    val r = RankStats.effectSize(df, col("g") === "a",
      col("g") === "b", col("v")).collect()(0)
    assert(r.getAs[Long]("n_a") == 5 && r.getAs[Long]("n_b") == 5)
    assert(r.getAs[Double]("mean_a") == 3.0 &&
      r.getAs[Double]("mean_b") == 5.0)
    val sp = math.sqrt(2.5)
    val d = -2.0 / sp
    assert(math.abs(r.getAs[Double]("cohens_d") - d) < 1e-6)
    assert(math.abs(r.getAs[Double]("hedges_g") -
      d * (1.0 - 3.0 / 31.0)) < 1e-5)

    val const = Seq(("a", 1L), ("a", 1L), ("b", 1L), ("b", 1L))
      .toDF("g", "v")
    val r2 = RankStats.effectSize(const, col("g") === "a",
      col("g") === "b", col("v")).collect()(0)
    assert(r2.isNullAt(r2.fieldIndex("cohens_d")))
  }

  test("pageTrend: perfectly increasing 2x3 blocks -> L=28, z=2, " +
      "one-sided p ~ 0.0228; k=2 refused") {
    val df = Seq(
      ("b1", 1L, 1.0), ("b1", 2L, 2.0), ("b1", 3L, 3.0),
      ("b2", 1L, 4.0), ("b2", 2L, 5.0), ("b2", 3L, 6.0))
      .toDF("b", "t", "v")
    val r = RankStats.pageTrend(df, col("b"), col("t"), col("v"))
      .collect()
    graft.Caches.release()
    assert(r.map(_.getAs[Long]("position")).toSeq == Seq(1L, 2L, 3L))
    assert(r.map(_.getAs[Long]("rank_sum_x2")).toSeq ==
      Seq(4L, 8L, 12L))
    assert(r(0).getAs[Long]("l_x2") == 56L)
    assert(r(0).getAs[Double]("z") == 2.0)
    assert(math.abs(r(0).getAs[Double]("p_value") - 0.02275) < 1e-3)

    val two = Seq(("b1", 1L, 1.0), ("b1", 2L, 2.0))
      .toDF("b", "t", "v")
    intercept[IllegalArgumentException] {
      RankStats.pageTrend(two, col("b"), col("t"), col("v"))
    }
    graft.Caches.release()
  }

  test("wilcoxonSignedRank: (1,2,-3) -> W+=3, z=0, p=1; all-tied " +
      "positives hit the tie-corrected z; zeros dropped and counted") {
    val df = Seq((1L, 0L), (2L, 0L), (-3L, 0L)).toDF("a", "b")
    val r = RankStats.wilcoxonSignedRank(df, col("a"), col("b"))
      .collect()(0)
    assert(r.getAs[Long]("n_pairs") == 3 &&
      r.getAs[Long]("n_zero") == 0)
    assert(r.getAs[Long]("w_plus_x2") == 6L) // W+ = 3
    assert(r.getAs[Double]("z") == 0.0)
    assert(r.getAs[Double]("p_value") == 1.0)
    graft.Caches.release()

    // d = (1,1,1): r2 = 4 each, W2 = 12, var = 3.5 - 24/48 = 3
    val tied = Seq((1L, 0L), (1L, 0L), (1L, 0L)).toDF("a", "b")
    val r2 = RankStats.wilcoxonSignedRank(tied, col("a"), col("b"))
      .collect()(0)
    assert(r2.getAs[Long]("w_plus_x2") == 12L)
    assert(math.abs(r2.getAs[Double]("z") -
      3.0 / math.sqrt(3.0)) < 1e-6)
    graft.Caches.release()

    val withZero = Seq((5L, 5L), (10L, 5L)).toDF("a", "b")
    val r3 = RankStats.wilcoxonSignedRank(withZero, col("a"),
      col("b")).collect()(0)
    assert(r3.getAs[Long]("n_pairs") == 1 &&
      r3.getAs[Long]("n_zero") == 1)
    assert(r3.getAs[Double]("z") == 1.0) // (1 - 0.5)/sqrt(0.25)
    graft.Caches.release()

    // ALL-zero diffs: every pair drops, the census is empty —
    // n_pairs 0, W+ 0, explicit null z/p (no NaN, no divide error),
    // and n_zero still reports the dropped count.
    val allZero = Seq((5L, 5L), (7L, 7L), (9L, 9L)).toDF("a", "b")
    val r4 = RankStats.wilcoxonSignedRank(allZero, col("a"),
      col("b")).collect()(0)
    assert(r4.getAs[Long]("n_pairs") == 0 &&
      r4.getAs[Long]("n_zero") == 3)
    assert(r4.getAs[Long]("w_plus_x2") == 0L)
    assert(r4.isNullAt(r4.fieldIndex("z")))
    assert(r4.isNullAt(r4.fieldIndex("p_value")))
    graft.Caches.release()
  }

  test("signFlipTest: all-zero diffs -> every permutation ties the " +
      "observed 0 -> p = 1e6; one-sided signal at K=19 -> exact " +
      "rank p; deterministic under re-run") {
    val zeros = Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("id", "d")
    val r = graft.ops.Experiment.signFlipTest(zeros, col("id"),
      col("d"), nPerms = 19).collect()(0)
    assert(r.getAs[Long]("obs_sum") == 0L)
    assert(r.getAs[Long]("n_ge") == 19L)
    assert(r.getAs[Long]("p_ppm") == 1000000L)
    graft.Caches.release()

    val signal = (1L to 40L).map((_, 10L)).toDF("id", "d")
    val s1 = graft.ops.Experiment.signFlipTest(signal, col("id"),
      col("d"), nPerms = 19).collect()(0)
    graft.Caches.release()
    val s2 = graft.ops.Experiment.signFlipTest(signal, col("id"),
      col("d"), nPerms = 19).collect()(0)
    graft.Caches.release()
    assert(s1.getAs[Long]("obs_sum") == 400L)
    // a perm ties only if all 40 hash signs agree — deterministic 0
    assert(s1.getAs[Long]("n_ge") == 0L)
    assert(s1.getAs[Long]("p_ppm") == 50000L) // 1/20
    assert(s1.getAs[Long]("n_ge") == s2.getAs[Long]("n_ge"))
  }

  test("psi: colliding decile edges leave bins empty in BOTH " +
      "samples — their smoothed terms still enter psi_e6") {
    // base all-1s: bins=3 edges both collapse to 1, so bins 1 and 2
    // see zero rows from either sample; the add-half convention
    // says they still contribute (p−q)·ln(p/q) with c=0
    val df = (Seq(1, 1, 1).map((true, _)) ++ Seq(1).map((false, _)))
      .toDF("b", "v")
    val r = graft.ops.Eval.psi(df, col("b"), col("v"), bins = 3)
      .orderBy(col("bin")).collect()
    assert(r.map(_.getAs[Long]("bin")).toSeq == Seq(0L, 1L, 2L))
    assert(r.map(_.getAs[Long]("base_n")).toSeq == Seq(3L, 0L, 0L))
    assert(r.map(_.getAs[Long]("cur_n")).toSeq == Seq(1L, 0L, 0L))
    // both empty bins carry the identical nonzero smoothed term
    assert(r(1).getAs[Long]("term_e6") == r(2).getAs[Long]("term_e6"))
    assert(r(1).getAs[Long]("term_e6") != 0L)
    assert(math.abs(r.map(_.getAs[Long]("term_e6")).sum -
      r(0).getAs[Long]("psi_e6")) <= 2)
  }

  test("yuenT: 1..10 vs 11..20 at 20% trim -> h=6, trimmed means " +
      "5.5/15.5, df exactly 10 by symmetry") {
    val df = ((1 to 10).map(("a", _)) ++ (11 to 20).map(("b", _)))
      .toDF("g", "v")
    val r = graft.ops.RankStats.yuenT(df, col("g") === "a", col("v"),
      trimPpm = 200000L).collect()(0)
    assert(r.getAs[Long]("n_a") == 10 && r.getAs[Long]("h_a") == 6)
    assert(r.getAs[Double]("tmean_a") == 5.5)
    assert(r.getAs[Double]("tmean_b") == 15.5)
    // da = db = (345 - 55^2/10)/(6*5) = 42.5/30; t = -10/sqrt(2da)
    val d = 42.5 / 30.0
    assert(math.abs(r.getAs[Double]("t_stat") -
      (-10.0 / math.sqrt(2 * d))) < 1e-4)
    assert(r.getAs[Double]("df_yuen") == 10.0)
    assert(r.getAs[Double]("p_value") < 0.001)
  }

  test("pageHinkley: running-mean deviation accumulates on the " +
      "1e-6 lattice; up- and down-shifts alarm on the right side") {
    val up = Seq(("s", 1, 10), ("s", 2, 10), ("s", 3, 10),
      ("s", 4, 20), ("s", 5, 20)).toDF("g", "t", "n")
    val r = graft.functions.Stats.pageHinkley(up, "g", "t", "n",
      deltaQ = 0L, lambdaQ = 5000000L).orderBy(col("t")).collect()
    // m: 0,0,0, then 20e6-12.5e6=7.5e6, then +20e6-14e6 -> 13.5e6
    assert(r.map(_.getAs[Long]("ph_pos")).toSeq ==
      Seq(0L, 0L, 0L, 7500000L, 13500000L))
    assert(r.map(_.getAs[Int]("alarm")).toSeq == Seq(0, 0, 0, 1, 1))
    val down = Seq(("s", 1, 20), ("s", 2, 20), ("s", 3, 20),
      ("s", 4, 10)).toDF("g", "t", "n")
    val r2 = graft.functions.Stats.pageHinkley(down, "g", "t", "n",
      deltaQ = 0L, lambdaQ = 5000000L).orderBy(col("t")).collect()
    assert(r2(3).getAs[Long]("ph_neg") == 7500000L)
    assert(r2(3).getAs[Int]("alarm") == 1)
    assert(r2(3).getAs[Long]("ph_pos") == 0L)
  }

  test("averagePrecisionAtK: AP = (1 + 2/3)/2 = 5/6 on the exact " +
      "lcm lattice; zero-relevant query reports 0") {
    val df = Seq(
      ("q", 1L, 10L, 1L), ("q", 2L, 9L, 0L),
      ("q", 3L, 8L, 2L), ("q", 4L, 7L, 0L),
      ("z", 9L, 5L, 0L))
      .toDF("q", "d", "s", "g")
    val r = Eval.averagePrecisionAtK(df, col("q"), col("d"),
      col("s"), col("g"), k = 10).orderBy(col("query")).collect()
    assert(r(0).getAs[Long]("n_relevant") == 2L)
    assert(r(0).getAs[Long]("ap_ppm") == 833333L) // floor(5/6 * 1e6)
    assert(r(1).getAs[Long]("ap_ppm") == 0L)
  }

  // ---- guard-aggregate ANSI sweep (the bartlett n=1 find,
  // generalized): every degenerate input must reach its EXPLANATORY
  // require or documented null — never an NPE from unboxing a null
  // guard leg, never an ANSI divide-by-zero inside a close ----

  test("friedman: empty input hits the explanatory require, not an " +
      "NPE from the null min/max guard legs") {
    val e = intercept[IllegalArgumentException] {
      RankStats.friedman(
        Seq.empty[(String, String, Double)].toDF("b", "t", "v"),
        col("b"), col("t"), col("v"))
    }
    assert(e.getMessage.contains("empty input"))
  }

  test("friedman: fully-tied blocks zero the tie correction — " +
      "chi2 = 0 and chi2_adj is the documented null, not an ANSI " +
      "divide-by-zero") {
    val df = Seq(("b1", "t1", 1.0), ("b1", "t2", 1.0),
      ("b2", "t1", 2.0), ("b2", "t2", 2.0)).toDF("b", "t", "v")
    val r = RankStats.friedman(df, col("b"), col("t"), col("v"))
      .orderBy(col("treatment")).collect()
    assert(r.length == 2)
    assert(r(0).getAs[Double]("chi2") == 0.0)
    assert(r(0).isNullAt(r(0).fieldIndex("chi2_adj")))
  }

  test("cochranQ: empty input hits the explanatory require, not an " +
      "NPE") {
    val e = intercept[IllegalArgumentException] {
      Eval.cochranQ(
        Seq.empty[(String, String, Boolean)].toDF("b", "t", "x"),
        col("b"), col("t"), col("x"))
    }
    assert(e.getMessage.contains("empty input"))
  }

  test("cronbachAlpha: empty input hits the explanatory require; a " +
      "constant panel (all unit totals equal, B = 0) emits the " +
      "documented null alpha, not an ANSI divide-by-zero") {
    val e = intercept[IllegalArgumentException] {
      Eval.cronbachAlpha(
        Seq.empty[(String, String, Long)].toDF("u", "i", "x"),
        col("u"), col("i"), col("x"))
    }
    assert(e.getMessage.contains("empty input"))

    val const = Seq(("u1", "i1", 5L), ("u1", "i2", 5L),
      ("u2", "i1", 5L), ("u2", "i2", 5L)).toDF("u", "i", "x")
    val r = Eval.cronbachAlpha(const, col("u"), col("i"), col("x"))
      .collect()(0)
    assert(r.getAs[Long]("n_units") == 2L &&
      r.getAs[Long]("k_items") == 2L)
    assert(r.isNullAt(r.fieldIndex("alpha_ppm")))
  }

  test("yuenT: one side entirely absent hits the explanatory " +
      "kept-values require (missing group reads as h = 0), and an " +
      "empty frame does too") {
    val oneSide = (11 to 20).map(("b", _)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      RankStats.yuenT(oneSide, col("g") === "a", col("v"))
    }
    assert(e.getMessage.contains("fewer than 2 kept values"))
    val e2 = intercept[IllegalArgumentException] {
      RankStats.yuenT(Seq.empty[(String, Int)].toDF("g", "v"),
        col("g") === "a", col("v"))
    }
    assert(e2.getMessage.contains("fewer than 2 kept values"))
  }
}
