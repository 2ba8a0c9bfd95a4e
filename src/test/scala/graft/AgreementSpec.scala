package graft

import org.apache.spark.sql.functions._

/** Hand cases for the round-12 agreement/paired-test additions:
  * Cohen's kappa, McNemar, Durbin-Watson.
  */
class AgreementSpec extends SparkSuite {
  import spark.implicits._

  test("cohensKappa: textbook 2x2 — po/pe/kappa match the pencil " +
      "values; perfect agreement hits 1e6 ppm") {
    // classic example: raters agree on 20 yes + 15 no of 50;
    // marginals A: 25 yes / 25 no, B: 30 yes / 20 no.
    // po = 35/50 = 0.70; pe = (25*30 + 25*20)/2500 = 0.50;
    // kappa = (0.70 - 0.50) / 0.50 = 0.40
    val rows =
      Seq.fill(20)(("y", "y")) ++ Seq.fill(15)(("n", "n")) ++
      Seq.fill(10)(("y", "n")) ++ Seq.fill(5)(("n", "y"))
    val r = graft.ops.Eval.cohensKappa(rows.toDF("a", "b"),
      col("a"), col("b")).collect()(0)
    assert(r.getAs[Long]("n") == 50L)
    assert(r.getAs[Long]("po_ppm") == 700000L)
    assert(r.getAs[Long]("pe_ppm") == 500000L)
    assert(r.getAs[Long]("kappa_ppm") == 400000L)

    val perfect = Seq(("a", "a"), ("b", "b"), ("c", "c"))
      .toDF("a", "b")
    val p = graft.ops.Eval.cohensKappa(perfect, col("a"), col("b"))
      .collect()(0)
    assert(p.getAs[Long]("po_ppm") == 1000000L)
    assert(p.getAs[Long]("kappa_ppm") == 1000000L)
  }

  test("fleissKappa: pencil panel — 2 units x 3 raters (aaa, abb) " +
      "-> Po=2/3, Pe=5/9, kappa=1/4; non-uniform panels refused") {
    // u1 (a,a,a): ss-m = 9-3 = 6; u2 (a,b,b): ss-m = 5-3 = 2
    // A = 8, PoDen = 2*3*2 = 12 -> Po = 2/3
    // C = (4,2) -> Pe = 20/36 = 5/9
    // kappa = (2/3 - 5/9)/(4/9) = 1/4 (integer: 48/192)
    val df = Seq(("u1", "a"), ("u1", "a"), ("u1", "a"),
      ("u2", "a"), ("u2", "b"), ("u2", "b")).toDF("u", "v")
    val r = graft.ops.Eval.fleissKappa(df, col("u"), col("v"))
      .collect()(0)
    assert(r.getAs[Long]("n_units") == 2L)
    assert(r.getAs[Long]("m_raters") == 3L)
    assert(r.getAs[Long]("k_categories") == 2L)
    assert(r.getAs[Long]("po_ppm") == 666667L)
    assert(r.getAs[Long]("pe_ppm") == 555556L)
    assert(r.getAs[Long]("kappa_ppm") == 250000L)

    val ragged = Seq(("u1", "a"), ("u1", "a"), ("u2", "b"))
      .toDF("u", "v")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Eval.fleissKappa(ragged, col("u"), col("v"))
    }
    assert(e.getMessage.contains("uniform"))
  }

  test("fleissKappa: perfect agreement -> kappa_ppm = 1e6; a " +
      "single observed category -> Pe = 1 and an explicit NULL " +
      "kappa, not NaN") {
    val perfect = Seq(("u1", "a"), ("u1", "a"),
      ("u2", "b"), ("u2", "b")).toDF("u", "v")
    val r = graft.ops.Eval.fleissKappa(perfect, col("u"), col("v"))
      .collect()(0)
    assert(r.getAs[Long]("po_ppm") == 1000000L)
    assert(r.getAs[Long]("kappa_ppm") == 1000000L)

    val mono = Seq(("u1", "a"), ("u1", "a"), ("u2", "a"), ("u2", "a"))
      .toDF("u", "v")
    val m = graft.ops.Eval.fleissKappa(mono, col("u"), col("v"))
      .collect()(0)
    assert(m.getAs[Long]("pe_ppm") == 1000000L)
    assert(m.isNullAt(m.fieldIndex("kappa_ppm")))
  }

  test("gwetAc1: the fleiss pencil panel -> Po=2/3, Pe_gamma=4/9, " +
      "AC1=2/5; single observed category -> NULLs") {
    // same panel as the fleiss spec: (aaa, abb) — integer check
    // (8*36 - 16*12)/(12*(36-16)) = 96/240 = 0.4
    val df = Seq(("u1", "a"), ("u1", "a"), ("u1", "a"),
      ("u2", "a"), ("u2", "b"), ("u2", "b")).toDF("u", "v")
    val r = graft.ops.Eval.gwetAc1(df, col("u"), col("v"))
      .collect()(0)
    assert(r.getAs[Long]("po_ppm") == 666667L)
    assert(r.getAs[Long]("pe_gamma_ppm") == 444444L)
    assert(r.getAs[Long]("ac1_ppm") == 400000L)

    val mono = Seq(("u1", "a"), ("u1", "a"), ("u2", "a"), ("u2", "a"))
      .toDF("u", "v")
    val m = graft.ops.Eval.gwetAc1(mono, col("u"), col("v"))
      .collect()(0)
    assert(m.isNullAt(m.fieldIndex("ac1_ppm")))
  }

  test("gwetAc1 vs fleissKappa: on a prevalence-skewed panel AC1 " +
      "stays high where kappa collapses (the kappa paradox)") {
    // 20 units all-agree 'common', 1 unit split: Po near 1 but
    // pi_common near 1 drives kappa's Pe toward 1
    val rows = (1 to 20).flatMap(i =>
      Seq((s"u$i", "c"), (s"u$i", "c"))) ++
      Seq(("ux", "c"), ("ux", "r"))
    val df = rows.toDF("u", "v")
    val k = graft.ops.Eval.fleissKappa(df, col("u"), col("v"))
      .collect()(0).getAs[Long]("kappa_ppm")
    val a = graft.ops.Eval.gwetAc1(df, col("u"), col("v"))
      .collect()(0).getAs[Long]("ac1_ppm")
    assert(a > 900000L, s"AC1 $a should stay high")
    assert(k < a, s"kappa $k should sit below AC1 $a on skewed labels")
  }

  test("mcnemar: discordant-only pencil case; b = c gives the " +
      "conservative CC unit numerator; no discordance -> p = 1") {
    // b = 8, c = 2: chi = (|8-2|-1)^2/10 = 2.5, z = sqrt(2.5)
    val rows = Seq.fill(30)((true, true)) ++
      Seq.fill(8)((true, false)) ++ Seq.fill(2)((false, true)) ++
      Seq.fill(10)((false, false))
    val r = graft.ops.Eval.mcnemar(rows.toDF("ca", "cb"),
      col("ca"), col("cb")).collect()(0)
    assert(r.getAs[Long]("n") == 50L && r.getAs[Long]("b") == 8L &&
      r.getAs[Long]("c") == 2L)
    val z = math.sqrt(2.5)
    val t = 1.0 / (1.0 + 0.2316419 * z)
    val poly = t * (0.319381530 + t * (-0.356563782 +
      t * (1.781477937 + t * (-1.821255978 + t * 1.330274429))))
    val pHand = BigDecimal(2.0 *
      (math.exp(-z * z / 2.0) / 2.5066282746310002 * poly))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("p_value") == pHand,
      s"got ${r.getAs[Double]("p_value")} vs hand $pHand")

    val none = Seq((true, true), (false, false)).toDF("ca", "cb")
    val r2 = graft.ops.Eval.mcnemar(none, col("ca"), col("cb"))
      .collect()(0)
    assert(r2.getAs[Double]("p_value") == 1.0)
  }

  test("splitConformal: exact rank pick on a hand census, coverage " +
      "audit, and the k > n_cal NULL contract") {
    def isCal(id: Long) =
      ((id % 1000000007L) * 2654435761L + 42L) % 1000000007L %
        1000000L < 500000L
    val ids = (1L to 400L)
    val calIds = ids.filter(isCal).take(9)
    val testIds = ids.filterNot(isCal).take(3)
    assert(calIds.size == 9 && testIds.size == 3)
    // calibration residuals 1..9; alpha=0.2 -> k = ceil(10*0.8) = 8
    // -> qhat = 8; test residuals {5, 8, 9} -> 2 covered
    val rows = calIds.zipWithIndex.map { case (id, i) =>
      (id, i + 1L) } ++ testIds.zip(Seq(5L, 8L, 9L))
    val df = rows.toDF("id", "rq")
    val r = graft.ops.Eval.splitConformal(df, col("id"), col("rq"),
      alphaPpm = 200000L).collect()(0)
    graft.Caches.release()
    assert(r.getAs[Long]("n_cal") == 9L &&
      r.getAs[Long]("n_test") == 3L)
    assert(r.getAs[Long]("k") == 8L &&
      r.getAs[Long]("qhat_q") == 8L)
    assert(r.getAs[Long]("n_covered") == 2L &&
      r.getAs[Long]("coverage_ppm") == 666666L)
    // alpha too small for 9 calibration points: k = 10 > 9 -> NULLs
    val r2 = graft.ops.Eval.splitConformal(df, col("id"), col("rq"),
      alphaPpm = 10000L).collect()(0)
    graft.Caches.release()
    assert(r2.getAs[Long]("k") == 10L && r2.get(3) == null &&
      r2.get(5) == null)
  }

  test("durbinWatson: alternating series pushes d toward 4, a " +
      "monotone ramp toward 0, constant series yields NULL") {
    // alternating 0,2,0,2,... n=6: diffs ±2 (5 of them) num=20;
    // sx=6, qx=12 -> den = 6*12-36 = 36; d = 6*20/36 = 3.333333
    val alt = (1 to 6).map(i => ("alt", i, if (i % 2 == 0) 2L else 0L))
    // ramp 1..6: diffs 1 (5), num=5; sx=21, qx=91 ->
    // den = 6*91-441 = 105; d = 30/105 = 0.285714
    val ramp = (1 to 6).map(i => ("ramp", i, i.toLong))
    val const = (1 to 4).map(i => ("const", i, 7L))
    val df = (alt ++ ramp ++ const).toDF("s", "t", "x")
    val got = graft.ops.RankStats.durbinWatson(df, "s", "t", col("x"))
      .collect().map(r => r.getString(0) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(got("alt").contains(3.333333))
    assert(got("ramp").contains(0.285714))
    assert(got("const").isEmpty, s"got ${got("const")}")
  }

  test("icc: 2 units x 2 ratings (1,2 / 3,4) -> MSB=4, MSW=0.5, " +
      "ICC = 7/9; all-equal -> null; unbalanced/one-unit refused") {
    val df = Seq(("A", 1L), ("A", 2L), ("B", 3L), ("B", 4L))
      .toDF("u", "x")
    val r = graft.ops.Eval.icc(df, col("u"), col("x")).collect()(0)
    graft.Caches.release()
    assert(r.getAs[Long]("n_units") == 2 &&
      r.getAs[Long]("k_ratings") == 2)
    assert(r.getAs[Double]("msb") == 4.0)
    assert(r.getAs[Double]("msw") == 0.5)
    // (4 - 0.5)/(4 + 0.5) = 7/9 -> floor(777777.7..+0.5)
    assert(r.getAs[Long]("icc_ppm") == 777778L)

    val const = Seq(("A", 5L), ("A", 5L), ("B", 5L), ("B", 5L))
      .toDF("u", "x")
    val c = graft.ops.Eval.icc(const, col("u"), col("x"))
      .collect()(0)
    graft.Caches.release()
    assert(c.isNullAt(c.fieldIndex("icc_ppm")))

    val unbal = Seq(("A", 1L), ("A", 2L), ("B", 3L)).toDF("u", "x")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Eval.icc(unbal, col("u"), col("x"))
    }
    assert(e.getMessage.contains("balanced"))
    graft.Caches.release()

    val one = Seq(("A", 1L), ("A", 2L)).toDF("u", "x")
    val e2 = intercept[IllegalArgumentException] {
      graft.ops.Eval.icc(one, col("u"), col("x"))
    }
    assert(e2.getMessage.contains("at least 2 units"))
    graft.Caches.release()
  }
}
