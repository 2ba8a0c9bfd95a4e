package graft

import graft.llmdata.{Similarity, TextAnalysis}
import graft.ops.DataQuality
import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** Round-9 analytics additions: attribution edges, key skew, PMI,
  * scalar quantization, RFM — hand-computed small cases.
  */
class AnalyticsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(sec: Long): java.sql.Timestamp =
    new java.sql.Timestamp(sec * 1000L)

  test("lastTouchAttribution: latest touch wins, lookback excludes " +
      "stale touches, same-ts touch credits, no-touch purchases " +
      "come back unattributed") {
    val ev = Seq(
      // user 1: view@10, click@20, purchase@25 -> click (latest)
      (1L, ts(10), 1L, "view", 1.0),
      (2L, ts(20), 1L, "click", 1.0),
      (3L, ts(25), 1L, "purchase", 10.0),
      // user 2: view@5, purchase@100 with 20s lookback -> stale
      (4L, ts(5), 2L, "view", 1.0),
      (5L, ts(100), 2L, "purchase", 20.0),
      // user 3: touch at the exact purchase ts -> credited
      (6L, ts(50), 3L, "view", 1.0),
      (7L, ts(50), 3L, "purchase", 30.0),
      // user 4: purchase with no touches at all
      (8L, ts(60), 4L, "purchase", 40.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Streams.lastTouchAttribution(ev, "purchase",
        Seq("view", "click"), maxDelaySec = 20L)
      .select(col("event_id"), col("channel"))
      .collect().map(r => r.getLong(0) ->
        Option(r.getString(1))).toMap
    assert(got == Map(3L -> Some("click"), 5L -> None,
      7L -> Some("view"), 8L -> None), s"got $got")
    // boundary: touch exactly maxDelay before the purchase credits
    val edge = Seq((1L, ts(0), 9L, "view", 1.0),
      (2L, ts(20), 9L, "purchase", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val e = Streams.lastTouchAttribution(edge, "purchase",
        Seq("view"), maxDelaySec = 20L)
      .select(col("channel")).collect()
    assert(e.map(r => Option(r.getString(0))).toSeq ==
      Seq(Some("view")))
  }

  test("keySkew: flags only keys over factor x mean, exact ppm " +
      "shares, null key counted, empty and uniform inputs empty") {
    // 100 rows: key 0 x 60, keys 1..40 x 1 each -> 41 keys,
    // mean 100/41; key 0: 60*41 = 2460 > 10*100 -> flagged alone
    val df = (Seq.fill(60)(Some(0L)) ++
      (1L to 40L).map(Some(_))).toDF("k")
    val got = DataQuality.keySkew(df, "k", factor = 10.0).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == 0L && r.getLong(1) == 60L)
    assert(r.getLong(2) == 600000L) // 60 * 1e6 div 100
    assert(r.getLong(3) == 41L && r.getLong(4) == 100L)
    // null keys participate (the classic hot key)
    val withNull = (Seq.fill(60)(Option.empty[Long]) ++
      (1L to 40L).map(Some(_))).toDF("k")
    val n = DataQuality.keySkew(withNull, "k", factor = 10.0).collect()
    assert(n.length == 1 && n.head.isNullAt(0) &&
      n.head.getLong(1) == 60L)
    // uniform: nothing flagged
    assert(DataQuality.keySkew((1L to 50L).toDF("k"), "k").count() == 0)
  }

  test("pmiCollocations: hand-computed pmi on a fixed corpus, " +
      "minCount prunes, cross-doc bigrams never pair") {
    // "a b" x3 in one doc each; "c" alone ends a doc — (b,c) never
    // adjacent across doc boundaries
    val docs = Seq("a b x", "a b y", "a b", "c").toDF("text")
    val got = TextAnalysis.pmiCollocations(docs, "text", minCount = 3L)
      .collect()
    graft.Caches.release()
    assert(got.length == 1)
    val r = got.head
    assert((r.getString(0), r.getString(1)) == (("a", "b")))
    assert(r.getLong(2) == 3L && r.getLong(3) == 3L && r.getLong(4) == 3L)
    // N = 9 tokens; pmi = ln(3*9/(3*3)) = ln(3)
    assert(math.abs(r.getDouble(5) - math.log(3.0)) < 1e-6)
  }

  test("scalarQuantize: codes span 0..levels, constant dim codes 0, " +
      "reconstruction error within the rounding bound") {
    val df = Seq(
      (1L, Seq(0.0f, 5.0f)), (2L, Seq(0.5f, 5.0f)),
      (3L, Seq(1.0f, 5.0f))).toDF("vec_id", "embedding")
    val q = Similarity.scalarQuantize(df, "vec_id", "embedding",
      levels = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // dim 0: lo 0, hi 1 -> codes 0, 5, 10; dim 1 constant -> 0
    assert(q((1L, 0L))._1 == 0L && q((2L, 0L))._1 == 5L &&
      q((3L, 0L))._1 == 10L)
    assert(Seq(1L, 2L, 3L).forall(v => q((v, 1L))._1 == 0L))
    assert(q((1L, 0L))._2 == 0.0 && q((1L, 0L))._3 == 1.0)
  }

  test("rfm: scores and segments replay ntile semantics with the " +
      "custkey tiebreak") {
    val day = 86400L * 1000L
    val orders = Seq(
      (1L, new java.sql.Timestamp(10 * day), 100.0),
      (1L, new java.sql.Timestamp(9 * day), 100.0),
      (2L, new java.sql.Timestamp(8 * day), 50.0),
      (3L, new java.sql.Timestamp(6 * day), 300.0),
      (4L, new java.sql.Timestamp(2 * day), 10.0)
    ).toDF("o_custkey", "o_orderdate", "o_totalprice")
    val got = graft.functions.Stats.rfm(orders, "o_custkey",
        "o_orderdate", "o_totalprice", buckets = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1),
        r.getLong(2), r.getDouble(3), r.getString(7))).toMap
    // recency (vs day 10): c1=0, c2=2, c3=4, c4=8
    assert(got(1L)._1 == 0L && got(2L)._1 == 2L &&
      got(3L)._1 == 4L && got(4L)._1 == 8L)
    // frequency: c1=2, others 1; monetary: c1=200, c2=50, c3=300, c4=10
    assert(got(1L)._2 == 2L && got(1L)._3 == 200.0)
    // ntile(2) over recency asc (0,2,4,8): buckets (1,1,2,2) ->
    // r_score (2,2,1,1); frequency asc with custkey tiebreak
    // (c2=1,c3=1,c4=1,c1=2): buckets c2,c3 -> 1, c4,c1 -> 2 ->
    // f: c1=2, c2=1, c3=1, c4=2; monetary asc (10,50,200,300):
    // m: c4=1, c2=1, c1=2, c3=2
    assert(got(1L)._4 == "222", got(1L))
    assert(got(2L)._4 == "211", got(2L))
    assert(got(3L)._4 == "112", got(3L))
    assert(got(4L)._4 == "121", got(4L))
  }

  test("itemNeighbors + recommend: hand-computed quantized cosines, " +
      "seen items excluded, exact long score sums, basket guard") {
    import graft.ops.Recommend
    // baskets: b1{A,B}, b2{A,B}, b3{A,C}, b4{B,C} ->
    // counts A=3 B=3 C=2; support AB=2, AC=1, BC=1
    val baskets = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "C"), (4L, "B"), (4L, "C"))
      .toDF("b", "i")
    val nbrs = Recommend.itemNeighbors(baskets, "b", "i", k = 2,
      minSupport = 1L)
    val got = nbrs.collect().map(r => (r.getString(0), r.getString(1))
      -> r.getLong(3)).toMap
    val qAB = math.round(1e6 * 2.0 / math.sqrt(9.0))   // 666667
    val qAC = math.round(1e6 * 1.0 / math.sqrt(6.0))   // 408248
    val qBC = qAC
    assert(got == Map(("A", "B") -> qAB, ("B", "A") -> qAB,
      ("A", "C") -> qAC, ("C", "A") -> qAC,
      ("B", "C") -> qBC, ("C", "B") -> qBC), s"got $got")
    // user u1 has {A}: candidates B (from A: qAB) and C (qAC); u2 has
    // {A, B}: only C unseen, scored from BOTH sources qAC + qBC
    val users = Seq((10L, "A"), (20L, "A"), (20L, "B"))
      .toDF("u", "i")
    val rec = Recommend.recommend(users, "u", "i", nbrs, k = 3)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(rec == Map(
      (10L, "B") -> ((qAB, 1L)), (10L, "C") -> ((qAC, 1L)),
      (20L, "C") -> ((qAC + qBC, 2L))), s"rec $rec")
    intercept[IllegalArgumentException] {
      Recommend.itemNeighbors(
        (1 to 50).map(i => (1L, s"i$i")).toDF("b", "i"), "b", "i",
        k = 2, minSupport = 1L, maxPerBasket = 10)
    }
  }

  test("lDiversity: distinct sensitive count, top share ppm, at_risk") {
    // group g1: sens {a,a,a,b} -> l=2, top 750000ppm, at_risk (l<3);
    // group g2: sens {a,b,c} -> l=3, top 333333ppm, ok
    val df = Seq(("g1", "a"), ("g1", "a"), ("g1", "a"), ("g1", "b"),
      ("g2", "a"), ("g2", "b"), ("g2", "c")).toDF("q", "sens")
    val got = DataQuality.lDiversity(df, Seq("q"), "sens", l = 3L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))))
      .toMap
    assert(got == Map("g1" -> ((4L, 2L, 750000L, 1)),
      "g2" -> ((3L, 3L, 333333L, 0))), s"got $got")
  }

  test("seasonalDecompose: integer median polish sweep, " +
      "value == seasonal + trend + residual exactly") {
    import graft.functions.Stats
    // one series, 3 periods x 2 positions; pos medians (seasonal):
    // pos1 of {10,20,30}=20, pos2 of {1,2,9}=2; detrended per period:
    // p1{-10,-1}->med -1 (rank ceil(.5*2)=1 -> -10!); check rank:
    // sorted {-10,-1}, rank 1 -> -10
    val df = Seq(("s", 1, 1, 10L), ("s", 1, 2, 1L),
      ("s", 2, 1, 20L), ("s", 2, 2, 2L),
      ("s", 3, 1, 30L), ("s", 3, 2, 9L)).toDF("sr", "per", "pos", "v")
    val rows = Stats.seasonalDecompose(df, "sr", "per", "pos", "v")
      .collect().map(r => (r.getInt(1), r.getInt(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    rows.foreach { case (_, (v, s, t, res)) =>
      assert(v == s + t + res) }
    assert(rows((1, 1)) == ((10L, 20L, -10L, 0L)), rows((1, 1)))
    assert(rows((1, 2)) == ((1L, 2L, -10L, 9L)), rows((1, 2)))
    assert(rows((3, 1)) == ((30L, 20L, 7L, 3L)), rows((3, 1)))
  }

  test("cusum: closed form equals the sequential recursion; alarm on " +
      "sustained shift only") {
    import graft.functions.Stats
    // baseline 10, slack 1: quiet run, then a sustained +3 shift
    val xs = Seq(10L, 11L, 9L, 10L, 13L, 13L, 13L, 13L, 10L)
    val df = xs.zipWithIndex.map { case (x, i) => ("s", i, x) }
      .toDF("sr", "t", "x")
    val got = Stats.cusum(df, "sr", "t", "x", lit(10L), slack = 1L,
        threshold = 5L)
      .orderBy(col("t")).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getInt(5)))
    // sequential reference
    var sp = 0L; var sn = 0L
    val want = xs.map { x =>
      sp = math.max(0L, sp + (x - 10L - 1L))
      sn = math.max(0L, sn - (x - 10L + 1L))
      (x, sp, if (sp > 5L || sn > 5L) 1 else 0)
    }
    assert(got.toSeq == want, s"got ${got.toSeq}\nwant $want")
    // the shift run (four +3s -> s_pos 2,4,6,8) alarms from the 7th
    // and stays up through the decay step (s_pos 7 > 5)
    assert(got.map(_._3).toSeq == Seq(0, 0, 0, 0, 0, 0, 1, 1, 1))
  }

  test("quantileNormalize: every series maps onto the cross-series " +
      "mean order statistics; unequal lengths average the reachable") {
    import graft.functions.Stats
    // s1 sorted: 1,2,3 ; s2 sorted: 10, 20 -> ref: r1=(1+10)/2=5.5,
    // r2=(2+20)/2=11, r3=3 (only s1 reaches rank 3)
    val df = Seq(("s1", 1L, 3.0), ("s1", 2L, 1.0), ("s1", 3L, 2.0),
      ("s2", 4L, 20.0), ("s2", 5L, 10.0)).toDF("sr", "k", "v")
    val got = Stats.quantileNormalize(df, "sr", "v", "k")
      .collect().map(r => (r.getString(0), r.getLong(3)) ->
        r.getDouble(4)).toMap
    assert(got == Map(("s1", 1L) -> 5.5, ("s1", 2L) -> 11.0,
      ("s1", 3L) -> 3.0, ("s2", 1L) -> 5.5, ("s2", 2L) -> 11.0),
      s"got $got")
  }

  test("fdProfile: holds iff distinct(A) == distinct(A,B); " +
      "violations counted; nulls dropped listwise") {
    // a determines b (a1->x, a2->y); b does NOT determine a
    // (x -> a1 and a3)
    val df = Seq(("a1", "x"), ("a1", "x"), ("a2", "y"), ("a3", "x"),
      (null, "z")).toDF("a", "b")
    val got = DataQuality.fdProfile(df, Seq("a", "b"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5))))
      .toMap
    assert(got == Map(
      ("a", "b") -> ((3L, 3L, 0L, 1)),
      ("b", "a") -> ((2L, 3L, 1L, 0))), s"got $got")
  }

  test("covarianceMatrix matches Spark's builtin covar_samp/corr " +
      "to 1e-6 and shares one n") {
    import graft.functions.Tabular
    val df = Seq((1.0, 2.0, 10.0), (2.0, 1.0, 11.0), (3.0, 5.0, 9.0),
      (4.0, 4.0, 14.0), (5.0, 7.0, 13.0)).toDF("a", "b", "c")
    val got = Tabular.covarianceMatrix(df, Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val ref = df.agg(
      covar_samp(col("a"), col("b")), corr(col("a"), col("b")),
      covar_samp(col("a"), col("c")), corr(col("a"), col("c")),
      covar_samp(col("b"), col("c")), corr(col("b"), col("c"))).head()
    def close(x: Double, y: Double) = math.abs(x - y) < 1e-6
    assert(got.size == 3 && got.values.forall(_._1 == 5L))
    assert(close(got(("a", "b"))._2, ref.getDouble(0)))
    assert(close(got(("a", "b"))._3, ref.getDouble(1)))
    assert(close(got(("a", "c"))._2, ref.getDouble(2)))
    assert(close(got(("a", "c"))._3, ref.getDouble(3)))
    assert(close(got(("b", "c"))._2, ref.getDouble(4)))
    assert(close(got(("b", "c"))._3, ref.getDouble(5)))
  }

  test("covarianceMatrixQuantized == decimal covarianceMatrix " +
      "bit-for-bit on grid data; gates trip off-grid and on " +
      "oversized scaled values") {
    import graft.functions.Tabular
    // 2dp-grid data incl. negatives (exercises the signed hi/lo
    // split of cross products)
    val df = Seq((1.25, -2.50, 10.00), (2.00, 1.75, -11.25),
      (3.50, 5.00, 9.75), (-4.25, 4.00, 14.50), (5.00, -7.25, 13.0))
      .toDF("a", "b", "c").repartition(3)
    val cs = Seq("a", "b", "c")
    val dec = Tabular.covarianceMatrix(df, cs)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val q = Tabular.covarianceMatrixQuantized(df, cs)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(q == dec, s"quantized $q != decimal $dec")
    // off-grid input (1/3 is not on the 1e-2 grid) -> gate trips
    val bad = Seq((1.0 / 3.0, 1.0), (2.0, 3.0), (4.0, 5.0))
      .toDF("a", "b")
    val ex = intercept[Exception] {
      Tabular.covarianceMatrixQuantized(bad, Seq("a", "b")).collect()
    }
    assert(ex.getMessage.contains("contract violated"),
      ex.getMessage)
    // scaled magnitude past 2^31 -> gate trips
    val big = Seq((3.0e7, 1.0), (2.0, 3.0), (4.0, 5.0))
      .toDF("a", "b")
    val ex2 = intercept[Exception] {
      Tabular.covarianceMatrixQuantized(big, Seq("a", "b")).collect()
    }
    assert(ex2.getMessage.contains("contract violated"),
      ex2.getMessage)
  }

  test("ewmaTruncated: hand-computed halving weights, series-head " +
      "term count and weight sum, partition isolation") {
    import graft.functions.Stats
    // weights at scale 1e6, decay 1/2, W=4: 1000000 500000 250000 125000
    val df = Seq(("s1", 1L, 2L), ("s1", 2L, 3L), ("s1", 3L, 4L),
      ("s2", 1L, 7L)).toDF("sr", "t", "x")
    val got = Stats.ewmaTruncated(df, "sr", "t", "x",
        num = 1L, den = 2L, window = 4)
      .select(col("sr"), col("t"), col("smoothed_q"), col("n_terms"),
        col("weight_sum"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(("s1", 1L)) == ((2000000L, 1L, 1000000L)))
    assert(got(("s1", 2L)) == ((3000000L + 1000000L, 2L, 1500000L)))
    assert(got(("s1", 3L)) ==
      ((4000000L + 1500000L + 500000L, 3L, 1750000L)))
    // s2 sees none of s1's history
    assert(got(("s2", 1L)) == ((7000000L, 1L, 1000000L)))
  }

  test("autocorrelation: hand-computed r_k on an alternating series, " +
      "pair counts, per-series isolation") {
    import graft.functions.Stats
    // x = 1,2,1,2: m=1.5, dev = -.5,.5,-.5,.5, den = 1.0
    // r1 = (.5*-.5)+(-.5*.5)+(.5*-.5) = -0.75 over 3 pairs
    // r2 = (-.5*-.5)+(.5*.5) = 0.5 over 2 pairs
    val df = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 1L),
      ("a", 4L, 2L), ("b", 1L, 5L), ("b", 2L, 6L), ("b", 3L, 7L))
      .toDF("sr", "t", "x")
    val got = Stats.autocorrelation(df, "sr", "t", "x", maxLag = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got(("a", 1L)) == ((3L, -0.75)))
    assert(got(("a", 2L)) == ((2L, 0.5)))
    // b = 5,6,7: m=6, dev -1,0,1, den=2; r1 = (0*-1)+(1*0) = 0;
    // r2 = (1*-1) = -0.5
    assert(got(("b", 1L)) == ((2L, 0.0)))
    assert(got(("b", 2L)) == ((1L, -0.5)))
  }

  test("transitionMatrix: per-key next pairs, ppm floor division, " +
      "tiebreak orders equal timestamps, last events emit nothing") {
    import graft.functions.Stats
    val df = Seq(
      (1L, 1L, 1L, "A"), (2L, 2L, 1L, "B"), (3L, 3L, 1L, "A"),
      (4L, 1L, 2L, "A"), (5L, 2L, 2L, "C"),
      // user 3: two events at the SAME ts -> event_id orders them
      (6L, 5L, 3L, "X"), (7L, 5L, 3L, "Y"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = Stats.transitionMatrix(df, "user_id", "ts", "event_id",
        "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      ("A", "B") -> ((1L, 2L, 500000L)),
      ("A", "C") -> ((1L, 2L, 500000L)),
      ("B", "A") -> ((1L, 1L, 1000000L)),
      ("X", "Y") -> ((1L, 1L, 1000000L))), s"got $got")
  }

  test("pacf: Durbin-Levinson closed form hand-computed from the " +
      "alternating series' exact ACF") {
    import graft.functions.Stats
    // x = 1,2,1,2: r1=-0.75, r2=0.5, r3=-0.25 (all exact at 6dp)
    // pacf2 = (0.5-0.5625)/(1-0.5625) = -1/7; phi21 = -6/7
    // pacf3 = (−0.25 + 3/7 − 3/28)/(1 − 9/14 + 1/14) = (1/14)/(3/7) = 1/6
    val df = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 1L),
      ("a", 4L, 2L)).toDF("sr", "t", "x")
    val r = Stats.pacf(df, "sr", "t", "x").collect().head
    assert(r.getString(0) == "a")
    assert(r.getDouble(1) == -0.75)
    assert(r.getDouble(2) == -0.142857)
    assert(r.getDouble(3) == 0.166667)
  }

  test("poissonBootstrapCi: constant metric degenerates the CI to " +
      "the point value; runs are deterministic; quantile order holds") {
    import graft.ops.Experiment
    val const = (1L to 200L).map(i => (i, 5.0)).toDF("id", "x")
    val r = Experiment.poissonBootstrapCi(const, col("id"), col("x"),
      b = 40).collect().head
    assert(r.getLong(0) == 40L && r.getLong(1) == 200L)
    assert(r.getDouble(2) == 5.0 && r.getDouble(3) == 5.0 &&
      r.getDouble(4) == 5.0 && r.getDouble(5) == 5.0, s"got $r")
    val varied = (1L to 1000L).map(i => (i, (i % 97).toDouble))
      .toDF("id", "x")
    val a = Experiment.poissonBootstrapCi(varied, col("id"),
      col("x"), b = 40).collect().head
    val b2 = Experiment.poissonBootstrapCi(varied, col("id"),
      col("x"), b = 40).collect().head
    assert(a == b2)
    assert(a.getDouble(3) <= a.getDouble(4) &&
      a.getDouble(4) <= a.getDouble(5), s"got $a")
    assert(a.getDouble(3) < a.getDouble(2) &&
      a.getDouble(2) < a.getDouble(5),
      s"theta outside CI: $a")
  }

  test("jackknifeRatio: hand-computed leave-one-out replicates, " +
      "bias-corrected theta and SE from the quantized sums") {
    import graft.ops.Experiment
    // groups: g1 {(10,2),(20,3)} g2 {(30,5)} g3 {(40,10)}
    // N=100 D=20 theta=5; LOO: 70/15, 70/15, 60/10
    val df = Seq((1, 10.0, 2.0), (1, 20.0, 3.0), (2, 30.0, 5.0),
      (3, 40.0, 10.0)).toDF("g", "n", "d")
    val r = Experiment.jackknifeRatio(df, col("g"), col("n"),
      col("d")).collect().head
    assert(r.getLong(0) == 3L)
    assert(r.getDouble(1) == 5.0)
    // quantized replicates: floor(70/15*1e6+0.5)=4666667 (x2), 6000000
    val qs = Seq(4666667L, 4666667L, 6000000L)
    val qbar = qs.sum.toDouble / 3.0
    val tbar = qbar / 1000000.0
    val expJk = math.rint((3.0 * 5.0 - 2.0 * tbar) * 1e6) / 1e6
    val ss = qs.map(q => (q - qbar) * (q - qbar)).sum
    val expSe = math.sqrt(2.0 / 3.0 * ss) / 1000000.0
    assert(r.getDouble(2) == expJk, s"theta_jk ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(3) - expSe) <= 1e-6,
      s"se ${r.getDouble(3)} vs $expSe")
  }

  test("propensityStratifiedAte: hand-computed stratum diffs and " +
      "size-weighted ATE; off-support stratum refuses") {
    import graft.ops.Experiment
    // stratum 1 (scores 1,2): diff 10-4 = 6; stratum 2 (3,4): 0-2
    val df = Seq((1L, 1, 10.0, 1L), (2L, 0, 4.0, 2L),
      (3L, 1, 0.0, 3L), (4L, 0, 2.0, 4L))
      .toDF("sq", "t", "y", "tb")
    val got = Experiment.propensityStratifiedAte(df, col("t"),
        col("y"), col("sq"), col("tb"), strata = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getDouble(4)))).toMap
    assert(got == Map(1L -> ((1L, 1L, 6.0, 2.0)),
      2L -> ((1L, 1L, -2.0, 2.0))), s"got $got")
    // stratum 2 all-treated -> off-support refusal
    val bad = Seq((1L, 1, 1.0, 1L), (2L, 0, 1.0, 2L),
      (3L, 1, 1.0, 3L), (4L, 1, 1.0, 4L)).toDF("sq", "t", "y", "tb")
    intercept[IllegalArgumentException] {
      Experiment.propensityStratifiedAte(bad, col("t"), col("y"),
        col("sq"), col("tb"), strata = 2)
    }
  }

  test("ebShrinkRates: identical segments collapse to the pooled " +
      "rate; shrunk estimates sit between raw rate and pool, small " +
      "segments shrinking hardest") {
    import graft.ops.Experiment
    // identical segments: between-variance is pure noise -> m = cap
    val same = (1L to 1200L).map(i => (i % 4, (i / 4) % 10 == 0))
      .toDF("seg", "s")
    val rs = Experiment.ebShrinkRates(same, col("seg"), col("s"))
      .collect()
    assert(rs.forall(r => r.getDouble(4) == r.getDouble(3)),
      s"identical segs must not move: ${rs.toSeq}")
    // ten large segments at the SAME true rate plus one tiny
    // outlier whose deviation is plausible noise at n=5 — the
    // regime EB exists for (large TRUE heterogeneity would
    // correctly yield m ~ 0 and no shrinkage)
    val mixed = ((0L until 10L).flatMap(sg =>
      (1L to 500L).map(i => (sg, i % 10 == 0))) ++
      (1L to 5L).map(i => (10L, i <= 3)))  // tiny, rate 0.6
      .toDF("seg", "s")
    val rm = Experiment.ebShrinkRates(mixed, col("seg"), col("s"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(3), r.getDouble(4)))).toMap
    val pbar = (10 * 50.0 + 3.0) / 5005.0
    rm.foreach { case (seg, (_, rate, shrunk)) =>
      val lo = math.min(rate, pbar) - 1e-6
      val hi = math.max(rate, pbar) + 1e-6
      assert(shrunk >= lo && shrunk <= hi,
        s"seg $seg shrunk $shrunk outside [$rate, $pbar]") }
    // the tiny segment must actually shrink, and proportionally
    // further toward the pool than any large segment
    val tinyMove = (rm(10L)._3 - rm(10L)._2).abs /
      (rm(10L)._2 - pbar).abs
    assert(tinyMove > 0.2, s"tiny seg barely shrank: $rm")
    val bigMove = (0L until 10L).map(sg =>
      (rm(sg)._3 - rm(sg)._2).abs /
        math.max(1e-9, (rm(sg)._2 - pbar).abs)).max
    assert(tinyMove > bigMove, s"tiny seg must shrink hardest: $rm")
  }

  test("positionAttribution: hand-computed U-shaped credits, solo " +
      "and pair degenerate splits, '(none)' bucket") {
    import graft.streaming.Streams
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      // user 1: view, click, view -> purchase (k=3)
      (1L, ts(1), 1L, "view"), (2L, ts(2), 1L, "click"),
      (3L, ts(3), 1L, "view"), (4L, ts(4), 1L, "purchase"),
      // user 2: solo click (k=1)
      (5L, ts(10), 2L, "click"), (6L, ts(11), 2L, "purchase"),
      // user 3: no touches
      (7L, ts(100), 3L, "purchase"),
      // user 4: pair (k=2)
      (8L, ts(20), 4L, "view"), (9L, ts(21), 4L, "click"),
      (10L, ts(22), 4L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = Streams.positionAttribution(ev, "purchase",
        Seq("view", "click"), maxDelaySec = 3600L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    // view: 400000+400000 (u1 ends) + 500000 (u4) = 1300000, 2 convs
    // click: 200000 (u1 middle) + 1000000 (u2) + 500000 (u4) = 1700000
    assert(got == Map(
      "view" -> ((1300000L, 2L)),
      "click" -> ((1700000L, 3L)),
      "(none)" -> ((1000000L, 1L))), s"got $got")
  }

  test("phiAbs: A&S polynomial within 1e-6 of known normal CDF " +
      "values") {
    import graft.ops.Experiment
    val df = Seq(0.0, 1.0, 1.959964, 3.0).toDF("z")
      .select(col("z"), Experiment.phiAbs(col("z")).as("phi"))
    val got = df.collect().map(r => r.getDouble(0) -> r.getDouble(1))
      .toMap
    val exp = Map(0.0 -> 0.5, 1.0 -> 0.8413447, 1.959964 -> 0.975,
      3.0 -> 0.9986501)
    exp.foreach { case (z, v) =>
      assert(math.abs(got(z) - v) < 1e-6, s"phi($z) = ${got(z)}") }
  }

  test("bhFdr: null segments reject nothing; one overwhelming " +
      "segment rejects exactly itself; rejections are a rank prefix") {
    import graft.ops.Experiment
    // 4 segments balanced (null) -> no rejections (seg and v must
    // be independent digits of i or cells go empty)
    val nul = (1L to 2000L).map(i =>
      (i % 4, (i / 4) % 2, (i / 8) % 2 == 0)).toDF("seg", "v", "s")
    val rn = Experiment.bhFdr(nul, col("seg"), col("v"), col("s"))
      .collect()
    assert(rn.length == 4, s"cells filtered: ${rn.length}")
    assert(rn.forall(_.getLong(8) == 0L),
      s"null data rejected: ${rn.toSeq}")
    // segment 0 has a massive effect; 1-3 are null
    val eff = (1L to 4000L).map { i =>
      val seg = i % 4
      val v = (i / 4) % 2
      val s = if (seg == 0) v == 1 else (i / 8) % 2 == 0
      (seg, v, s)
    }.toDF("seg", "v", "s")
    val re = Experiment.bhFdr(eff, col("seg"), col("v"), col("s"))
      .collect().map(r => (r.getLong(0), r.getLong(7),
        r.getLong(8)))
    val rejected = re.filter(_._3 == 1L)
    assert(rejected.map(_._1).toSet == Set(0L), s"got ${re.toSeq}")
    // prefix property: rejections occupy the smallest ranks
    val maxRej = re.filter(_._3 == 1L).map(_._2).max
    assert(re.filter(_._2 <= maxRej).forall(_._3 == 1L))
  }

  test("jackknifeRatioDiff: hand-computed paired replicates " +
      "(delta 2/7, replicates 4 and 0 -> se exactly 2.0)") {
    import graft.ops.Experiment
    // v0: g1 (10,2), g2 (30,5); v1: g1 (20,4), g2 (10,1)
    // LOO g1: 10/1 - 30/5 = 4; LOO g2: 20/4 - 10/2 = 0
    val df = Seq(("0", 1, 10.0, 2.0), ("0", 2, 30.0, 5.0),
      ("1", 1, 20.0, 4.0), ("1", 2, 10.0, 1.0))
      .toDF("v", "g", "n", "d")
    val r = Experiment.jackknifeRatioDiff(df, col("v"), col("g"),
      col("n"), col("d")).collect().head
    assert(r.getLong(0) == 2L)
    assert(r.getDouble(1) == 0.285714, s"delta ${r.getDouble(1)}")
    assert(r.getDouble(2) == -1.428571, s"jk ${r.getDouble(2)}")
    assert(r.getDouble(3) == 2.0, s"se ${r.getDouble(3)}")
  }

  test("kaplanMeierBy: per-group curves match single-group KM run " +
      "per slice; extinction zeroes only its own group") {
    import graft.ops.Experiment
    val df = Seq(
      ("a", 1L, 1L), ("a", 2L, 0L), ("a", 3L, 1L),
      // b goes extinct at t=2 (both remaining fail)
      ("b", 1L, 1L), ("b", 2L, 1L), ("b", 2L, 1L))
      .toDF("g", "dur", "ev")
    val got = Experiment.kaplanMeierBy(df, "g", col("dur"),
        col("ev"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // group a alone: t=1 S=2/3; t=2 censored S=2/3; t=3 S=0 (1/1
    // fails -> extinction at the last point)
    for (g <- Seq("a", "b")) {
      val single = Experiment.kaplanMeier(
        df.where(col("g") === g), col("dur"), col("ev"))
        .collect().map(r => (g, r.getLong(0)) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      single.foreach { case (k, v) =>
        assert(got(k) == v, s"$k: ${got(k)} vs $v") }
    }
    assert(got(("b", 2L))._3 == 0.0 && got(("a", 2L))._3 != 0.0,
      s"extinction must stay within group b: $got")
  }

  test("canonicalizeUrl: each rule fires (fragment, utm, case, " +
      "default port, trailing slash) and non-targets pass through") {
    import graft.llmdata.TextAnalysis.canonicalizeUrl
    val cases = Seq(
      ("HTTP://WWW.Ex.COM:80/A/b/?utm_source=x&ref=2#frag",
        "http://www.ex.com/A/b?ref=2"),
      ("https://h.com:443/p?utm_only=1", "https://h.com/p"),
      ("http://h.com/p/", "http://h.com/p"),
      ("http://h.com/p?a=1&utm_campaign=z", "http://h.com/p?a=1"),
      // path case preserved; non-default port kept; no-op URL stable
      ("http://h.com:8080/Path?q=1", "http://h.com:8080/Path?q=1"))
    val df = cases.map(_._1).toDF("u")
      .withColumn("c", canonicalizeUrl(col("u")))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1))
      .toMap
    cases.foreach { case (u, exp) =>
      assert(got(u) == exp, s"$u -> ${got(u)} (want $exp)") }
  }

  test("logRank: perfectly balanced groups give chi2 0; complete " +
      "separation hand-computes to 3.000003 (quantized 3.0)") {
    import graft.ops.Experiment
    val bal = Seq((1L, 1L, "a"), (2L, 1L, "a"), (1L, 1L, "b"),
      (2L, 1L, "b")).toDF("dur", "ev", "g")
    val rb = Experiment.logRank(bal, col("dur"), col("ev"),
      col("g")).collect().head
    assert(rb.getDouble(4) == 0.0 && rb.getLong(5) == 0L, s"$rb")
    // a dies at t=1 (both), b censored at t=5: V = 1/3, chi2 = 3
    val sep = Seq((1L, 1L, "a"), (1L, 1L, "a"), (5L, 0L, "b"),
      (5L, 0L, "b")).toDF("dur", "ev", "g")
    val rs = Experiment.logRank(sep, col("dur"), col("ev"),
      col("g")).collect().head
    assert(rs.getLong(0) == 2L && rs.getLong(1) == 2L)
    assert(rs.getLong(2) == 2L && rs.getLong(3) == 0L)
    assert(rs.getDouble(4) == 3.000003, s"chi2 ${rs.getDouble(4)}")
    assert(rs.getLong(5) == 0L)
  }

  test("maxDrawdown: peak-to-trough hand case; earliest-time " +
      "tiebreak on equal drawdowns") {
    import graft.functions.Stats
    // a: cum 10,6,8,0,5 -> dd 0,4,2,10,5 -> max 10 at t=4
    // b: cum 5,0,5,0 -> dd 0,5,0,5 -> max 5, FIRST at t=2
    val df = Seq(("a", 1, 10.0), ("a", 2, -4.0), ("a", 3, 2.0),
      ("a", 4, -8.0), ("a", 5, 5.0),
      ("b", 1, 5.0), ("b", 2, -5.0), ("b", 3, 5.0), ("b", 4, -5.0))
      .toDF("sr", "t", "v")
    val got = Stats.maxDrawdown(df, "sr", "t", col("v"))
      .collect().map(r => r.getString(0) ->
        ((r.getInt(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got == Map("a" -> ((4, 10.0, 10.0)),
      "b" -> ((2, 5.0, 5.0))), s"got $got")
  }

  test("mmrSelect: redundancy demotes a near-duplicate below a " +
      "less relevant but novel candidate; ties break by id") {
    import graft.llmdata.Similarity
    // A rel 1.0 {a,b}; B rel 0.8 {a,b} (dup of A); C rel 0.5 {c,d}
    // pick1 A (7e6); pick2: B 5.6e6-3e6=2.6e6 < C 3.5e6 -> C; pick3 B
    val sl = Seq(
      (1L, 1000000L, Seq("a", "b")),
      (2L, 800000L, Seq("a", "b")),
      (3L, 500000L, Seq("c", "d")))
      .toDF("id", "rel_ppm", "toks")
    val got = Similarity.mmrSelect(sl, "id", "rel_ppm", "toks", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq((1L, 1L, 7000000L), (2L, 3L, 3500000L),
      (3L, 2L, 2600000L)), s"got ${got.toSeq}")
    // identical rel + disjoint tokens: obj ties -> smaller id first
    val tie = Seq((7L, 100000L, Seq("x")), (4L, 100000L, Seq("y")))
      .toDF("id", "rel_ppm", "toks")
    val t = Similarity.mmrSelect(tie, "id", "rel_ppm", "toks", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(t.toSeq == Seq((1L, 4L), (2L, 7L)), s"got ${t.toSeq}")
  }

  test("gini: zero for equal shares, hand-computed 0.75 for a " +
      "single-holder group") {
    import graft.functions.Stats
    val df = Seq(("a", 1.0, 1L), ("a", 1.0, 2L), ("a", 1.0, 3L),
      ("a", 1.0, 4L),
      ("b", 0.0, 1L), ("b", 0.0, 2L), ("b", 0.0, 3L), ("b", 4.0, 4L))
      .toDF("g", "x", "k")
    val got = Stats.gini(df, "g", col("x"), col("k"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    // b: sorted 0,0,0,4 -> (2*4*4e6 - 5*4e6) / (4*4e6) = 0.75
    assert(got == Map("a" -> ((4L, 0.0)), "b" -> ((4L, 0.75))),
      s"got $got")
  }

  test("isotonicFit: PAVA hand case pools the violator pair " +
      "(weighted), leaves monotone tails untouched") {
    import graft.functions.Tabular
    // rates 1, 0, 1 with weights 1, 3, 1 -> pool bins 0-1 to 1/4
    val b = Seq((0L, 1L, 1L), (1L, 0L, 3L), (2L, 1L, 1L))
      .toDF("bin", "events", "n")
    val got = Tabular.isotonicFit(b, "bin", "events", "n")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(0L -> ((1000000L, 250000L)),
      1L -> ((0L, 250000L)), 2L -> ((1000000L, 1000000L))),
      s"got $got")
    // already monotone input is a fixed point
    val mono = Seq((0L, 1L, 10L), (1L, 5L, 10L), (2L, 9L, 10L))
      .toDF("bin", "events", "n")
    val fix = Tabular.isotonicFit(mono, "bin", "events", "n")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    assert(fix.forall { case (_, (o, f)) => o == f }, s"got $fix")
  }

  test("mahalanobis2d: hand-computed distances on an axis-aligned " +
      "cross (corners 2.0, center 0.0)") {
    import graft.functions.Tabular
    val df = Seq((1L, 0.0, 0.0), (2L, 2.0, 0.0), (3L, 0.0, 2.0),
      (4L, 2.0, 2.0), (5L, 1.0, 1.0)).toDF("id", "x", "y")
    // means (1,1); vxx=vyy=1, vxy=0 -> corners d2=2, center 0
    val got = Tabular.mahalanobis2d(df, col("x"), col("y"))
      .select(col("id"), col("d2"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 2.0, 2L -> 2.0, 3L -> 2.0, 4L -> 2.0,
      5L -> 0.0), s"got $got")
  }

  test("goldenRecord: per-attribute mode, null exclusion, " +
      "value-ascending tiebreak, all-null attr stays null") {
    import graft.llmdata.Dedup
    val df = Seq(
      (1L, "A", Option("p1"), "s"),
      (1L, "A", None, "s"),
      (1L, "B", Option("p1"), "s"),
      // e2: three-way name tie -> min "A"; phone all null -> null
      (2L, "C", None, "t"),
      (2L, "B", None, "t"),
      (2L, "A", None, "u"))
      .toDF("id", "name", "phone", "seg")
    val got = Dedup.goldenRecord(df, "id",
        Seq("name", "phone", "seg"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), Option(r.getString(3)),
          r.getString(4)))).toMap
    assert(got == Map(
      1L -> ((3L, "A", Some("p1"), "s")),
      2L -> ((3L, "A", None, "t"))), s"got $got")
  }

  test("replayPolicyValue: matched-round reward average with the " +
      "match-rate audit; an unmatched policy reports NULL, not 0") {
    import graft.ops.Experiment
    val logs = Seq(("x", 2.0), ("x", 4.0), ("y", 100.0))
      .toDF("arm", "r")
    val got = Experiment.replayPolicyValue(logs, col("arm"), col("r"),
        Seq("always_x" -> lit("x"), "always_q" -> lit("q")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4))))).toMap
    assert(got("always_x") == ((3L, 2L, 666666L, Some(3.0))))
    assert(got("always_q") == ((3L, 0L, 0L, None)))
  }

  test("replayPolicyValueIps: hand-weighted IPS and SNIPS; uniform " +
      "logging reduces IPS to k x plain replay") {
    import graft.ops.Experiment
    // logged: x at p=0.25 (r 2, 4), y at p=0.75 (r 100); policy
    // always-x: IPS = (2/0.25 + 4/0.25)/3 = 8; SNIPS = 24/8 = 3
    val logs = Seq(("x", 2.0, 250000L), ("x", 4.0, 250000L),
      ("y", 100.0, 750000L)).toDF("arm", "r", "lp")
    val got = Experiment.replayPolicyValueIps(logs, col("arm"),
        col("r"), col("lp"), Seq("always_x" -> lit("x"),
          "always_q" -> lit("q")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_
          .asInstanceOf[Double]), Option(r.get(4)).map(_
          .asInstanceOf[Double])))).toMap
    assert(got("always_x") == ((3L, 2L, Some(8.0), Some(3.0))))
    assert(got("always_q") == ((3L, 0L, Some(0.0), None)))
    // uniform logging at p = 1/2 over two arms: IPS = 2 x replay
    val uni = Seq(("x", 2.0, 500000L), ("y", 6.0, 500000L))
      .toDF("arm", "r", "lp")
    val ru = Experiment.replayPolicyValueIps(uni, col("arm"),
      col("r"), col("lp"), Seq("ax" -> lit("x"))).collect()(0)
    assert(ru.getAs[Double]("value_ips") == 2.0) // (2/0.5)/2
    assert(ru.getAs[Double]("value_snips") == 2.0)
  }

  test("replayPolicyValueDr: perfect reward model makes DR == DM == " +
      "truth; unvisited policy arm defaults Q-hat to 0 and the " +
      "matched correction still contributes") {
    import graft.ops.Experiment
    // one context; arms x (r always 2, p=0.5), y (r always 6, p=0.5)
    // Q-hat is EXACT (constant rewards) -> correction terms vanish:
    // always_x: DM = 2, DR = 2 exactly
    val logs = Seq(("c0", "x", 2.0, 500000L), ("c0", "x", 2.0, 500000L),
      ("c0", "y", 6.0, 500000L), ("c0", "y", 6.0, 500000L))
      .toDF("ctx", "arm", "r", "lp")
    val got = Experiment.replayPolicyValueDr(logs, col("ctx"),
        col("arm"), col("r"), col("lp"),
        Seq("always_x" -> lit("x"), "always_q" -> lit("q")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getDouble(4)))).toMap
    assert(got("always_x") == ((4L, 2L, 2.0, 2.0)), got.toString)
    // unvisited arm q: DM = 0 (Q-hat default), no matches -> DR = 0
    assert(got("always_q") == ((4L, 0L, 0.0, 0.0)), got.toString)
    graft.Caches.release()

    // noisy rewards: x logged r=1 and r=3 (mean 2); policy always_x
    // DM = 2; DR per row = 2 + mt/0.5*(r - 2): rows (x,1): 2-2=0 ->
    // corr -2 -> term 0; (x,3): term 4; (y,6): term 2 ->
    // DR = (0+4+2)/3 = 2
    val noisy = Seq(("c0", "x", 1.0, 500000L),
      ("c0", "x", 3.0, 500000L), ("c0", "y", 6.0, 500000L))
      .toDF("ctx", "arm", "r", "lp")
    val r2 = Experiment.replayPolicyValueDr(noisy, col("ctx"),
      col("arm"), col("r"), col("lp"),
      Seq("ax" -> lit("x"))).collect()(0)
    assert(r2.getAs[Double]("value_dm") == 2.0)
    assert(r2.getAs[Double]("value_dr") == 2.0)
    graft.Caches.release()
  }

  test("rmst: exact step-function area under the KM curve, horizon " +
      "clipping, extinction") {
    import graft.ops.Experiment
    // durations 10 (event) + 20 (censored): S = 1 to day 10, 0.5 after
    val df = Seq((10L, 1L), (20L, 0L)).toDF("dur", "ev")
    val r30 = Experiment.rmst(df, col("dur"), col("ev"), tau = 30L)
      .collect()(0)
    assert(r30.getAs[Long]("tau") == 30 && r30.getAs[Long]("n_times") == 2)
    assert(r30.getAs[Double]("rmst") == 20.0) // 10 + 5 + 5
    val r15 = Experiment.rmst(df, col("dur"), col("ev"), tau = 15L)
      .collect()(0)
    assert(r15.getAs[Double]("rmst") == 12.5) // 10 + 0.5*5
    // both fail at 10: survival 0 afterwards
    val ext = Seq((10L, 1L), (10L, 1L)).toDF("dur", "ev")
    val re = Experiment.rmst(ext, col("dur"), col("ev"), tau = 20L)
      .collect()(0)
    assert(re.getAs[Double]("rmst") == 10.0)
  }

  test("aipwAte: a perfectly-specified outcome model zeroes the " +
      "correction (DR equals the outcome-model ATE); trim counted") {
    import graft.ops.Experiment
    // arm 1: y = 1 + 2x exactly; arm 0: y = 0.5 + x exactly
    // -> per-row effect 0.5 + x; mean over x in {1,2,3} twice = 2.5
    val rows = Seq(
      (1L, 1.0, 3.0, 500000L), (1L, 2.0, 5.0, 400000L),
      (1L, 3.0, 7.0, 600000L),
      (0L, 1.0, 1.5, 500000L), (0L, 2.0, 2.5, 400000L),
      (0L, 3.0, 3.5, 600000L),
      (1L, 9.0, 19.0, 5000L)) // below the trim floor
      .toDF("t", "x", "y", "e")
    val r = Experiment.aipwAte(rows, col("t"), col("y"), col("x"),
      col("e")).collect()(0)
    graft.Caches.release()
    assert(r.getAs[Long]("n_used") == 6 && r.getAs[Long]("n_trimmed") == 1)
    assert(r.getAs[Double]("ate_outcome_model") == 2.5)
    assert(r.getAs[Double]("ate_dr") == 2.5)
  }

  test("wilsonCi: matches the closed form at 50/100, pins to [0,1] " +
      "at the extremes") {
    import graft.ops.Experiment
    val df = ((1 to 50).map(_ => ("m", 1L)) ++
      (1 to 50).map(_ => ("m", 0L)) ++
      (1 to 20).map(_ => ("z", 0L)) ++
      (1 to 20).map(_ => ("o", 1L))).toDF("seg", "s")
    val got = Experiment.wilsonCi(df, col("seg"), col("s"))
      .collect().map(r => r.getAs[String]("segment") ->
        ((r.getAs[Double]("rate"), r.getAs[Double]("ci_lo"),
          r.getAs[Double]("ci_hi")))).toMap
    val z = 1.959964; val z2 = z * z; val nd = 100.0; val p = 0.5
    val centre = p + z2 / (2.0 * nd)
    val half = z * math.sqrt(p * (1.0 - p) / nd + z2 / (4.0 * nd * nd))
    val den = 1.0 + z2 / nd
    assert(got("m")._1 == 0.5)
    assert(math.abs(got("m")._2 - (centre - half) / den) < 1e-6)
    assert(math.abs(got("m")._3 - (centre + half) / den) < 1e-6)
    assert(got("z")._2 == 0.0 && got("z")._1 == 0.0) // all failures
    assert(got("o")._3 == 1.0 && got("o")._1 == 1.0) // all successes
    assert(got("o")._2 < 1.0 && got("z")._3 > 0.0)   // intervals open
  }

  test("ipwAte: hand-weighted Hájek means, positivity trim counted, " +
      "constant outcome gives a zero effect") {
    import graft.ops.Experiment
    // treated: w=4 on y=1, w=2 on y=0 -> 2/3; control: w=2 on y=1,
    // w=4 on y=0 -> 1/3; plus one row below the trim floor
    val df = Seq(
      (1L, 1.0, 250000L), (1L, 0.0, 500000L),
      (0L, 1.0, 500000L), (0L, 0.0, 750000L),
      (1L, 1.0, 10000L)).toDF("t", "y", "e")
    val r = Experiment.ipwAte(df, col("t"), col("y"), col("e"))
      .collect()(0)
    graft.Caches.release()
    assert(r.getAs[Long]("n_used") == 4 && r.getAs[Long]("n_trimmed") == 1)
    assert(r.getAs[Double]("mean_treated") == 0.666667)
    assert(r.getAs[Double]("mean_control") == 0.333333)
    assert(r.getAs[Double]("ate_ipw") == 0.333333)
    val const = Seq((1L, 5.0, 300000L), (0L, 5.0, 700000L))
      .toDF("t", "y", "e")
    val rc = Experiment.ipwAte(const, col("t"), col("y"), col("e"))
      .collect()(0)
    graft.Caches.release()
    assert(rc.getAs[Double]("ate_ipw") == 0.0)
    intercept[IllegalArgumentException] {
      Experiment.ipwAte(df, col("t"), col("y"), col("e"),
        trimLoPpm = 900000L, trimHiPpm = 100000L)
    }
  }
}
