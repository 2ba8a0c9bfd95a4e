package graft

import graft.QH._
import org.apache.spark.sql.functions._

/** Round-10 session-3 additions: rank statistics (census-based, no
  * per-row global windows), survival regression, and the remaining
  * warehouse/corpus analytics. Oracle conventions per
  * [[graft.Queries]].
  */
object QueriesStats {

  /** The portable A&S normal CDF tail as DuckDB SQL: two-sided p
    * from a column expression `z` (mirrors
    * [[graft.ops.Experiment.phiAbs]] op-for-op; `t` must be bound as
    * 1/(1+0.2316419*abs(z)) in an enclosing CTE).
    */
  private def sqlTwoSidedP: String =
    """2.0 * (1.0 - (1.0 - exp(-(abs(z) * abs(z)) / 2.0)
       / 2.5066282746310002 *
       (t * (0.319381530 + t * (-0.356563782 +
         t * (1.781477937 + t * (-1.821255978 +
           t * 1.330274429)))))))"""

  /** ROC AUC / Mann-Whitney U ([[graft.ops.RankStats.auc]]): does
    * order value predict fulfilled status — the model-diagnostic
    * primitive (q38 assess gives the thresholded read; AUC is the
    * threshold-free one). Score quantized to a $100 grid so the
    * census, not the data, bounds the prefix window; exact-integer
    * 2U with the standard tie correction.
    */
  private val q305_auc: Q = (
    (s, dir) => graft.ops.RankStats.auc(
      read(s, dir, "orders"),
      score = round(col("o_totalprice"), -2),
      label = (col("o_orderstatus") === "F")),
    Some(s"""WITH r AS (SELECT
                 CAST(round(o_totalprice, -2) AS BIGINT) AS s,
                 CAST(o_orderstatus = 'F' AS BIGINT) AS l
               FROM orders),
             census AS (SELECT s, CAST(sum(l) AS BIGINT) AS p,
                 CAST(count(*) - sum(l) AS BIGINT) AS q
               FROM r GROUP BY 1),
             pref AS (SELECT *, CAST(COALESCE(sum(q) OVER
                 (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
                  AND 1 PRECEDING), 0) AS BIGINT) AS qb
               FROM census),
             sums AS (SELECT CAST(sum(p) AS BIGINT) AS pp,
                 CAST(sum(q) AS BIGINT) AS qq,
                 CAST(sum(CAST(p * (2 * qb + q) AS DECIMAL(38,0)))
                   AS DOUBLE) AS u2,
                 CAST(sum(CAST((p + q) * (p + q) * (p + q) - (p + q)
                   AS DECIMAL(38,0))) AS DOUBLE) AS ties
               FROM pref),
             d AS (SELECT pp, qq, u2, ties,
                 CAST(pp AS DOUBLE) AS pd, CAST(qq AS DOUBLE) AS qd,
                 CAST(pp AS DOUBLE) + CAST(qq AS DOUBLE) AS nd
               FROM sums),
             zc AS (SELECT pp, qq, u2, pd, qd,
                 (u2 / 2.0 - pd * qd / 2.0) /
                   sqrt((pd * qd / 12.0) *
                     ((nd + 1.0) - ties / (nd * (nd - 1.0)))) AS z
               FROM d),
             ph AS (SELECT *,
                 1.0 / (1.0 + 0.2316419 * abs(z)) AS t FROM zc)
        SELECT pp AS n_pos, qq AS n_neg,
               round(u2 / 2.0, 1) AS u_stat,
               round(u2 / (2.0 * pd * qd), 6) AS auc,
               round(z, 6) AS z,
               round($sqlTwoSidedP, 6) AS p_value
        FROM ph"""))

  /** SPEARMAN rank correlation ([[graft.ops.RankStats.spearman]]):
    * quantity vs price grid over lineitem — the monotone-association
    * read Pearson (q13/q205) cannot give. Doubled average ranks from
    * broadcast distinct-value dictionaries keep every moment an
    * exact integer.
    */
  private val q306_spearman: Q = (
    (s, dir) => graft.ops.RankStats.spearman(
      read(s, dir, "lineitem"),
      x = col("l_quantity"),
      y = round(col("l_extendedprice"), -2)),
    Some("""WITH r AS (SELECT CAST(l_quantity AS BIGINT) AS x,
                 CAST(round(l_extendedprice, -2) AS BIGINT) AS y
               FROM lineitem),
             dx AS (SELECT x, count(*) AS n FROM r GROUP BY 1),
             dxr AS (SELECT x, 2 * CAST(COALESCE(sum(n) OVER
                 (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                  AND 1 PRECEDING), 0) AS BIGINT) + n + 1 AS rx
               FROM dx),
             dy AS (SELECT y, count(*) AS n FROM r GROUP BY 1),
             dyr AS (SELECT y, 2 * CAST(COALESCE(sum(n) OVER
                 (ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING
                  AND 1 PRECEDING), 0) AS BIGINT) + n + 1 AS ry
               FROM dy),
             ranked AS (SELECT rx, ry
               FROM r JOIN dxr USING (x) JOIN dyr USING (y)),
             sums AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(rx AS DECIMAL(38,0))) AS DOUBLE) AS sx,
                 CAST(sum(CAST(ry AS DECIMAL(38,0))) AS DOUBLE) AS sy,
                 CAST(sum(CAST(rx * rx AS DECIMAL(38,0))) AS DOUBLE)
                   AS sxx,
                 CAST(sum(CAST(ry * ry AS DECIMAL(38,0))) AS DOUBLE)
                   AS syy,
                 CAST(sum(CAST(rx * ry AS DECIMAL(38,0))) AS DOUBLE)
                   AS sxy
               FROM ranked)
        SELECT n, round((CAST(n AS DOUBLE) * sxy - sx * sy) /
               sqrt((CAST(n AS DOUBLE) * sxx - sx * sx) *
                    (CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS rho
        FROM sums"""))

  /** KRUSKAL-WALLIS across order priorities
    * ([[graft.ops.RankStats.kruskalWallis]]): do the five priority
    * classes draw from the same price distribution — the rank-based
    * one-way test (robust where the ANOVA normality premise fails).
    * Per-group rank sums exact; H + tie correction in fixed double
    * order.
    */
  private val q307_kruskal: Q = (
    (s, dir) => graft.ops.RankStats.kruskalWallis(
      read(s, dir, "orders"),
      group = col("o_orderpriority"),
      value = round(col("o_totalprice"), -2)),
    Some("""WITH r AS (SELECT o_orderpriority AS grp,
                 CAST(round(o_totalprice, -2) AS BIGINT) AS v
               FROM orders),
             dict0 AS (SELECT v, count(*) AS n FROM r GROUP BY 1),
             dict AS (SELECT v, n, 2 * CAST(COALESCE(sum(n) OVER
                 (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                  AND 1 PRECEDING), 0) AS BIGINT) + n + 1 AS r2
               FROM dict0),
             cells AS (SELECT grp, v, count(*) AS c
               FROM r GROUP BY 1, 2),
             pg AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n,
                 CAST(sum(CAST(c * r2 AS DECIMAL(38,0))) AS DOUBLE)
                   AS r2sum
               FROM cells JOIN dict USING (v) GROUP BY 1),
             ties AS (SELECT
                 CAST(sum(CAST(n * n * n - n AS DECIMAL(38,0)))
                   AS DOUBLE) AS tt,
                 CAST(sum(n) AS BIGINT) AS nn
               FROM dict),
             hh AS (SELECT
                 CAST(sum(CAST(r2sum * r2sum /
                   (4.0 * CAST(n AS DOUBLE)) AS DECIMAL(38,6)))
                   AS DOUBLE) AS hsum,
                 CAST(count(*) AS BIGINT) AS k
               FROM pg),
             verdict AS (SELECT
                 round(12.0 / (CAST(nn AS DOUBLE) *
                     (CAST(nn AS DOUBLE) + 1.0)) * hsum -
                   3.0 * (CAST(nn AS DOUBLE) + 1.0), 6) AS h,
                 round((12.0 / (CAST(nn AS DOUBLE) *
                     (CAST(nn AS DOUBLE) + 1.0)) * hsum -
                   3.0 * (CAST(nn AS DOUBLE) + 1.0)) /
                   (1.0 - tt / (CAST(nn AS DOUBLE) *
                     CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) -
                     CAST(nn AS DOUBLE))), 6) AS h_adj,
                 k - 1 AS df
               FROM hh CROSS JOIN ties)
        SELECT grp, n, round(r2sum / 2.0, 1) AS rank_sum,
               round(r2sum / (2.0 * CAST(n AS DOUBLE)), 6)
                 AS mean_rank,
               h, h_adj, df
        FROM pg CROSS JOIN verdict ORDER BY grp"""))

  /** WELCH t-test ([[graft.ops.RankStats.welchT]]): returned vs
    * accepted lineitem prices, unequal variances — the parametric
    * companion to q307's rank test. One aggregate pass of exact
    * decimal sums; t, Welch–Satterthwaite df and the normal-
    * approximation p in fixed double order.
    */
  private val q308_welch: Q = (
    (s, dir) => graft.ops.RankStats.welchT(
      read(s, dir, "lineitem"),
      inA = col("l_returnflag") === "R",
      inB = col("l_returnflag") === "A",
      value = col("l_extendedprice")),
    Some("""WITH sums AS (SELECT
                 CAST(sum(CAST(CASE WHEN l_returnflag = 'R'
                     THEN l_extendedprice END AS DECIMAL(25,6)))
                   AS DOUBLE) AS sa,
                 CAST(sum(CAST(CASE WHEN l_returnflag = 'R'
                     THEN l_extendedprice * l_extendedprice END
                   AS DECIMAL(38,10))) AS DOUBLE) AS ssa,
                 CAST(sum(CASE WHEN l_returnflag = 'R'
                     AND l_extendedprice IS NOT NULL THEN 1
                   ELSE 0 END) AS BIGINT) AS na,
                 CAST(sum(CAST(CASE WHEN l_returnflag = 'A'
                     THEN l_extendedprice END AS DECIMAL(25,6)))
                   AS DOUBLE) AS sb,
                 CAST(sum(CAST(CASE WHEN l_returnflag = 'A'
                     THEN l_extendedprice * l_extendedprice END
                   AS DECIMAL(38,10))) AS DOUBLE) AS ssb,
                 CAST(sum(CASE WHEN l_returnflag = 'A'
                     AND l_extendedprice IS NOT NULL THEN 1
                   ELSE 0 END) AS BIGINT) AS nb
               FROM lineitem),
             st AS (SELECT na, nb,
                 sa / CAST(na AS DOUBLE) AS ma,
                 sb / CAST(nb AS DOUBLE) AS mb,
                 ((ssa - sa * sa / CAST(na AS DOUBLE)) /
                   (CAST(na AS DOUBLE) - 1.0)) / CAST(na AS DOUBLE)
                   AS va,
                 ((ssb - sb * sb / CAST(nb AS DOUBLE)) /
                   (CAST(nb AS DOUBLE) - 1.0)) / CAST(nb AS DOUBLE)
                   AS vb
               FROM sums),
             zc AS (SELECT na, nb, ma, mb, va, vb,
                 (ma - mb) / sqrt(va + vb) AS z
               FROM st),
             ph AS (SELECT *,
                 1.0 / (1.0 + 0.2316419 * abs(z)) AS t FROM zc)
        SELECT na AS n_a, nb AS n_b, round(ma, 6) AS mean_a,
               round(mb, 6) AS mean_b, round(z, 6) AS t_stat,
               round((va + vb) * (va + vb) /
                 (va * va / (CAST(na AS DOUBLE) - 1.0) +
                  vb * vb / (CAST(nb AS DOUBLE) - 1.0)), 2)
                 AS df_welch,
               round(""" + sqlTwoSidedP + """, 6) AS p_value
        FROM ph"""))

  /** Shared subject table for the Cox entries: per-customer tenure
    * (days from first to last order), churn event = inactive > 360
    * days at corpus end — the q245/q292 cohort, here with covariates.
    */
  private def coxSubjects(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val per = read(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(min(col("o_orderdate")).as("first_d"),
        max(col("o_orderdate")).as("last_d"))
    val mx = per.agg(max(col("last_d")).as("maxd"))
    per.join(read(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .crossJoin(broadcast(mx))
      .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"),
        expr("datediff(last_d, first_d)").cast("long").as("duration"),
        (expr("datediff(maxd, last_d)") > 360).cast("long").as("event"))
  }

  /** COX PROPORTIONAL HAZARDS ([[graft.ops.Cox.fit]]): churn hazard
    * vs account balance and segment — the survival REGRESSION next
    * to q292's descriptive curves. Newton on the Breslow partial
    * likelihood, each iteration one census+suffix pass; rows-only by
    * nature (solver), pinned by the in-plan gates (converged,
    * ll > ll0) and by q310's integer-exact risk-set twin + CoxSpec's
    * independent R-style reference case.
    */
  private val q309_cox_fit: Q = (
    (s, dir) => graft.ops.Cox.fit(coxSubjects(s, dir),
      duration = col("duration"), event = col("event"),
      features = Seq(
        "acctbal_k" -> col("c_acctbal") / 1000.0,
        "building" -> (col("c_mktsegment") === "BUILDING")
          .cast("double"))),
    None)

  /** COX RISK-SET CENSUS, integer lattice ([[graft.ops.Cox
    * .riskSets]]): the oracle-checkable core of q309 — per event
    * time, death count and suffix risk-set sums S0/S1 at integer
    * weights, replayed exactly by DuckDB's descending window.
    */
  private val q310_cox_risk: Q = (
    (s, dir) => graft.ops.Cox.riskSets(coxSubjects(s, dir),
      duration = col("duration"), event = col("event"),
      weight = lit(1L) + col("c_custkey") % 5,
      x = col("c_custkey") % 3),
    Some("""WITH per AS (SELECT o_custkey,
                 min(o_orderdate) AS fd, max(o_orderdate) AS ld
               FROM orders GROUP BY 1),
             mx AS (SELECT max(ld) AS maxd FROM per),
             subj AS (SELECT c_custkey,
                 date_diff('day', CAST(fd AS DATE), CAST(ld AS DATE))
                   AS t,
                 CAST(date_diff('day', CAST(ld AS DATE),
                   CAST(maxd AS DATE)) > 360 AS BIGINT) AS e,
                 1 + c_custkey % 5 AS w,
                 (1 + c_custkey % 5) * (c_custkey % 3) AS wx
               FROM per JOIN customer ON o_custkey = c_custkey
               CROSS JOIN mx),
             census AS (SELECT t, CAST(sum(e) AS BIGINT) AS d,
                 CAST(sum(w) AS BIGINT) AS w0,
                 CAST(sum(wx) AS BIGINT) AS w1
               FROM subj GROUP BY 1),
             suff AS (SELECT t, d,
                 CAST(sum(w0) OVER (ORDER BY t DESC
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s0,
                 CAST(sum(w1) OVER (ORDER BY t DESC
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s1
               FROM census)
        SELECT t, d, s0, s1 FROM suff WHERE d > 0 ORDER BY t"""))

  /** RANKED-RETRIEVAL EVAL ([[graft.ops.Eval.rankingMetrics]]):
    * precision@10 / recall@10 / MRR / nDCG@10 per query over a
    * deterministic run (queries = market segments, candidates ranked
    * by rounded balance, graded gains from the custkey lattice) —
    * the report card for the engine's own retrieval stack
    * (q45/q167/q173/q211). Per-query windows only; 2^gain − 1
    * numerators exact integers, log2 denominators decimal-quantized
    * before the order-free sum.
    */
  private val q312_retrieval_eval: Q = (
    (s, dir) => graft.ops.Eval.rankingMetrics(
      read(s, dir, "customer"),
      query = col("c_mktsegment"), doc = col("c_custkey"),
      score = round(col("c_acctbal"), 0).cast("long"),
      gain = when(col("c_custkey") % 7 === 0, 2L)
        .when(col("c_custkey") % 3 === 0, 1L).otherwise(0L),
      k = 10),
    Some("""WITH cand AS (SELECT c_mktsegment AS query,
                 c_custkey AS d,
                 CAST(round(c_acctbal, 0) AS BIGINT) AS s,
                 CASE WHEN c_custkey % 7 = 0 THEN 2
                      WHEN c_custkey % 3 = 0 THEN 1 ELSE 0 END AS g
               FROM customer),
             r AS (SELECT *,
                 row_number() OVER (PARTITION BY query
                   ORDER BY s DESC, d ASC) AS rr,
                 row_number() OVER (PARTITION BY query
                   ORDER BY g DESC, d ASC) AS ri
               FROM cand),
             t AS (SELECT query,
                 count(*) AS n_candidates,
                 CAST(sum(CASE WHEN g > 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_relevant,
                 CAST(sum(CASE WHEN rr <= 10 AND g > 0 THEN 1 ELSE 0
                   END) AS BIGINT) AS hits,
                 min(CASE WHEN rr <= 10 AND g > 0 THEN rr END) AS fr,
                 CAST(sum(CAST(CASE WHEN rr <= 10 AND g > 0 THEN
                     CAST((1 << g) - 1 AS DOUBLE)
                       / log2(CAST(rr AS DOUBLE) + 1.0)
                   ELSE 0.0 END AS DECIMAL(38,12))) AS DOUBLE) AS dcg,
                 CAST(sum(CAST(CASE WHEN ri <= 10 AND g > 0 THEN
                     CAST((1 << g) - 1 AS DOUBLE)
                       / log2(CAST(ri AS DOUBLE) + 1.0)
                   ELSE 0.0 END AS DECIMAL(38,12))) AS DOUBLE) AS idcg
               FROM r GROUP BY 1)
        SELECT query, n_candidates, n_relevant,
               round(CAST(hits AS DOUBLE) / 10.0, 6) AS precision_k,
               round(CASE WHEN n_relevant > 0 THEN CAST(hits AS DOUBLE)
                 / CAST(n_relevant AS DOUBLE) ELSE 0.0 END, 6)
                 AS recall_k,
               round(CASE WHEN fr IS NOT NULL THEN
                 1.0 / CAST(fr AS DOUBLE) ELSE 0.0 END, 6) AS mrr,
               round(CASE WHEN idcg > 0 THEN dcg / idcg ELSE 0.0 END, 6)
                 AS ndcg_k
        FROM t ORDER BY query"""))

  /** PROPER SCORING RULES ([[graft.ops.Eval.logLossBrier]]): log-loss
    * + Brier per segment for a grid pseudo-probability against the
    * balance label — the threshold-free companion to q38's
    * thresholded assess and q243's reliability bins. (segment, p, y)
    * census first; per-cell ln terms decimal-quantized.
    */
  private val q313_scoring_rules: Q = (
    (s, dir) => graft.ops.Eval.logLossBrier(
      read(s, dir, "customer"),
      segment = col("c_mktsegment"),
      p = (col("c_custkey") % 97).cast("double") / 97.0,
      y = (col("c_acctbal") > 5000.0).cast("long")),
    Some("""WITH cells AS (SELECT c_mktsegment AS segment,
                 CAST(c_custkey % 97 AS DOUBLE) / 97.0 AS p,
                 CAST(c_acctbal > 5000.0 AS BIGINT) AS y,
                 count(*) AS c
               FROM customer GROUP BY 1, 2, 3),
             cl AS (SELECT segment, y, c,
                 least(greatest(p, 0.000001), 0.999999) AS pc, p
               FROM cells),
             t AS (SELECT segment, CAST(sum(c) AS BIGINT) AS n,
                 CAST(sum(CAST(CAST(c AS DOUBLE) *
                   (-(CAST(y AS DOUBLE) * ln(pc) +
                      (1.0 - CAST(y AS DOUBLE)) * ln(1.0 - pc)))
                   AS DECIMAL(38,12))) AS DOUBLE) AS ll,
                 CAST(sum(CAST(CAST(c AS DOUBLE) *
                   ((p - CAST(y AS DOUBLE)) * (p - CAST(y AS DOUBLE)))
                   AS DECIMAL(38,12))) AS DOUBLE) AS br
               FROM cl GROUP BY 1)
        SELECT segment, n,
               round(ll / CAST(n AS DOUBLE), 6) AS log_loss,
               round(br / CAST(n AS DOUBLE), 6) AS brier
        FROM t ORDER BY segment"""))

  /** K-FOLD CROSS-VALIDATION in one pass
    * ([[graft.ops.Eval.kFoldOls]]): 5-fold OLS of price on quantity
    * over lineitem — train coefficients from complement moments,
    * held-out RMSE by closed form, fold membership on the portable
    * q70 hash. The honest generalization read next to q205's in-
    * sample fit.
    */
  private val q314_kfold_cv: Q = (
    (s, dir) => graft.ops.Eval.kFoldOls(
      read(s, dir, "lineitem"),
      id = col("l_orderkey") * 10 + col("l_linenumber"),
      x = col("l_quantity"), y = col("l_extendedprice"), k = 5),
    Some("""WITH rows AS (SELECT
                 ((((l_orderkey * 10 + l_linenumber) % 1000000007)
                   * 2654435761 + 42)
                   % 1000000007) % 5 AS fold,
                 CAST(l_quantity AS DOUBLE) AS x,
                 CAST(l_extendedprice AS DOUBLE) AS y
               FROM lineitem),
             pf AS (SELECT fold, count(*) AS n,
                 CAST(sum(CAST(x AS DECIMAL(38,10))) AS DOUBLE) AS sx,
                 CAST(sum(CAST(y AS DECIMAL(38,10))) AS DOUBLE) AS sy,
                 CAST(sum(CAST(x * x AS DECIMAL(38,10))) AS DOUBLE)
                   AS sxx,
                 CAST(sum(CAST(x * y AS DECIMAL(38,10))) AS DOUBLE)
                   AS sxy,
                 CAST(sum(CAST(y * y AS DECIMAL(38,10))) AS DOUBLE)
                   AS syy
               FROM rows GROUP BY 1),
             tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
                 CAST(sum(CAST(sx AS DECIMAL(38,12))) AS DOUBLE) AS tsx,
                 CAST(sum(CAST(sy AS DECIMAL(38,12))) AS DOUBLE) AS tsy,
                 CAST(sum(CAST(sxx AS DECIMAL(38,12))) AS DOUBLE)
                   AS tsxx,
                 CAST(sum(CAST(sxy AS DECIMAL(38,12))) AS DOUBLE)
                   AS tsxy,
                 CAST(sum(CAST(syy AS DECIMAL(38,12))) AS DOUBLE)
                   AS tsyy
               FROM pf),
             ab AS (SELECT fold, n, tn - n AS n_train,
                 CAST(tn - n AS DOUBLE) AS ntd,
                 tsx - sx AS sxt, tsy - sy AS syt, tsxx - sxx AS sxxt,
                 tsxy - sxy AS sxyt,
                 sx, sy, sxx, sxy, syy
               FROM pf CROSS JOIN tot),
             co AS (SELECT *,
                 (ntd * sxyt - sxt * syt) / (ntd * sxxt - sxt * sxt)
                   AS b
               FROM ab),
             co2 AS (SELECT *, (syt - b * sxt) / ntd AS a FROM co),
             ev AS (SELECT fold, n_train, n AS n_test, b, a,
                 syy - 2.0 * a * sy - 2.0 * b * sxy +
                   CAST(n AS DOUBLE) * a * a + 2.0 * a * b * sx +
                   b * b * sxx AS sse
               FROM co2)
        SELECT fold, n_train, n_test,
               round(b, 6) AS slope, round(a, 6) AS intercept,
               round(sqrt(greatest(sse, 0.0) / CAST(n_test AS DOUBLE)),
                 6) AS rmse
        FROM ev ORDER BY fold"""))

  /** MUTUAL-INFORMATION feature screen
    * ([[graft.ops.Eval.mutualInformation]]): three candidate
    * features (price bucket, a custkey-noise control, order month)
    * against the order-status label, one melted pass — the model-
    * free ranking that should (and does) place the noise feature
    * last. Exact-count census cells, decimal-quantized ln terms.
    */
  private val q315_mutual_info: Q = (
    (s, dir) => graft.ops.Eval.mutualInformation(
      read(s, dir, "orders"),
      features = Seq(
        "m1_price_bucket" -> floor(col("o_totalprice") / 50000.0)
          .cast("long"),
        "m2_custkey_noise" -> (col("o_custkey") % 10).cast("long"),
        "m3_order_month" -> month(col("o_orderdate")).cast("long")),
      label = (col("o_orderstatus") === "F").cast("long")),
    Some("""WITH m AS (
               SELECT 'm1_price_bucket' AS f,
                 CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS v,
                 CAST(o_orderstatus = 'F' AS BIGINT) AS y FROM orders
               UNION ALL
               SELECT 'm2_custkey_noise', o_custkey % 10,
                 CAST(o_orderstatus = 'F' AS BIGINT) FROM orders
               UNION ALL
               SELECT 'm3_order_month',
                 CAST(month(CAST(o_orderdate AS DATE)) AS BIGINT),
                 CAST(o_orderstatus = 'F' AS BIGINT) FROM orders),
             cells AS (SELECT f, v, y, count(*) AS c
               FROM m GROUP BY 1, 2, 3),
             mv AS (SELECT f, v, CAST(sum(c) AS BIGINT) AS cv
               FROM cells GROUP BY 1, 2),
             my AS (SELECT f, y, CAST(sum(c) AS BIGINT) AS cy
               FROM cells GROUP BY 1, 2),
             tf AS (SELECT f, CAST(sum(c) AS BIGINT) AS n
               FROM cells GROUP BY 1),
             j AS (SELECT cells.f, cells.v, cells.y, cells.c,
                 mv.cv, my.cy, tf.n
               FROM cells JOIN mv ON cells.f = mv.f AND cells.v = mv.v
               JOIN my ON cells.f = my.f AND cells.y = my.y
               JOIN tf ON cells.f = tf.f),
             mi AS (SELECT f,
                 CAST(sum(CAST(
                   (CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) *
                   ln((CAST(c AS DOUBLE) * CAST(n AS DOUBLE)) /
                     (CAST(cv AS DOUBLE) * CAST(cy AS DOUBLE)))
                   AS DECIMAL(38,12))) AS DOUBLE) AS mi,
                 count(DISTINCT v) AS n_levels
               FROM j GROUP BY 1),
             hy AS (SELECT my.f,
                 CAST(sum(CAST(
                   -(CAST(cy AS DOUBLE) / CAST(n AS DOUBLE)) *
                   ln(CAST(cy AS DOUBLE) / CAST(n AS DOUBLE))
                   AS DECIMAL(38,12))) AS DOUBLE) AS h
               FROM my JOIN tf ON my.f = tf.f GROUP BY 1)
        SELECT mi.f AS feature, n_levels,
               round(mi.mi, 6) AS mi_nats, round(hy.h, 6) AS h_y
        FROM mi JOIN hy ON mi.f = hy.f ORDER BY feature"""))

  /** POWER ANALYSIS ([[graft.ops.Experiment.powerSampleSize]]):
    * per-segment n-per-arm to detect a 2-point lift on the segment's
    * own high-balance rate at α=0.05 / power 0.8 — the planning
    * entry the q235/q299/q300 testing stack starts from. Normal
    * quantiles via the portable A&S 26.2.23 inverse.
    */
  private val q316_power: Q = (
    (s, dir) => graft.ops.Experiment.powerSampleSize(
      read(s, dir, "customer"),
      segment = col("c_mktsegment"),
      success = (col("c_acctbal") > 5000.0).cast("long"),
      mde = 0.02),
    Some("""WITH cells AS (SELECT c_mktsegment AS segment,
                 count(*) AS n_obs,
                 CAST(sum(CAST(c_acctbal > 5000.0 AS BIGINT))
                   AS BIGINT) AS x
               FROM customer GROUP BY 1),
             za0 AS (SELECT sqrt(-2.0 * ln(0.025)) AS t),
             zaq AS (SELECT t - (2.515517 + t * (0.802853 +
                 t * 0.010328)) / (1.0 + t * (1.432788 +
                 t * (0.189269 + t * 0.001308))) AS za FROM za0),
             zb0 AS (SELECT sqrt(-2.0 * ln(CAST(1.0 AS DOUBLE) -
                 CAST(0.8 AS DOUBLE))) AS t),
             zbq AS (SELECT t - (2.515517 + t * (0.802853 +
                 t * 0.010328)) / (1.0 + t * (1.432788 +
                 t * (0.189269 + t * 0.001308))) AS zb FROM zb0),
             pr AS (SELECT segment, n_obs,
                 CAST(x AS DOUBLE) / CAST(n_obs AS DOUBLE) AS p1
               FROM cells),
             p2c AS (SELECT *, least(p1 + 0.02, 0.999999) AS p2
               FROM pr),
             pb AS (SELECT *, (p1 + p2) / 2.0 AS pbar FROM p2c),
             sc AS (SELECT segment, n_obs, p1, p2, pbar, za, zb,
                 za * sqrt(2.0 * pbar * (1.0 - pbar)) +
                 zb * sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2)) AS s
               FROM pb CROSS JOIN zaq CROSS JOIN zbq),
             narm AS (SELECT *, s * s / ((p2 - p1) * (p2 - p1)) AS na
               FROM sc)
        SELECT segment, n_obs, round(p1, 6) AS baseline_rate,
               round(za, 6) AS z_alpha, round(zb, 6) AS z_beta,
               CAST(ceil(na) AS BIGINT) AS n_per_arm,
               CAST(ceil(2.0 * na / CAST(n_obs AS DOUBLE)) AS BIGINT)
                 AS weeks_needed
        FROM narm ORDER BY segment"""))

  /** SAMPLE-RATIO-MISMATCH check ([[graft.ops.Experiment.srmCheck]]):
    * distinct exposed users per event-type "experiment", parity-hash
    * arms vs 50/50 — the assignment audit that gates every treatment
    * readout. χ²₁ from exact counts, p via the portable CDF.
    */
  private val q317_srm: Q = (
    (s, dir) => graft.ops.Experiment.srmCheck(
      read(s, dir, "events")
        .select(col("event_type"), col("user_id")).distinct(),
      experiment = col("event_type"),
      inA = (col("user_id") % 2 === 0).cast("long")),
    Some(s"""WITH u AS (SELECT DISTINCT event_type AS experiment,
                 user_id
               FROM events),
             cells AS (SELECT experiment,
                 CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_a,
                 CAST(sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END)
                   AS BIGINT) AS n_b
               FROM u GROUP BY 1),
             ch AS (SELECT *,
                 (CAST(n_a AS DOUBLE) -
                   CAST(n_a + n_b AS DOUBLE) * 0.5) *
                 (CAST(n_a AS DOUBLE) -
                   CAST(n_a + n_b AS DOUBLE) * 0.5) /
                   (CAST(n_a + n_b AS DOUBLE) * 0.5) +
                 (CAST(n_b AS DOUBLE) -
                   CAST(n_a + n_b AS DOUBLE) * 0.5) *
                 (CAST(n_b AS DOUBLE) -
                   CAST(n_a + n_b AS DOUBLE) * 0.5) /
                   (CAST(n_a + n_b AS DOUBLE) * 0.5) AS chi2
               FROM cells),
             zc AS (SELECT *, sqrt(chi2) AS z FROM ch),
             ph AS (SELECT *,
                 1.0 / (1.0 + 0.2316419 * abs(z)) AS t FROM zc)
        SELECT experiment, n_a, n_b, round(chi2, 6) AS chi2,
               round($sqlTwoSidedP, 6) AS p_value,
               CAST($sqlTwoSidedP < 0.001 AS INTEGER) AS srm_flag
        FROM ph ORDER BY experiment"""))

  /** T-CLOSENESS audit ([[graft.ops.DataQuality.tCloseness]]): the
    * third privacy rung after q239 k-anonymity and q255 l-diversity
    * — per (segment, nation) group, ordered-EMD distance between the
    * group's balance-band distribution and the corpus-wide one.
    * Exact-integer prefix numerators over census-bounded lattices.
    */
  private val q318_t_closeness: Q = (
    (s, dir) => graft.ops.DataQuality.tCloseness(
        read(s, dir, "customer"),
        quasiCols = Seq("c_mktsegment", "c_nationkey"),
        sensitive = floor(col("c_acctbal") / 2000.0).cast("long"),
        tPpm = 150000L)
      .orderBy(col("c_mktsegment"), col("c_nationkey")),
    Some("""WITH rows AS (SELECT c_mktsegment, c_nationkey,
                 CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS v
               FROM customer),
             cells AS (SELECT c_mktsegment, c_nationkey, v,
                 count(*) AS c
               FROM rows GROUP BY 1, 2, 3),
             vals AS (SELECT v, CAST(sum(c) AS BIGINT) AS cv
               FROM cells GROUP BY 1),
             grps AS (SELECT c_mktsegment, c_nationkey,
                 CAST(sum(c) AS BIGINT) AS n
               FROM cells GROUP BY 1, 2),
             tot AS (SELECT CAST(sum(cv) AS BIGINT) AS nn FROM vals),
             lat AS (SELECT g.c_mktsegment, g.c_nationkey, g.n,
                 vv.v, vv.cv, COALESCE(cells.c, 0) AS c
               FROM grps g CROSS JOIN vals vv
               LEFT JOIN cells ON cells.c_mktsegment = g.c_mktsegment
                 AND cells.c_nationkey = g.c_nationkey
                 AND cells.v = vv.v),
             pref AS (SELECT lat.*, tot.nn,
                 sum(c) OVER (PARTITION BY c_mktsegment, c_nationkey
                   ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumg,
                 sum(cv) OVER (PARTITION BY c_mktsegment, c_nationkey
                   ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumgl
               FROM lat CROSS JOIN tot),
             num AS (SELECT c_mktsegment, c_nationkey, n, nn,
                 abs(CAST(cumg AS DECIMAL(38,0)) * nn -
                     CAST(cumgl AS DECIMAL(38,0)) * n) AS d
               FROM pref),
             agg AS (SELECT c_mktsegment, c_nationkey, n,
                 CAST(sum(d) AS DOUBLE) AS s,
                 CAST(max(nn) AS DOUBLE) AS nn,
                 CAST(count(*) AS DOUBLE) AS m
               FROM num GROUP BY 1, 2, 3)
        SELECT c_mktsegment, c_nationkey, n,
               round(s / ((m - 1.0) * CAST(n AS DOUBLE) * nn), 6)
                 AS emd,
               CAST(round(s / ((m - 1.0) * CAST(n AS DOUBLE) * nn), 6)
                 > 0.15 AS INTEGER) AS at_risk
        FROM agg ORDER BY c_mktsegment, c_nationkey"""))

  /** FORECAST BACKTEST ([[graft.ops.Eval.backtestSeasonalNaive]]):
    * seasonal-naive (ŷ_t = y_{t−7}) over per-priority daily order
    * revenue, rolling-origin — MAE/RMSE plus MASE against the
    * one-step naive on the same evaluation points. Calendar-correct
    * self-joins (gaps yield no forecast), exact-decimal daily sums,
    * decimal-quantized error terms.
    */
  private val q320_backtest: Q = (
    (s, dir) => graft.ops.Eval.backtestSeasonalNaive(
      read(s, dir, "orders")
        .groupBy(col("o_orderpriority"), col("o_orderdate"))
        .agg(dsum(col("o_totalprice")).as("rev")),
      key = col("o_orderpriority"), date = col("o_orderdate"),
      value = col("rev"), season = 7),
    Some(s"""WITH s AS (SELECT o_orderpriority AS key,
                 CAST(o_orderdate AS DATE) AS d,
                 ${sqlDsum("o_totalprice")} AS y
               FROM orders GROUP BY 1, 2),
             j AS (SELECT a.key, a.y, f.y AS f, n.y AS n1
               FROM s a JOIN s f ON f.key = a.key AND f.d = a.d - 7
                        JOIN s n ON n.key = a.key AND n.d = a.d - 1),
             t AS (SELECT key, count(*) AS n_eval,
                 CAST(sum(CAST(abs(y - f) AS DECIMAL(38,12)))
                   AS DOUBLE) AS sae,
                 CAST(sum(CAST((y - f) * (y - f) AS DECIMAL(38,12)))
                   AS DOUBLE) AS sse,
                 CAST(sum(CAST(abs(y - n1) AS DECIMAL(38,12)))
                   AS DOUBLE) AS snae
               FROM j GROUP BY 1)
        SELECT key, n_eval, round(sae / n_eval, 6) AS mae,
               round(sqrt(sse / n_eval), 4) AS rmse,
               round(CASE WHEN snae > 0 THEN sae / snae END, 6) AS mase
        FROM t ORDER BY key"""))

  /** MULTI-CLASS CONFUSION ([[graft.ops.Eval.confusionStats]]):
    * per-class precision/recall/F1 for a planted noisy segment
    * predictor (every fifth customer misrouted to BUILDING) — the
    * multi-class generalization of q38's binary assess. Census-
    * bounded contingency; classes missing from either side keep
    * their row.
    */
  private val q321_confusion: Q = (
    (s, dir) => graft.ops.Eval.confusionStats(
      read(s, dir, "customer"),
      actual = col("c_mktsegment"),
      predicted = when(col("c_custkey") % 5 === 0, "BUILDING")
        .otherwise(col("c_mktsegment"))),
    Some("""WITH m AS (SELECT c_mktsegment AS a,
                 CASE WHEN c_custkey % 5 = 0 THEN 'BUILDING'
                      ELSE c_mktsegment END AS p
               FROM customer),
             cells AS (SELECT a, p, count(*) AS c FROM m GROUP BY 1, 2),
             act AS (SELECT a AS cls, CAST(sum(c) AS BIGINT) AS na
               FROM cells GROUP BY 1),
             prd AS (SELECT p AS cls, CAST(sum(c) AS BIGINT) AS np
               FROM cells GROUP BY 1),
             tps AS (SELECT a AS cls, CAST(c AS BIGINT) AS tp
               FROM cells WHERE a = p),
             j AS (SELECT COALESCE(act.cls, prd.cls) AS cls,
                 COALESCE(na, 0) AS n_actual,
                 COALESCE(np, 0) AS n_predicted,
                 COALESCE(tp, 0) AS tp
               FROM act FULL JOIN prd ON act.cls = prd.cls
               LEFT JOIN tps ON COALESCE(act.cls, prd.cls) = tps.cls),
             pr AS (SELECT *,
                 CASE WHEN n_predicted > 0 THEN
                   CAST(tp AS DOUBLE) / n_predicted ELSE 0.0 END AS pc,
                 CASE WHEN n_actual > 0 THEN
                   CAST(tp AS DOUBLE) / n_actual ELSE 0.0 END AS rc
               FROM j)
        SELECT cls, n_actual, n_predicted, tp,
               round(pc, 6) AS "precision", round(rc, 6) AS recall,
               round(CASE WHEN pc + rc > 0 THEN
                 2.0 * pc * rc / (pc + rc) ELSE 0.0 END, 6) AS f1
        FROM pr ORDER BY cls"""))

  /** MANN-KENDALL trend test ([[graft.ops.RankStats.mannKendall]]):
    * is monthly revenue per order priority trending — the
    * distribution-free significance companion to q260's Theil-Sen
    * slope. Integer sign sums and tie polynomial over the bounded
    * monthly grain (guarded pairwise self-join, the theilSen
    * contract); continuity-corrected z through the portable CDF.
    */
  private val q327_mann_kendall: Q = (
    (s, dir) => graft.ops.RankStats.mannKendall(
      read(s, dir, "orders")
        .groupBy(col("o_orderpriority"),
          date_trunc("month", col("o_orderdate")).as("__mo"))
        .agg(dsum(col("o_totalprice")).as("rev"))
        .select(col("o_orderpriority"),
          (year(col("__mo")) * 12 + month(col("__mo"))).cast("long")
            .as("t"),
          round(col("rev"), 0).cast("long").as("v")),
      series = col("o_orderpriority"), t = col("t"), v = col("v")),
    Some(s"""WITH m AS (SELECT o_orderpriority AS series,
                 date_trunc('month', CAST(o_orderdate AS DATE)) AS mo,
                 ${sqlDsum("o_totalprice")} AS rev
               FROM orders GROUP BY 1, 2),
             s AS (SELECT series,
                 CAST(year(mo) * 12 + month(mo) AS BIGINT) AS tt,
                 CAST(round(rev, 0) AS BIGINT) AS v
               FROM m),
             sp AS (SELECT a.series,
                 CAST(sum(CASE WHEN b.v > a.v THEN 1
                   WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT)
                   AS s_stat
               FROM s a JOIN s b
                 ON a.series = b.series AND a.tt < b.tt
               GROUP BY 1),
             nn AS (SELECT series, count(*) AS n FROM s GROUP BY 1),
             ti AS (SELECT series,
                 CAST(sum(tg * (tg - 1) * (2 * tg + 5)) AS BIGINT)
                   AS tie
               FROM (SELECT series, v, count(*) AS tg
                     FROM s GROUP BY 1, 2) GROUP BY 1),
             vr AS (SELECT nn.series, n, COALESCE(s_stat, 0) AS s_stat,
                 CAST(n * (n - 1) * (2 * n + 5) - tie AS DOUBLE)
                   / 18.0 AS var_s
               FROM nn LEFT JOIN sp ON nn.series = sp.series
               JOIN ti ON nn.series = ti.series),
             zc AS (SELECT *, CASE
                 WHEN s_stat > 0 AND var_s > 0
                   THEN CAST(s_stat - 1 AS DOUBLE) / sqrt(var_s)
                 WHEN s_stat < 0 AND var_s > 0
                   THEN CAST(s_stat + 1 AS DOUBLE) / sqrt(var_s)
                 ELSE 0.0 END AS z
               FROM vr),
             ph AS (SELECT *,
                 1.0 / (1.0 + 0.2316419 * abs(z)) AS t FROM zc)
        SELECT series, n, s_stat, round(var_s, 6) AS var_s,
               round(z, 6) AS z, round($sqlTwoSidedP, 6) AS p_value
        FROM ph ORDER BY series"""))

  /** THRESHOLD SWEEP ([[graft.ops.Eval.thresholdSweep]]): P/R/F1 at
    * every candidate balance threshold for the planted every-third-
    * customer label, max-F1 operating point flagged. Suffix sums over
    * the score census — one pass, one bounded window.
    */
  private val q333_threshold_sweep: Q = (
    (s, dir) => graft.ops.Eval.thresholdSweep(
      read(s, dir, "customer"),
      score = floor(col("c_acctbal") / 100.0).cast("long"),
      label = (col("c_custkey") % 3 === 0).cast("long")),
    Some("""WITH census AS (SELECT
                 CAST(floor(c_acctbal / 100.0) AS BIGINT) AS threshold,
                 CAST(sum(CASE WHEN c_custkey % 3 = 0 THEN 1 ELSE 0
                   END) AS BIGINT) AS pos,
                 CAST(sum(CASE WHEN c_custkey % 3 = 0 THEN 0 ELSE 1
                   END) AS BIGINT) AS neg
               FROM customer GROUP BY 1),
             t AS (SELECT threshold,
                 CAST(sum(pos) OVER (ORDER BY threshold ROWS BETWEEN
                   CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
                   AS tp,
                 CAST(sum(neg) OVER (ORDER BY threshold ROWS BETWEEN
                   CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
                   AS fp
               FROM census),
             tot AS (SELECT CAST(sum(pos) AS BIGINT) AS npos
               FROM census),
             m AS (SELECT threshold, tp, fp, npos - tp AS fn, npos,
                 2 * tp * 1000000 // (2 * tp + fp + (npos - tp))
                   AS f1q
               FROM t CROSS JOIN tot),
             b AS (SELECT *, row_number() OVER (ORDER BY f1q DESC,
                 threshold ASC) AS rn FROM m)
        SELECT threshold, tp, fp, fn,
               round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 6)
                 AS "precision",
               round(CASE WHEN npos > 0 THEN CAST(tp AS DOUBLE)
                 / CAST(npos AS DOUBLE) ELSE 0.0 END, 6) AS recall,
               round(2.0 * CAST(tp AS DOUBLE)
                 / CAST(2.0 * tp + fp + fn AS DOUBLE), 6) AS f1,
               CAST(rn = 1 AS INTEGER) AS is_best
        FROM b ORDER BY threshold"""))

  /** MURPHY BRIER DECOMPOSITION ([[graft.ops.Eval
    * .brierDecomposition]]): reliability − resolution + uncertainty
    * for q313's grid pseudo-probability — WHERE the Brier score is
    * lost. One census pass + bounded close.
    */
  private val q334_brier_decomp: Q = (
    (s, dir) => graft.ops.Eval.brierDecomposition(
      read(s, dir, "customer"),
      p = (col("c_custkey") % 97).cast("double") / 97.0,
      y = (col("c_acctbal") > 5000.0).cast("long")),
    Some("""WITH cells AS (SELECT
                 CAST(c_custkey % 97 AS DOUBLE) / 97.0 AS p,
                 count(*) AS n,
                 CAST(sum(CAST(c_acctbal > 5000.0 AS BIGINT))
                   AS BIGINT) AS s
               FROM customer GROUP BY 1),
             tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
                 CAST(sum(s) AS BIGINT) AS ss FROM cells),
             ag AS (SELECT CAST(max(nn) AS BIGINT) AS n,
                 count(*) AS n_bins,
                 CAST(sum(CAST(CAST(n AS DOUBLE) *
                   (p - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) *
                   (p - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                   AS DECIMAL(38,12))) AS DOUBLE) AS rel,
                 CAST(sum(CAST(CAST(n AS DOUBLE) *
                   ((CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) -
                    (CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE))) *
                   ((CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) -
                    (CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE)))
                   AS DECIMAL(38,12))) AS DOUBLE) AS res,
                 max(CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE)) AS yb
               FROM cells CROSS JOIN tot)
        SELECT n, n_bins,
               round(rel / CAST(n AS DOUBLE), 6) AS reliability,
               round(res / CAST(n AS DOUBLE), 6) AS resolution,
               round(yb * (1.0 - yb), 6) AS uncertainty,
               round(rel / CAST(n AS DOUBLE) - res / CAST(n AS DOUBLE)
                 + yb * (1.0 - yb), 6) AS brier
        FROM ag"""))

  /** WASSERSTEIN-1 SHIFT ([[graft.ops.Eval.wasserstein1]]): how far
    * the order-value distribution moved between the pre/post-1995
    * eras, in $1000 grid units — exact integer cross-product CDF
    * differences times grid gaps, one double divide at the close.
    */
  private val q335_wasserstein: Q = (
    (s, dir) => graft.ops.Eval.wasserstein1(
      read(s, dir, "orders"),
      slice = when(col("o_orderdate") < to_date(lit("1998-01-01")),
        "era1").otherwise("era2"),
      value = floor(col("o_totalprice") / 1000.0).cast("long")),
    Some("""WITH rows AS (SELECT
                 CASE WHEN CAST(o_orderdate AS DATE) <
                   DATE '1998-01-01' THEN 'era1' ELSE 'era2' END
                   AS slice,
                 CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS v
               FROM orders),
             cells AS (SELECT slice, v, count(*) AS c
               FROM rows GROUP BY 1, 2),
             grid AS (SELECT v,
                 CAST(sum(CASE WHEN slice = 'era1' THEN c ELSE 0 END)
                   AS BIGINT) AS ca,
                 CAST(sum(CASE WHEN slice = 'era2' THEN c ELSE 0 END)
                   AS BIGINT) AS cb
               FROM cells GROUP BY 1),
             tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
                 CAST(sum(cb) AS BIGINT) AS nb FROM grid),
             pre AS (SELECT v, ca, cb,
                 sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                   AS cuma,
                 sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                   AS cumb,
                 lead(v) OVER (ORDER BY v) - v AS gap
               FROM grid),
             terms AS (SELECT
                 abs(CAST(cuma AS DECIMAL(38,0)) * nb -
                     CAST(cumb AS DECIMAL(38,0)) * na) * gap AS num
               FROM pre CROSS JOIN tot WHERE gap IS NOT NULL),
             ag AS (SELECT CAST(count(*) + 1 AS BIGINT)
                 AS grid_values,
                 CAST(sum(num) AS DOUBLE) AS s FROM terms)
        SELECT 'era1' AS slice_a, 'era2' AS slice_b,
               na AS n_a, nb AS n_b, grid_values,
               round(s / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6)
                 AS w1
        FROM ag CROSS JOIN tot"""))

  /** SEASONAL MANN-KENDALL ([[graft.ops.RankStats
    * .mannKendallSeasonal]]): year-over-year trend per priority with
    * month-of-year seasons — January compares only to January, so
    * the annual revenue cycle cannot masquerade as trend (q327's
    * plain MK reads the cycle itself). Per-season integer S/VarS
    * summed before one continuity-corrected z.
    */
  private val q343_seasonal_mk: Q = (
    (s, dir) => graft.ops.RankStats.mannKendallSeasonal(
      read(s, dir, "orders")
        .groupBy(col("o_orderpriority"),
          date_trunc("month", col("o_orderdate")).as("__mo"))
        .agg(dsum(col("o_totalprice")).as("rev"))
        .select(col("o_orderpriority"),
          month(col("__mo")).cast("long").as("sea"),
          year(col("__mo")).cast("long").as("t"),
          round(col("rev"), 0).cast("long").as("v")),
      series = col("o_orderpriority"), season = col("sea"),
      t = col("t"), v = col("v")),
    Some(s"""WITH m AS (SELECT o_orderpriority AS series,
                 date_trunc('month', CAST(o_orderdate AS DATE)) AS mo,
                 ${sqlDsum("o_totalprice")} AS rev
               FROM orders GROUP BY 1, 2),
             s AS (SELECT series, CAST(month(mo) AS BIGINT) AS sea,
                 CAST(year(mo) AS BIGINT) AS tt,
                 CAST(round(rev, 0) AS BIGINT) AS v
               FROM m),
             sp AS (SELECT a.series, a.sea,
                 CAST(sum(CASE WHEN b.v > a.v THEN 1
                   WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT) AS sv
               FROM s a JOIN s b ON a.series = b.series
                 AND a.sea = b.sea AND a.tt < b.tt
               GROUP BY 1, 2),
             nn AS (SELECT series, sea, count(*) AS n
               FROM s GROUP BY 1, 2),
             ti AS (SELECT series, sea,
                 CAST(sum(tg * (tg - 1) * (2 * tg + 5)) AS BIGINT)
                   AS tie
               FROM (SELECT series, sea, v, count(*) AS tg
                     FROM s GROUP BY 1, 2, 3) GROUP BY 1, 2),
             per AS (SELECT nn.series, nn.n, COALESCE(sv, 0) AS sv,
                 nn.n * (nn.n - 1) * (2 * nn.n + 5) - tie AS vnum
               FROM nn LEFT JOIN sp
                 ON nn.series = sp.series AND nn.sea = sp.sea
               JOIN ti ON nn.series = ti.series AND nn.sea = ti.sea),
             ag AS (SELECT series, count(*) AS n_seasons,
                 CAST(sum(n) AS BIGINT) AS n,
                 CAST(sum(sv) AS BIGINT) AS s_stat,
                 CAST(sum(vnum) AS DOUBLE) / 18.0 AS var_s
               FROM per GROUP BY 1),
             zc AS (SELECT *, CASE
                 WHEN s_stat > 0 AND var_s > 0
                   THEN CAST(s_stat - 1 AS DOUBLE) / sqrt(var_s)
                 WHEN s_stat < 0 AND var_s > 0
                   THEN CAST(s_stat + 1 AS DOUBLE) / sqrt(var_s)
                 ELSE 0.0 END AS z
               FROM ag),
             ph AS (SELECT *,
                 1.0 / (1.0 + 0.2316419 * abs(z)) AS t FROM zc)
        SELECT series, n, n_seasons, s_stat,
               round(var_s, 6) AS var_s, round(z, 6) AS z,
               round($sqlTwoSidedP, 6) AS p_value
        FROM ph ORDER BY series"""))

  /** SINGLE CHANGEPOINT per series ([[graft.functions.Stats
    * .changepoint]]): the split of each priority's daily-revenue
    * series (exact cents) minimizing two-segment SSE — the
    * level-shift locator next to q258's CUSUM alarms (CUSUM says
    * "drifted past threshold", this says WHERE the mean broke).
    * Integer prefix sums; the split score is a fixed 5-flop double
    * of exact operands (bit-identical on any engine), and only
    * integers are hashed.
    */
  private val q346_changepoint: Q = (
    (s, dir) => {
      val daily = read(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("series"),
          to_date(col("o_orderdate")).as("d"))
        .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5))
          .cast("long")).as("cents"))
      graft.functions.Stats.changepoint(daily, "series", "d",
          col("cents"))
        .orderBy(col("series"))
    },
    Some("""WITH daily AS (SELECT o_orderpriority AS series,
                 CAST(o_orderdate AS DATE) AS d,
                 CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                   AS BIGINT)) AS BIGINT) AS cents
               FROM orders GROUP BY 1, 2),
             p AS (SELECT series, d,
                 CAST(sum(cents) OVER (PARTITION BY series ORDER BY d
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sl,
                 CAST(count(*) OVER (PARTITION BY series ORDER BY d
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS l,
                 CAST(sum(cents) OVER (PARTITION BY series)
                   AS BIGINT) AS s,
                 CAST(count(*) OVER (PARTITION BY series)
                   AS BIGINT) AS n
               FROM daily),
             g AS (SELECT *,
                 CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE)
                   / CAST(l AS DOUBLE)
                 + CAST(s - sl AS DOUBLE) * CAST(s - sl AS DOUBLE)
                   / CAST(n - l AS DOUBLE) AS gv
               FROM p WHERE l < n),
             r AS (SELECT *, row_number() OVER (PARTITION BY series
                 ORDER BY gv DESC, d) AS rn FROM g)
        SELECT series, d AS split_ord, l AS n_left, sl AS sum_left,
               n - l AS n_right, s - sl AS sum_right
        FROM r WHERE rn = 1 ORDER BY series"""))

  /** COMPETING-RISKS CUMULATIVE INCIDENCE ([[graft.ops.Experiment
    * .cumulativeIncidence]], Aalen-Johansen): churn split into two
    * competing causes (the q338 gap>360 event, cause by customer
    * parity) — CIF_k(t) = Σ S(t⁻)·d_k/n over the all-cause KM, the
    * estimator "1 − per-cause KM" gets WRONG under competing events.
    * The oracle replays the census, the KM trajectory, the lagged
    * integer S(t⁻), and both causes' decimal-quantized running
    * sums.
    */
  private val q347_cum_incidence: Q = (
    (s, dir) => {
      val subj = coxSubjects(s, dir)
        .select(col("duration"),
          when(col("event") === 1,
            lit(1L) + col("c_custkey") % 2).otherwise(lit(0L))
            .as("cause"))
      graft.ops.Experiment.cumulativeIncidence(subj,
        col("duration"), col("cause"))
    },
    Some("""WITH per AS (SELECT o_custkey,
                 min(o_orderdate) AS fd, max(o_orderdate) AS ld
               FROM orders GROUP BY 1),
             mx AS (SELECT max(ld) AS maxd FROM per),
             subj AS (SELECT
                 date_diff('day', CAST(fd AS DATE), CAST(ld AS DATE))
                   AS t,
                 CASE WHEN date_diff('day', CAST(ld AS DATE),
                     CAST(maxd AS DATE)) > 360
                   THEN 1 + o_custkey % 2 ELSE 0 END AS cause
               FROM per CROSS JOIN mx),
             times AS (SELECT t, count(*) AS c,
                 CAST(sum(CASE WHEN cause > 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS d_all,
                 CAST(sum(CASE WHEN cause = 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS d1,
                 CAST(sum(CASE WHEN cause = 2 THEN 1 ELSE 0 END)
                   AS BIGINT) AS d2
               FROM subj GROUP BY 1),
             tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM times),
             r AS (SELECT t, c, d_all, d1, d2,
                 CAST(n - COALESCE(sum(c) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS n_risk
               FROM times CROSS JOIN tot),
             km AS (SELECT *, round(exp(sum(ln(1.0 -
                 CAST(d_all AS DOUBLE) / CAST(n_risk AS DOUBLE)))
                 OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)), 6)
                 AS surv FROM r),
             sp AS (SELECT *, COALESCE(lag(CAST(floor(surv * 1e6
                 + 0.5) AS BIGINT)) OVER (ORDER BY t), 1000000) AS s6p
               FROM km),
             terms AS (SELECT 1 AS cause, t, n_risk, d1 AS d,
                 CAST(CAST(s6p * d1 AS DOUBLE)
                   / (CAST(n_risk AS DOUBLE) * 1e6)
                   AS DECIMAL(38,12)) AS term FROM sp
               UNION ALL
               SELECT 2, t, n_risk, d2,
                 CAST(CAST(s6p * d2 AS DOUBLE)
                   / (CAST(n_risk AS DOUBLE) * 1e6)
                   AS DECIMAL(38,12)) FROM sp)
        SELECT CAST(cause AS BIGINT) AS cause, t, n_risk, d,
               round(CAST(sum(term) OVER (PARTITION BY cause
                 ORDER BY t ROWS UNBOUNDED PRECEDING) AS DOUBLE), 6)
                 AS cif
        FROM terms ORDER BY cause, t"""))

  /** KMV DISTINCT SKETCH per segment ([[graft.llmdata.Sketches
    * .kmv]]/[[graft.llmdata.Sketches.kmvEstimate]]): distinct
    * customers per order priority from a k=256 minimum-hash-values
    * summary — the mergeable distinct counter that (unlike HLL,
    * q123) retains samples and so supports set operations (q349).
    * Portable multiplicative hash, per-segment rank window
    * (WindowGroupLimit), floor-of-one-double estimator: every value
    * replays exactly.
    */
  private val q348_kmv_sketch: Q = (
    (s, dir) => graft.llmdata.Sketches.kmvEstimate(
        graft.llmdata.Sketches.kmv(read(s, dir, "orders"),
          "o_orderpriority", col("o_custkey"), k = 256), k = 256)
      .orderBy(col("segment")),
    Some("""WITH h AS (SELECT DISTINCT o_orderpriority AS segment,
                 ((o_custkey % 1000000007) * 2654435761 + 42)
                   % 1000000007 AS h
               FROM orders),
             r AS (SELECT segment, h, row_number() OVER (
                 PARTITION BY segment ORDER BY h) AS rank FROM h),
             sk AS (SELECT segment, rank, h FROM r WHERE rank <= 256),
             ag AS (SELECT segment,
                 CAST(count(*) AS BIGINT) AS n_sketch,
                 max(h) AS hk FROM sk GROUP BY 1)
        SELECT segment, n_sketch,
               CASE WHEN n_sketch < 256 THEN n_sketch
                 ELSE CAST(floor(255.0 * 1000000007.0
                   / CAST(hk AS DOUBLE)) AS BIGINT) END
                 AS est_distinct
        FROM ag ORDER BY segment"""))

  /** KMV SET-OPERATION estimates ([[graft.llmdata.Sketches
    * .kmvIntersect]]): union size, Jaccard (ppm) and intersection
    * of the 1-URGENT vs 5-LOW customer bases from their q348
    * sketches alone — O(k) work per segment pair regardless of
    * corpus size, the capability HLL fundamentally lacks. All
    * quantization is floor-of-double of exact integers.
    */
  private val q349_kmv_intersect: Q = (
    (s, dir) => {
      val sk = graft.llmdata.Sketches.kmv(read(s, dir, "orders"),
        "o_orderpriority", col("o_custkey"), k = 256)
      graft.llmdata.Sketches.kmvIntersect(
        sk.where(col("segment") === "1-URGENT"),
        sk.where(col("segment") === "5-LOW"), k = 256)
    },
    Some("""WITH h AS (SELECT DISTINCT o_orderpriority AS segment,
                 ((o_custkey % 1000000007) * 2654435761 + 42)
                   % 1000000007 AS h
               FROM orders
               WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
             r AS (SELECT segment, h, row_number() OVER (
                 PARTITION BY segment ORDER BY h) AS rank FROM h),
             sk AS (SELECT segment, h FROM r WHERE rank <= 256),
             a AS (SELECT DISTINCT h FROM sk
                   WHERE segment = '1-URGENT'),
             b AS (SELECT DISTINCT h FROM sk
                   WHERE segment = '5-LOW'),
             uk AS (SELECT h FROM (SELECT DISTINCT h FROM
                 (SELECT h FROM a UNION ALL SELECT h FROM b))
               ORDER BY h LIMIT 256),
             mk AS (SELECT uk.h,
                 CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL
                   THEN 1 ELSE 0 END AS in2
               FROM uk LEFT JOIN a ON uk.h = a.h
                       LEFT JOIN b ON uk.h = b.h),
             ag AS (SELECT CAST(count(*) AS BIGINT)
                   AS n_union_sketch,
                 max(h) AS hk,
                 CAST(sum(in2) AS BIGINT) AS both_in_k FROM mk),
             est AS (SELECT n_union_sketch,
                 CASE WHEN n_union_sketch < 256 THEN n_union_sketch
                   ELSE CAST(floor(255.0 * 1000000007.0
                     / CAST(hk AS DOUBLE)) AS BIGINT) END
                   AS est_union,
                 both_in_k,
                 CAST(floor(CAST(both_in_k AS DOUBLE) * 1000000.0
                   / CAST(n_union_sketch AS DOUBLE)) AS BIGINT)
                   AS jaccard_ppm
               FROM ag)
        SELECT n_union_sketch, est_union, both_in_k, jaccard_ppm,
               CAST(floor(CAST(est_union AS DOUBLE)
                 * CAST(jaccard_ppm AS DOUBLE) / 1000000.0)
                 AS BIGINT) AS est_intersection
        FROM est"""))

  /** GROUP-SEQUENTIAL OBF MONITORING ([[graft.ops.Experiment
    * .groupSequentialObf]]): seven annual interim looks at a
    * two-arm high-value-order rate test — cumulative exact counts,
    * pooled z per look, the O'Brien-Fleming √(K/k) boundary from
    * the A&S inverse normal, first-crossing flagged. The interim-
    * analysis discipline between q235's fixed-n test and q299's
    * always-valid mSPRT. Oracle replays the census, the prefix
    * sums, the z/boundary doubles and the crossing scan.
    */
  private val q352_group_seq: Q = (
    (s, dir) => graft.ops.Experiment.groupSequentialObf(
      read(s, dir, "orders"),
      look = year(col("o_orderdate")).cast("long"),
      armB = col("o_custkey") % 2 === 1,
      success = (col("o_totalprice") > 150000.0).cast("long"),
      totalLooks = 7),
    Some("""WITH cells AS (SELECT CAST(year(o_orderdate) AS BIGINT)
                   AS look,
                 CAST(sum(CASE WHEN o_custkey % 2 = 0 THEN 1
                   ELSE 0 END) AS BIGINT) AS na,
                 CAST(sum(CASE WHEN o_custkey % 2 = 0
                   AND o_totalprice > 150000.0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS xa,
                 CAST(sum(CASE WHEN o_custkey % 2 = 1 THEN 1
                   ELSE 0 END) AS BIGINT) AS nb,
                 CAST(sum(CASE WHEN o_custkey % 2 = 1
                   AND o_totalprice > 150000.0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS xb
               FROM orders GROUP BY 1),
             cum AS (SELECT look,
                 CAST(row_number() OVER (ORDER BY look) AS BIGINT)
                   AS k,
                 CAST(sum(na) OVER w AS BIGINT) AS n_a,
                 CAST(sum(xa) OVER w AS BIGINT) AS x_a,
                 CAST(sum(nb) OVER w AS BIGINT) AS n_b,
                 CAST(sum(xb) OVER w AS BIGINT) AS x_b
               FROM cells
               WINDOW w AS (ORDER BY look ROWS UNBOUNDED PRECEDING)),
             za0 AS (SELECT sqrt(-2.0 * ln(0.025)) AS t),
             zaq AS (SELECT t - (2.515517 + t * (0.802853 +
                 t * 0.010328)) / (1.0 + t * (1.432788 +
                 t * (0.189269 + t * 0.001308))) AS za FROM za0),
             zz AS (SELECT cum.*,
                 CASE WHEN x_a + x_b = 0
                     OR x_a + x_b = n_a + n_b
                     OR n_a = 0 OR n_b = 0 THEN NULL
                   ELSE round((CAST(x_a AS DOUBLE)
                       / CAST(n_a AS DOUBLE)
                     - CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                     / sqrt((CAST(x_a + x_b AS DOUBLE)
                         / CAST(n_a + n_b AS DOUBLE))
                       * (1.0 - CAST(x_a + x_b AS DOUBLE)
                         / CAST(n_a + n_b AS DOUBLE))
                       * (1.0 / CAST(n_a AS DOUBLE)
                         + 1.0 / CAST(n_b AS DOUBLE))), 6) END AS z,
                 round(za * sqrt(7.0 / CAST(k AS DOUBLE)), 6)
                   AS boundary
               FROM cum CROSS JOIN zaq),
             cr AS (SELECT *, CASE WHEN COALESCE(abs(z), 0.0)
                 >= boundary THEN 1 ELSE 0 END AS crossed FROM zz),
             fk AS (SELECT min(CASE WHEN crossed = 1 THEN k END)
                 AS firstk FROM cr)
        SELECT look, k, n_a, x_a, n_b, x_b, z, boundary,
               CAST(crossed AS INTEGER) AS crossed,
               CAST(CASE WHEN firstk IS NOT NULL AND k = firstk
                 THEN 1 ELSE 0 END AS INTEGER) AS is_first_crossing
        FROM cr CROSS JOIN fk ORDER BY k"""))

  /** TWO-SAMPLE CRAMÉR-VON MISES ([[graft.ops.RankStats
    * .cramerVonMises]]): integrated squared CDF gap between the
    * customer-parity order-value distributions on the whole-dollar
    * census — the distribution-shift read KS's single supremum and
    * Wasserstein's transport cost both miss (many small gaps across
    * the range). Decimal-exact numerator, one double close.
    */
  private val q356_cvm: Q = (
    (s, dir) => graft.ops.RankStats.cramerVonMises(
      read(s, dir, "orders"),
      inB = col("o_custkey") % 2 === 1,
      value = floor(col("o_totalprice"))),
    Some("""WITH rows AS (SELECT
                 CAST(o_custkey % 2 = 1 AS BOOLEAN) AS b,
                 CAST(floor(o_totalprice) AS BIGINT) AS v
               FROM orders),
             census AS (SELECT v,
                 CAST(sum(CASE WHEN NOT b THEN 1 ELSE 0 END)
                   AS BIGINT) AS ca,
                 CAST(sum(CASE WHEN b THEN 1 ELSE 0 END)
                   AS BIGINT) AS cb
               FROM rows GROUP BY 1),
             tot AS (SELECT CAST(sum(ca) AS BIGINT) AS n,
                 CAST(sum(cb) AS BIGINT) AS m FROM census),
             cum AS (SELECT v, ca, cb,
                 CAST(sum(ca) OVER (ORDER BY v
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS A,
                 CAST(sum(cb) OVER (ORDER BY v
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS B
               FROM census),
             gp AS (SELECT ca, cb,
                 CAST(A AS HUGEINT) * CAST(m AS HUGEINT)
                   - CAST(B AS HUGEINT) * CAST(n AS HUGEINT) AS gap,
                 n, m
               FROM cum CROSS JOIN tot),
             ag AS (SELECT max(n) AS n_a, max(m) AS n_b,
                 sum(CAST(ca + cb AS HUGEINT) * gap * gap) AS num
               FROM gp)
        SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
               round(CAST(num AS DOUBLE)
                 / (CAST(n_a + n_b AS DOUBLE)
                   * CAST(n_a + n_b AS DOUBLE)
                   * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6)
                 AS t_stat
        FROM ag"""))

  /** CAPTURE-RECAPTURE population estimate ([[graft.functions.Stats
    * .captureRecapture]]): viewers and clickers as the two capture
    * channels over the events user space — Chapman and Lincoln-
    * Petersen estimates of the TOTAL user population next to the
    * seen lower bound; one grouped pass, floor-of-double integer
    * closes.
    */
  private val q357_capture: Q = (
    (s, dir) => graft.functions.Stats.captureRecapture(
      read(s, dir, "events"),
      key = col("user_id"),
      inA = col("event_type") === "view",
      inB = col("event_type") === "click"),
    Some("""WITH pk AS (SELECT user_id,
                 max(CASE WHEN event_type = 'view' THEN 1 ELSE 0
                   END) AS ia,
                 max(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                   END) AS ib
               FROM events GROUP BY 1
               HAVING max(CASE WHEN event_type = 'view' THEN 1
                   ELSE 0 END) = 1
                 OR max(CASE WHEN event_type = 'click' THEN 1
                   ELSE 0 END) = 1)
        SELECT CAST(sum(ia) AS BIGINT) AS n_a,
               CAST(sum(ib) AS BIGINT) AS n_b,
               CAST(sum(CASE WHEN ia = 1 AND ib = 1 THEN 1 ELSE 0
                 END) AS BIGINT) AS overlap,
               CAST(count(*) AS BIGINT) AS seen,
               CAST((CAST(sum(ia) AS HUGEINT) + 1)
                   * (CAST(sum(ib) AS HUGEINT) + 1)
                 // (CAST(sum(CASE WHEN ia = 1 AND ib = 1 THEN 1
                     ELSE 0 END) AS HUGEINT) + 1) AS BIGINT) - 1
                 AS chapman_est,
               CASE WHEN sum(CASE WHEN ia = 1 AND ib = 1 THEN 1
                   ELSE 0 END) > 0 THEN
                 CAST(CAST(sum(ia) AS HUGEINT)
                     * CAST(sum(ib) AS HUGEINT)
                   // CAST(sum(CASE WHEN ia = 1 AND ib = 1 THEN 1
                       ELSE 0 END) AS HUGEINT) AS BIGINT) END
                 AS lincoln_petersen_est
        FROM pk"""))

  /** BISECTION IRR under the ORACLE ([[graft.ops.Finance
    * .irrBisect]]) — the oracled twin of the q83 solver family
    * (reference parser.go:617-658, the r11 verdict's top ask): the
    * same q83 cashflow construction (first line the outflow, later
    * lines 30% inflows, same tiebreak order), solved by 40 unrolled
    * bisection steps whose every double operation the oracle replays
    * — pow-free multiply-chain discounting, in-double bracket
    * operands, half-up ppm close. The oracle SQL is GENERATED by the
    * same loop as the operator's npv builder, so the operand
    * sequence provably matches; orders without a bracket sign change
    * (q83's 0.0-sentinel rows) are dropped by contract.
    */
  private val q358_irr_bisect: Q = {
    val P = 7; val STEPS = 40
    def npv(u: String) = graft.ops.Finance.npvSql(u, P, p => s"cf$p")
    val pivCols = (0 until P).map(p =>
      s"sum(CASE WHEN t = $p THEN cf ELSE 0.0 END) AS cf$p")
      .mkString(", ")
    val cfList = (0 until P).map(p => s"cf$p").mkString(", ")
    val uLo = "(1.0 + CAST(-0.99 AS DOUBLE))"
    val uHi = "(1.0 + CAST(10.0 AS DOUBLE))"
    val stepCtes = (1 to STEPS).map { i =>
      val prev = s"s${i - 1}"
      s"""m$i AS (SELECT * , (lo + hi) * 0.5 AS mid FROM $prev),
         p$i AS (SELECT * , (${npv("(1.0 + mid)")}) > 0 AS pos
           FROM m$i),
         s$i AS (SELECT k, $cfList,
             CASE WHEN pos THEN mid ELSE lo END AS lo,
             CASE WHEN pos THEN hi ELSE mid END AS hi FROM p$i)"""
    }.mkString(",\n")
    ((s: org.apache.spark.sql.SparkSession, dir: String) => {
      val W = org.apache.spark.sql.expressions.Window
      val w = W.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_extendedprice"))
      val flows = read(s, dir, "lineitem")
        .withColumn("__t", row_number().over(w) - 1)
        .withColumn("__nl",
          count(lit(1)).over(W.partitionBy(col("l_orderkey"))))
        .where(col("__nl") >= 3)
        .withColumn("__px", col("l_extendedprice").cast("double"))
        .withColumn("__cfv", when(col("__t") === 0, -col("__px"))
          .otherwise(col("__px") * lit(0.3)))
      graft.ops.Finance.irrBisect(flows, col("l_orderkey"),
          col("__t"), col("__cfv"), steps = STEPS, maxPeriods = P)
        .select(col("key").as("l_orderkey"), col("irr_ppm"))
        .orderBy(col("l_orderkey"))
    },
    Some(s"""WITH rn AS (SELECT l_orderkey AS k,
                 row_number() OVER (PARTITION BY l_orderkey
                   ORDER BY l_linenumber, l_partkey, l_suppkey,
                     l_extendedprice) - 1 AS t,
                 count(*) OVER (PARTITION BY l_orderkey) AS nl,
                 CAST(l_extendedprice AS DOUBLE) AS px
               FROM lineitem),
             base AS (SELECT k, t,
                 CASE WHEN t = 0 THEN -px ELSE px * 0.3 END AS cf
               FROM rn WHERE nl >= 3 AND t >= 0 AND t < $P),
             piv AS (SELECT k, $pivCols FROM base GROUP BY k),
             s0 AS (SELECT k, $cfList,
                 CAST(-0.99 AS DOUBLE) AS lo,
                 CAST(10.0 AS DOUBLE) AS hi
               FROM piv WHERE (${npv(uLo)}) > 0
                 AND (${npv(uHi)}) < 0),
             $stepCtes
        SELECT k AS l_orderkey,
               CAST(floor((lo + hi) * 0.5 * 1e6 + 0.5) AS BIGINT)
                 AS irr_ppm
        FROM s$STEPS ORDER BY l_orderkey"""))
  }

  /** CLOSED-FORM 2x2 PCA under the ORACLE ([[graft.functions.Tabular
    * .eigen2]]) — the oracled eigensolver twin of q265 (the r11
    * verdict's suggested closed-form eigen twin): the sample
    * covariance of (l_quantity, l_extendedprice) from the exact-
    * decimal moment lattice, diagonalized by the one-rotation closed
    * form (a+c)/2 ± sqrt(((a−c)/2)² + b²) — a single correctly-
    * rounded sqrt inside a fixed double operation order. Emitted
    * values are all BOUNDED (trace shares, unit eigenvector
    * components) so the ppm grid carries a ~1e7 safety factor over
    * the cross-engine decimal→double cast wobble past 2^53 (the
    * margin-sweep discipline — a ppm of an unbounded eigenvalue
    * straddled an ulp at sf0.1).
    */
  private val q359_eigen2: Q = (
    (s, dir) => graft.functions.Tabular.eigen2(
      read(s, dir, "lineitem"), "l_quantity", "l_extendedprice"),
    Some(s"""WITH m AS (SELECT count(*) AS n,
                 ${sqlDsum("l_quantity")} AS sx,
                 ${sqlDsum("l_extendedprice")} AS sy,
                 ${sqlDsumsq("l_quantity")} AS qx,
                 ${sqlDsumsq("l_extendedprice")} AS qy,
                 CAST(sum(CAST(CAST(l_quantity AS DOUBLE)
                     * CAST(l_extendedprice AS DOUBLE)
                   AS DECIMAL(38,10))) AS DOUBLE) AS xy
               FROM lineitem
               WHERE l_quantity IS NOT NULL
                 AND l_extendedprice IS NOT NULL),
             d AS (SELECT n,
                 (qx - sx * sx / CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE) - 1.0) AS a,
                 (xy - sx * sy / CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE) - 1.0) AS b,
                 (qy - sy * sy / CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE) - 1.0) AS c
               FROM m),
             e AS (SELECT n, a, b, c,
                 (a - c) * 0.5 AS h, (a + c) * 0.5 AS mm FROM d),
             f AS (SELECT n, a, b, c, mm,
                 sqrt(h * h + b * b) AS s FROM e),
             g AS (SELECT n, a, b, a + c AS tr,
                 mm + s AS l1, mm - s AS l2,
                 (mm + s) - a AS ev FROM f),
             i AS (SELECT n, tr, l1, l2, b, ev,
                 sqrt(ev * ev + b * b) AS nv FROM g)
        SELECT CAST(n AS BIGINT) AS n,
               CAST(floor(tr + 0.5) AS BIGINT) AS trace_unit,
               CAST(floor(l1 / tr * 1e6 + 0.5) AS BIGINT)
                 AS lam1_share_ppm,
               CAST(floor(l2 / tr * 1e6 + 0.5) AS BIGINT)
                 AS lam2_share_ppm,
               CAST(floor(b / nv * 1e6 + 0.5) AS BIGINT)
                 AS pc1_x_ppm,
               CAST(floor(ev / nv * 1e6 + 0.5) AS BIGINT)
                 AS pc1_y_ppm
        FROM i"""))

  /** COHEN'S KAPPA inter-rater agreement ([[graft.ops.Eval
    * .cohensKappa]]): order status vs a deterministic priority-rule
    * "second annotator" — agreement beyond chance from the exact
    * contingency census, the label-quality audit run before
    * trusting training labels. Chance and kappa terms are
    * decimal(38,0)-exact; everything emitted is a bounded ppm.
    */
  private val q360_kappa: Q = (
    (s, dir) => graft.ops.Eval.cohensKappa(
      read(s, dir, "orders"),
      raterA = col("o_orderstatus"),
      raterB = when(col("o_orderpriority")
          .isin("1-URGENT", "2-HIGH"), "O")
        .when(col("o_orderpriority") === "5-LOW", "F")
        .otherwise("P")),
    Some("""WITH r AS (SELECT o_orderstatus AS a,
                 CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 'O'
                   WHEN o_orderpriority = '5-LOW' THEN 'F'
                   ELSE 'P' END AS b
               FROM orders WHERE o_orderstatus IS NOT NULL),
             cells AS (SELECT a, b, count(*) AS c FROM r
               GROUP BY 1, 2),
             rw AS (SELECT a AS k, CAST(sum(c) AS HUGEINT) AS rr
               FROM cells GROUP BY 1),
             cl AS (SELECT b AS k, CAST(sum(c) AS HUGEINT) AS ll
               FROM cells GROUP BY 1),
             pet AS (SELECT sum(rr * ll) AS pe
               FROM rw JOIN cl USING (k)),
             ag AS (SELECT CAST(sum(c) AS HUGEINT) AS n,
                 CAST(sum(CASE WHEN a = b THEN c ELSE 0 END)
                   AS HUGEINT) AS d
               FROM cells)
        SELECT CAST(n AS BIGINT) AS n,
               CAST(floor(CAST(d AS DOUBLE) / CAST(n AS DOUBLE)
                 * 1e6 + 0.5) AS BIGINT) AS po_ppm,
               CAST(floor(CAST(pe AS DOUBLE) / CAST(n * n AS DOUBLE)
                 * 1e6 + 0.5) AS BIGINT) AS pe_ppm,
               CAST(floor(CAST(n * d - pe AS DOUBLE)
                 / CAST(n * n - pe AS DOUBLE) * 1e6 + 0.5)
                 AS BIGINT) AS kappa_ppm
        FROM ag CROSS JOIN pet"""))

  /** McNEMAR paired-classifier test ([[graft.ops.Eval.mcnemar]]):
    * two deterministic order-status "models" (price rule vs
    * priority rule) compared on the SAME orders — only the
    * discordant cells vote, continuity-corrected chi-square, p via
    * the portable A&S normal CDF. The paired comparison an unpaired
    * accuracy diff gets wrong when the models' errors overlap.
    */
  private val q361_mcnemar: Q = (
    (s, dir) => graft.ops.Eval.mcnemar(
      read(s, dir, "orders"),
      correctA = (col("o_totalprice") < 150000.0) ===
        (col("o_orderstatus") === "F"),
      correctB = (col("o_orderpriority") === "1-URGENT") ===
        (col("o_orderstatus") === "F")),
    Some(s"""WITH r AS (SELECT
                 (o_totalprice < 150000.0) = (o_orderstatus = 'F')
                   AS ca,
                 (o_orderpriority = '1-URGENT')
                   = (o_orderstatus = 'F') AS cb
               FROM orders),
             ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN ca AND NOT cb THEN 1 ELSE 0 END)
                   AS BIGINT) AS b,
                 CAST(sum(CASE WHEN NOT ca AND cb THEN 1 ELSE 0 END)
                   AS BIGINT) AS c
               FROM r),
             ch AS (SELECT n, b, c,
                 CAST(CAST(abs(b - c) - 1 AS HUGEINT)
                     * CAST(abs(b - c) - 1 AS HUGEINT) AS DOUBLE)
                   / CAST(b + c AS DOUBLE) AS chi
               FROM ag),
             zc AS (SELECT n, b, c, sqrt(chi) AS z FROM ch),
             ph AS (SELECT *,
                 1.0 / (1.0 + 0.2316419 * abs(z)) AS t FROM zc)
        SELECT n, b, c,
               CASE WHEN b + c = 0 THEN 1.0
                 ELSE round($sqlTwoSidedP, 6) END AS p_value
        FROM ph"""))

  /** DURBIN-WATSON serial correlation ([[graft.ops.RankStats
    * .durbinWatson]]) of daily order counts per priority —
    * consecutive-day independence audit (d ≈ 2 independent, → 0
    * positively autocorrelated), the residual check a backtest/OLS
    * read needs. Integer diffs and moments in decimal(38,0), one
    * double close per series.
    */
  private val q362_durbin_watson: Q = (
    (s, dir) => graft.ops.RankStats.durbinWatson(
      read(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("series"),
          col("o_orderdate").as("ord"))
        .agg(count(lit(1)).as("x")),
      "series", "ord", col("x")),
    Some("""WITH d AS (SELECT o_orderpriority AS series,
                 o_orderdate AS dt, count(*) AS x
               FROM orders GROUP BY 1, 2),
             l AS (SELECT series, x,
                 x - lag(x) OVER (PARTITION BY series ORDER BY dt)
                   AS dd
               FROM d),
             ag AS (SELECT series, CAST(count(*) AS HUGEINT) AS n,
                 sum(CAST(dd AS HUGEINT) * CAST(dd AS HUGEINT))
                   AS num,
                 sum(CAST(x AS HUGEINT)) AS sx,
                 sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS qx
               FROM l GROUP BY 1)
        SELECT series, CAST(n AS BIGINT) AS n,
               CASE WHEN n * qx - sx * sx <> 0 THEN
                 round(CAST(n * num AS DOUBLE)
                   / CAST(n * qx - sx * sx AS DOUBLE), 6) END AS dw
        FROM ag ORDER BY series"""))

  /** SPLIT-CONFORMAL PREDICTION INTERVAL ([[graft.ops.Eval
    * .splitConformal]]): distribution-free ±q̂ coverage around a
    * static per-priority price model (the q145 static-weight rule —
    * the wrapper is model-agnostic by construction) — portable-hash
    * calibration split, exact rank pick over the $10-grid residual
    * census, integer-ppm coverage audit on the held-out half.
    */
  private val q364_conformal: Q = {
    val priors = Seq("1-URGENT" -> 151000L, "2-HIGH" -> 150000L,
      "3-MEDIUM" -> 149000L, "4-NOT SPECIFIED" -> 152000L)
    val predCol = priors.tail.foldLeft(
      when(col("o_orderpriority") === priors.head._1,
        priors.head._2)) { case (acc, (p, v)) =>
      acc.when(col("o_orderpriority") === p, v)
    }.otherwise(148000L)
    val predSql = "CASE " + priors.map { case (p, v) =>
      s"WHEN o_orderpriority = '$p' THEN $v" }.mkString(" ") +
      " ELSE 148000 END"
    ((s: org.apache.spark.sql.SparkSession, dir: String) =>
      graft.ops.Eval.splitConformal(
        read(s, dir, "orders")
          .withColumn("__rc", round(abs(col("o_totalprice") -
            predCol) * 100).cast("long"))
          .withColumn("__rq", expr("__rc div 1000")),
        id = col("o_orderkey"), residualQ = col("__rq"),
        alphaPpm = 100000L),
      Some(s"""WITH r AS (SELECT
                 CAST(round(abs(o_totalprice - $predSql) * 100, 0)
                   AS BIGINT) // 1000 AS rq,
                 ((((o_orderkey % 1000000007) * 2654435761 + 42)
                   % 1000000007) % 1000000) < 500000 AS cal
               FROM orders),
             c AS (SELECT rq,
                 CAST(sum(CASE WHEN cal THEN 1 ELSE 0 END)
                   AS BIGINT) AS cc,
                 CAST(sum(CASE WHEN cal THEN 0 ELSE 1 END)
                   AS BIGINT) AS ct
               FROM r GROUP BY 1),
             t AS (SELECT CAST(sum(cc) AS BIGINT) AS ncal,
                 CAST(sum(ct) AS BIGINT) AS ntest FROM c),
             kk AS (SELECT ncal, ntest,
                 CAST(((CAST(ncal AS HUGEINT) + 1) * 900000
                   + 999999) // 1000000 AS BIGINT) AS k FROM t),
             cm AS (SELECT rq, sum(cc) OVER (ORDER BY rq
                 ROWS UNBOUNDED PRECEDING) AS cum FROM c),
             qh AS (SELECT min(CASE WHEN cum >= k THEN rq END)
                 AS qhat FROM cm CROSS JOIN kk),
             cov AS (SELECT CAST(sum(CASE WHEN rq <= qhat THEN ct
                 ELSE 0 END) AS BIGINT) AS ncov
               FROM c CROSS JOIN qh)
        SELECT ncal AS n_cal, ntest AS n_test, k, qhat AS qhat_q,
               ncov AS n_covered,
               ncov * 1000000 // ntest AS coverage_ppm
        FROM kk CROSS JOIN qh CROSS JOIN cov"""))
  }

  /** BRADLEY–TERRY preference strengths ([[graft.ops.Preference
    * .bradleyTerry]]): brands as "models", each order's per-brand
    * quantity totals as pairwise preference votes (larger total
    * wins, ties dropped) — the RLHF-style reduction of N pairwise
    * comparisons to a per-item strength leaderboard. The oracle
    * replays the ENTIRE 10-step integer MM trajectory as unrolled
    * CTEs ([[graft.ops.Preference.bradleyTerrySql]]), the q151
    * DoReMi discipline.
    */
  private val btCmpSql: String =
    """SELECT CASE WHEN a.q > b.q THEN a.brand ELSE b.brand END AS winner,
              CASE WHEN a.q > b.q THEN b.brand ELSE a.brand END AS loser
       FROM (SELECT l_orderkey AS ok, p_brand AS brand,
                    sum(CAST(l_quantity AS BIGINT)) AS q
             FROM lineitem JOIN part ON l_partkey = p_partkey
             GROUP BY 1, 2) a
       JOIN (SELECT l_orderkey AS ok, p_brand AS brand,
                    sum(CAST(l_quantity AS BIGINT)) AS q
             FROM lineitem JOIN part ON l_partkey = p_partkey
             GROUP BY 1, 2) b
         ON a.ok = b.ok AND a.brand < b.brand
       WHERE a.q <> b.q"""

  private val q365_bradley_terry: Q = (
    (s, dir) => {
      val ob = read(s, dir, "lineitem")
        .join(read(s, dir, "part"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_orderkey").as("ok"), col("p_brand").as("brand"))
        .agg(sum(col("l_quantity").cast("long")).as("q"))
      val cmp = ob.alias("a")
        .join(ob.alias("b"),
          col("a.ok") === col("b.ok") &&
            col("a.brand") < col("b.brand"))
        .where(col("a.q") =!= col("b.q"))
        .select(
          when(col("a.q") > col("b.q"), col("a.brand"))
            .otherwise(col("b.brand")).as("winner"),
          when(col("a.q") > col("b.q"), col("b.brand"))
            .otherwise(col("a.brand")).as("loser"))
      graft.ops.Preference.bradleyTerry(cmp, col("winner"),
        col("loser"), steps = 10).orderBy(col("item"))
    },
    Some(graft.ops.Preference.bradleyTerrySql(btCmpSql, steps = 10)))

  /** The q388 game stream: sampled orders whose lines span exactly
    * two brands, winner = the brand with the larger EXACT-DECIMAL
    * price total (float sums would let the winner flip across
    * engines), ordered by order key (the synthetic event order).
    */
  private val eloGamesSql: String =
    """SELECT ob.ok AS ts, max_by(b, s) AS w, min_by(b, s) AS l
       FROM (SELECT l.l_orderkey AS ok, p.p_brand AS b,
               sum(CAST(l.l_extendedprice AS DECIMAL(25,6))) AS s
             FROM lineitem l
             JOIN part p ON l.l_partkey = p.p_partkey
             WHERE l.l_orderkey % 13 = 0
             GROUP BY 1, 2) ob
       JOIN (SELECT ok FROM (SELECT l.l_orderkey AS ok, p.p_brand AS b
               FROM lineitem l
               JOIN part p ON l.l_partkey = p.p_partkey
               WHERE l.l_orderkey % 13 = 0
               GROUP BY 1, 2)
             GROUP BY ok HAVING count(*) = 2) two
         ON two.ok = ob.ok
       GROUP BY ob.ok HAVING min(s) <> max(s)"""

  /** ELO RATING TRAJECTORY ([[graft.ops.Preference.elo]]): brand
    * duels (two-brand orders, richer side wins) replayed in event
    * order — the online leaderboard next to q365's batch
    * Bradley-Terry over the same preference stream; pure-integer
    * updates from the shared 32-bucket expected-score table, the
    * oracle a recursive CTE carrying the full rating list as
    * per-step state.
    */
  private val q388_elo: Q = (
    (s, dir) => {
      val li = read(s, dir, "lineitem")
        .where(col("l_orderkey") % 13 === 0)
        .join(read(s, dir, "part"),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("ok"), col("p_brand").as("b"),
          col("l_extendedprice").cast("decimal(25,6)").as("ep"))
      val ob = li.groupBy(col("ok"), col("b"))
        .agg(sum(col("ep")).as("s"))
      val two = ob.groupBy(col("ok"))
        .agg(count(lit(1)).as("__c"), min(col("s")).as("__lo"),
          max(col("s")).as("__hi"))
        .where(col("__c") === 2 && col("__lo") =!= col("__hi"))
        .select(col("ok"))
      val games = ob.join(two, Seq("ok")).groupBy(col("ok"))
        .agg(max_by(col("b"), col("s")).as("w"),
          min_by(col("b"), col("s")).as("l"))
      graft.ops.Preference.elo(games, col("ok"), col("w"), col("l"))
    },
    Some(graft.ops.Preference.eloSql(eloGamesSql)))

  /** STREAMING ELO ([[graft.streaming.EloStream.eloStream]]): the
    * q388 brand duels through the ingest-time leaderboard fold —
    * identical pure-integer trajectory (shared EloTable, zero-sum
    * K-update), stream == batch bit-for-bit under order-respecting
    * slicings (StreamingEloSpec), so the oracle IS q388's recursive
    * CTE (the q351/q378 convention).
    */
  private val q392_elo_stream: Q = (
    (s, dir) => {
      val li = read(s, dir, "lineitem")
        .where(col("l_orderkey") % 13 === 0)
        .join(read(s, dir, "part"),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("ok"), col("p_brand").as("b"),
          col("l_extendedprice").cast("decimal(25,6)").as("ep"))
      val ob = li.groupBy(col("ok"), col("b"))
        .agg(sum(col("ep")).as("s"))
      val two = ob.groupBy(col("ok"))
        .agg(count(lit(1)).as("__c"), min(col("s")).as("__lo"),
          max(col("s")).as("__hi"))
        .where(col("__c") === 2 && col("__lo") =!= col("__hi"))
        .select(col("ok"))
      val games = ob.join(two, Seq("ok")).groupBy(col("ok"))
        .agg(max_by(col("b"), col("s")).as("w"),
          min_by(col("b"), col("s")).as("l"))
      graft.streaming.EloStream.eloStream(games, "ok", "w", "l")
        .toDF()
        .select(col("item"), col("games"), col("wins"),
          col("rating_ppm"),
          (col("rating_ppm").cast("double") / lit(1e6)).as("rating"))
        .orderBy(col("item"))
    },
    Some(graft.ops.Preference.eloSql(eloGamesSql)))

  /** COCHRAN-ARMITAGE TREND ([[graft.ops.RankStats
    * .cochranArmitage]]): does the return RATE trend across line
    * positions — the binary-outcome member of the directional
    * family (q387 Page needs blocks, q389 Jonckheere continuous
    * responses; this is the dose-response test for proportions).
    * One group-census pass, exact decimal products, portable phi p.
    */
  private val q393_cochran_armitage: Q = (
    (s, dir) => graft.ops.RankStats.cochranArmitage(
      read(s, dir, "lineitem"),
      group = col("l_linenumber"),
      success = col("l_returnflag") === "R"),
    Some(s"""WITH r AS (SELECT CAST(l_linenumber AS BIGINT) AS tt,
                 CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS x
               FROM lineitem WHERE l_linenumber IS NOT NULL
                 AND l_returnflag IS NOT NULL),
             g AS (SELECT tt, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS r FROM r GROUP BY 1),
             ag AS (SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(n) AS BIGINT) AS n,
                 CAST(sum(r) AS BIGINT) AS rr,
                 CAST(sum(CAST(tt AS HUGEINT) * r) AS HUGEINT) AS s1,
                 CAST(sum(CAST(n AS HUGEINT) * tt) AS HUGEINT)
                   AS sn1,
                 CAST(sum(CAST(n AS HUGEINT) * tt * tt) AS HUGEINT)
                   AS sn2
               FROM g),
             cl AS (SELECT k, n, rr,
                 CAST(CAST(n AS HUGEINT) * s1
                   - CAST(rr AS HUGEINT) * sn1 AS DOUBLE) AS num,
                 CAST(CAST(n AS HUGEINT) * sn2 - sn1 * sn1
                   AS DOUBLE) AS fac,
                 CAST(n AS DOUBLE) AS nd, CAST(rr AS DOUBLE) AS rd
               FROM ag),
             zc AS (SELECT k, n, rr,
                 num / sqrt(rd * (nd - rd) * fac / nd) AS z,
                 (rr > 0 AND rr < n AND fac > 0) AS ok FROM cl),
             ph AS (SELECT *, 1.0 / (1.0 + 0.2316419 * abs(z)) AS t
               FROM zc)
        SELECT n, k AS k_groups, rr AS successes,
               CASE WHEN ok THEN round(z, 6) END AS z,
               CASE WHEN ok THEN round($sqlTwoSidedP, 6) END
                 AS p_value
        FROM ph"""))

  /** MANTEL-HAENSZEL pooled odds ratio ([[graft.ops.Experiment
    * .mantelHaenszel]]): does a big order line (qty > 25) raise the
    * return odds AFTER stratifying by ship YEAR — the
    * Simpson's-reversal-proof pooled 2×2 next to q235's crude A/B;
    * per-stratum ratio terms quantized decimal(38,6) before the
    * exact sums, one double close.
    */
  private val q394_mantel_haenszel: Q = (
    (s, dir) => graft.ops.Experiment.mantelHaenszel(
      read(s, dir, "lineitem"),
      stratum = year(col("l_shipdate")),
      exposed = col("l_quantity") > 25,
      outcome = col("l_returnflag") === "R"),
    Some(s"""WITH r AS (SELECT year(l_shipdate) AS s,
                 (l_quantity > 25) AS e,
                 (l_returnflag = 'R') AS o
               FROM lineitem WHERE l_shipdate IS NOT NULL
                 AND l_quantity IS NOT NULL
                 AND l_returnflag IS NOT NULL),
             cells AS (SELECT s,
                 CAST(sum(CASE WHEN e AND o THEN 1 ELSE 0 END)
                   AS BIGINT) AS a,
                 CAST(sum(CASE WHEN e AND NOT o THEN 1 ELSE 0 END)
                   AS BIGINT) AS b,
                 CAST(sum(CASE WHEN NOT e AND o THEN 1 ELSE 0 END)
                   AS BIGINT) AS c,
                 CAST(sum(CASE WHEN NOT e AND NOT o THEN 1 ELSE 0
                   END) AS BIGINT) AS d
               FROM r GROUP BY 1),
             ag AS (SELECT CAST(count(*) AS BIGINT) AS n_strata,
                 CAST(sum(a + b + c + d) AS BIGINT) AS n,
                 CAST(sum(a) AS BIGINT) AS a_total,
                 sum(CAST(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
                   / CAST(a + b + c + d AS DOUBLE)
                   AS DECIMAL(38,6))) AS ad,
                 sum(CAST(CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
                   / CAST(a + b + c + d AS DOUBLE)
                   AS DECIMAL(38,6))) AS bc,
                 sum(CAST(CAST(a + b AS DOUBLE)
                   * CAST(a + c AS DOUBLE)
                   / CAST(a + b + c + d AS DOUBLE)
                   AS DECIMAL(38,6))) AS ee,
                 sum(CAST(CAST(a + b AS DOUBLE)
                   * CAST(c + d AS DOUBLE) * CAST(a + c AS DOUBLE)
                   * CAST(b + d AS DOUBLE)
                   / (CAST(a + b + c + d AS DOUBLE)
                     * CAST(a + b + c + d AS DOUBLE)
                     * (CAST(a + b + c + d AS DOUBLE) - 1.0))
                   AS DECIMAL(38,6))) AS v
               FROM cells),
             cl AS (SELECT n_strata, n, a_total,
                 CAST(ad AS DOUBLE) / CAST(bc AS DOUBLE) AS or_mh,
                 (CAST(a_total AS DOUBLE) - CAST(ee AS DOUBLE))
                   * (CAST(a_total AS DOUBLE) - CAST(ee AS DOUBLE))
                   / CAST(v AS DOUBLE) AS chi2,
                 CAST(bc AS DOUBLE) > 0.0 AS okr,
                 CAST(v AS DOUBLE) > 0.0 AS okv
               FROM ag),
             zc AS (SELECT *, sqrt(chi2) AS z FROM cl),
             ph AS (SELECT *, 1.0 / (1.0 + 0.2316419 * abs(z)) AS t
               FROM zc)
        SELECT n_strata, n, a_total,
               CASE WHEN okr THEN round(or_mh, 6) END AS or_mh,
               CASE WHEN okv THEN round(chi2, 6) END AS chi2_mh,
               CASE WHEN okv THEN round($sqlTwoSidedP, 6) END
                 AS p_value
        FROM ph"""))

  /** The progressive-MH oracle SQL (shared by q395 batch and q396
    * stream — the q392 convention: the stream's oracle IS the batch
    * form's SQL): per-(stratum, bucket) cell increments, cumulative
    * cells over the dense strata × buckets grid, then q394's pooled
    * close per bucket over strata with cumulative n ≥ 2.
    */
  private def mhProgressiveSql(extraFilter: String): String =
    s"""WITH r AS (SELECT l_orderkey % 8 AS bid,
                 year(l_shipdate) AS s,
                 (l_quantity > 25) AS e,
                 (l_returnflag = 'R') AS o
               FROM lineitem WHERE l_orderkey IS NOT NULL
                 AND l_shipdate IS NOT NULL
                 AND l_quantity IS NOT NULL
                 AND l_returnflag IS NOT NULL$extraFilter),
             inc AS (SELECT s, bid,
                 CAST(sum(CASE WHEN e AND o THEN 1 ELSE 0 END)
                   AS BIGINT) AS ia,
                 CAST(sum(CASE WHEN e AND NOT o THEN 1 ELSE 0 END)
                   AS BIGINT) AS ib,
                 CAST(sum(CASE WHEN NOT e AND o THEN 1 ELSE 0 END)
                   AS BIGINT) AS ic,
                 CAST(sum(CASE WHEN NOT e AND NOT o THEN 1 ELSE 0
                   END) AS BIGINT) AS idd
               FROM r GROUP BY 1, 2),
             grid AS (SELECT st.s, bk.bid
               FROM (SELECT DISTINCT s FROM inc) st
               CROSS JOIN (SELECT DISTINCT bid FROM inc) bk),
             cum AS (SELECT g.s, g.bid,
                 CAST(sum(coalesce(ia, 0)) OVER w AS BIGINT) AS a,
                 CAST(sum(coalesce(ib, 0)) OVER w AS BIGINT) AS b,
                 CAST(sum(coalesce(ic, 0)) OVER w AS BIGINT) AS c,
                 CAST(sum(coalesce(idd, 0)) OVER w AS BIGINT) AS d
               FROM grid g LEFT JOIN inc USING (s, bid)
               WINDOW w AS (PARTITION BY g.s ORDER BY g.bid
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             pooled AS (SELECT * FROM cum
               WHERE a + b + c + d >= 2),
             ag AS (SELECT bid AS batch_id,
                 CAST(count(*) AS BIGINT) AS n_strata,
                 CAST(sum(a + b + c + d) AS BIGINT) AS n,
                 CAST(sum(a) AS BIGINT) AS a_total,
                 sum(CAST(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
                   / CAST(a + b + c + d AS DOUBLE)
                   AS DECIMAL(38,6))) AS ad,
                 sum(CAST(CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
                   / CAST(a + b + c + d AS DOUBLE)
                   AS DECIMAL(38,6))) AS bc,
                 sum(CAST(CAST(a + b AS DOUBLE)
                   * CAST(a + c AS DOUBLE)
                   / CAST(a + b + c + d AS DOUBLE)
                   AS DECIMAL(38,6))) AS ee,
                 sum(CAST(CAST(a + b AS DOUBLE)
                   * CAST(c + d AS DOUBLE) * CAST(a + c AS DOUBLE)
                   * CAST(b + d AS DOUBLE)
                   / (CAST(a + b + c + d AS DOUBLE)
                     * CAST(a + b + c + d AS DOUBLE)
                     * (CAST(a + b + c + d AS DOUBLE) - 1.0))
                   AS DECIMAL(38,6))) AS v
               FROM pooled GROUP BY 1),
             cl AS (SELECT batch_id, n_strata, n, a_total,
                 CAST(ad AS DOUBLE) / CAST(bc AS DOUBLE) AS or_mh,
                 (CAST(a_total AS DOUBLE) - CAST(ee AS DOUBLE))
                   * (CAST(a_total AS DOUBLE) - CAST(ee AS DOUBLE))
                   / CAST(v AS DOUBLE) AS chi2,
                 CAST(bc AS DOUBLE) > 0.0 AS okr,
                 CAST(v AS DOUBLE) > 0.0 AS okv
               FROM ag),
             zc AS (SELECT *, sqrt(chi2) AS z FROM cl),
             ph AS (SELECT *, 1.0 / (1.0 + 0.2316419 * abs(z)) AS t
               FROM zc)
        SELECT batch_id, n_strata, n, a_total,
               CASE WHEN okr THEN round(or_mh, 6) END AS or_mh,
               CASE WHEN okv THEN round(chi2, 6) END AS chi2_mh,
               CASE WHEN okv THEN round($sqlTwoSidedP, 6) END
                 AS p_value
        FROM ph ORDER BY batch_id"""

  /** PROGRESSIVE MANTEL-HAENSZEL ([[graft.ops.Experiment
    * .mantelHaenszelProgressive]]): q394's stratified big-line /
    * return-odds question re-asked at every ingest epoch
    * (l_orderkey mod 8 as the epoch) over the cumulative cells —
    * the convergence readout a long-running stratified A/B ships
    * with. All cumulative work runs on the bounded strata × epochs
    * grid; one data exchange.
    */
  private val q395_mh_progressive: Q = (
    (s, dir) => graft.ops.Experiment.mantelHaenszelProgressive(
      read(s, dir, "lineitem"),
      bucket = col("l_orderkey") % 8,
      stratum = year(col("l_shipdate")),
      exposed = col("l_quantity") > 25,
      outcome = col("l_returnflag") === "R"),
    Some(mhProgressiveSql("")))

  /** STREAMING MANTEL-HAENSZEL ([[graft.streaming.MhStream
    * .mhStream]]): the q395 readout through the ingest-time
    * cell-table fold (subjects thinned to l_orderkey mod 13 — the
    * q392 convention for single-group fold entries), stream ==
    * batch bit-for-bit under order-respecting slicings
    * (StreamingMhSpec), so the oracle is the progressive form's SQL
    * with the same thinning.
    */
  private val q396_mh_stream: Q = (
    (s, dir) => graft.streaming.MhStream.mhStream(
      read(s, dir, "lineitem")
        .where(col("l_orderkey") % 13 === 0)
        .select((col("l_orderkey") % 8).as("bid"),
          year(col("l_shipdate")).as("s"),
          (col("l_quantity") > 25).as("e"),
          (col("l_returnflag") === "R").as("o")),
      "bid", "s", "e", "o")
      .toDF()
      .orderBy(col("batch_id")),
    Some(mhProgressiveSql(" AND l_orderkey % 13 = 0")))

  /** KRIPPENDORFF'S ALPHA ([[graft.ops.Eval.krippendorffAlpha]]):
    * each order as a unit, its lineitem return flags as the rater
    * panel (variable panel width, 1..17) — the multi-annotator
    * agreement audit Cohen's kappa (q360) can't express. Per-unit
    * disagreement made integer-exact by the lcm(1..16)=720720
    * lattice; only the final ppm quantizations touch doubles.
    */
  private val q366_krippendorff: Q = (
    (s, dir) => graft.ops.Eval.krippendorffAlpha(
      read(s, dir, "lineitem"),
      unit = col("l_orderkey"), value = col("l_returnflag"),
      maxRaters = 17),
    Some("""WITH r AS (SELECT CAST(l_orderkey AS VARCHAR) AS u,
                 l_returnflag AS v
               FROM lineitem
               WHERE l_orderkey IS NOT NULL
                 AND l_returnflag IS NOT NULL),
             cells AS (SELECT u, v, count(*) AS c FROM r
               GROUP BY 1, 2),
             units AS (SELECT u, sum(c) AS m, sum(c * c) AS ss
               FROM cells GROUP BY 1 HAVING sum(c) >= 2),
             obs AS (SELECT count(*) AS n_units,
                 CAST(sum(m) AS HUGEINT) AS n,
                 CAST(sum((m * m - ss) * (720720 // (m - 1)))
                   AS HUGEINT) AS aL
               FROM units),
             pooled AS (SELECT CAST(sum(nc * nc) AS HUGEINT) AS s2
               FROM (SELECT v, sum(c) AS nc
                     FROM cells JOIN units USING (u) GROUP BY 1))
        SELECT n_units, CAST(n AS BIGINT) AS n_ratings,
               CAST(floor(CAST(aL AS DOUBLE)
                 / CAST(720720 * n AS DOUBLE) * 1e6 + 0.5)
                 AS BIGINT) AS do_ppm,
               CAST(floor(CAST(n * n - s2 AS DOUBLE)
                 / CAST(n * (n - 1) AS DOUBLE) * 1e6 + 0.5)
                 AS BIGINT) AS de_ppm,
               CAST(floor((1.0 - CAST(aL * (n - 1) AS DOUBLE)
                 / CAST(720720 * (n * n - s2) AS DOUBLE)) * 1e6
                 + 0.5) AS BIGINT) AS alpha_ppm
        FROM obs CROSS JOIN pooled"""))

  /** BROWN–FORSYTHE variance-homogeneity test ([[graft.ops
    * .RankStats.brownForsythe]]): order totals (hundreds lattice,
    * the q307 grid) across the five priority classes — the robust
    * Levene precondition check before any pooled-variance ANOVA on
    * the same slicing. Group medians are exact census picks; the F
    * ratio follows the kruskalWallis fixed-double-order discipline.
    */
  private val q368_brown_forsythe: Q = (
    (s, dir) => graft.ops.RankStats.brownForsythe(
      read(s, dir, "orders"),
      group = col("o_orderpriority"),
      value = round(col("o_totalprice"), -2)),
    Some("""WITH r AS (SELECT o_orderpriority AS grp,
                 CAST(round(o_totalprice, -2) AS BIGINT) AS v
               FROM orders
               WHERE o_orderpriority IS NOT NULL
                 AND o_totalprice IS NOT NULL),
             census AS (SELECT grp, v, count(*) AS c FROM r
               GROUP BY 1, 2),
             ng AS (SELECT grp, sum(c) AS ng FROM census GROUP BY 1),
             cum AS (SELECT grp, v, c, sum(c) OVER (PARTITION BY grp
                 ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum
               FROM census),
             med AS (SELECT grp, min(v) AS med
               FROM cum JOIN ng USING (grp)
               WHERE cum >= (ng + 1) // 2 GROUP BY 1),
             dev AS (SELECT census.grp AS grp, c, med,
                 abs(v - med) AS z
               FROM census JOIN med ON census.grp = med.grp),
             pg AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n,
                 min(med) AS median,
                 CAST(sum(CAST(c AS HUGEINT) * z) AS HUGEINT) AS s1,
                 CAST(sum(CAST(c AS HUGEINT) * z * z) AS HUGEINT)
                   AS s2
               FROM dev GROUP BY 1),
             tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
                 CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(s1) AS HUGEINT) AS ss1 FROM pg),
             terms AS (SELECT
                 CAST(sum(CAST(CAST(n AS DOUBLE) *
                   (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
                     - CAST(ss1 AS DOUBLE) / CAST(nn AS DOUBLE)) *
                   (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
                     - CAST(ss1 AS DOUBLE) / CAST(nn AS DOUBLE))
                   AS DECIMAL(38,6))) AS DOUBLE) AS bt,
                 CAST(sum(CAST(CAST(s2 AS DOUBLE)
                   - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                     / CAST(n AS DOUBLE)
                   AS DECIMAL(38,6))) AS DOUBLE) AS wi,
                 CAST(min(nn) AS BIGINT) AS nn,
                 CAST(min(k) AS BIGINT) AS k
               FROM pg CROSS JOIN tot),
             verdict AS (SELECT
                 round(CAST(nn - k AS DOUBLE)
                   / CAST(k - 1 AS DOUBLE) * bt / wi, 6) AS f_stat,
                 k - 1 AS df1, nn - k AS df2
               FROM terms)
        SELECT grp, n, median,
               round(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 6)
                 AS mean_dev,
               f_stat, df1, df2
        FROM pg CROSS JOIN verdict ORDER BY grp"""))

  /** FRIEDMAN repeated-measures rank test ([[graft.ops.RankStats
    * .friedman]]): orders carrying line positions 1..4 exactly once
    * are the complete blocks, line position the treatment, extended
    * price the response — "does position within an order shift
    * price?" asked block-wise so per-order scale cancels. Ranks on
    * the exact 2·rank lattice; tie-corrected chi-square.
    */
  private val q369_friedman: Q = (
    (s, dir) => {
      val li = read(s, dir, "lineitem")
        .where(col("l_linenumber").between(1, 4))
      val elig = li.groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(count(lit(1)).as("__c"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("__k"), max(col("__c")).as("__m"))
        .where(col("__k") === 4 && col("__m") === 1)
        .select(col("l_orderkey"))
      graft.ops.RankStats.friedman(
        li.join(elig, Seq("l_orderkey")),
        block = col("l_orderkey"), treatment = col("l_linenumber"),
        value = col("l_extendedprice"))
    },
    Some("""WITH elig AS (SELECT l_orderkey FROM (
                 SELECT l_orderkey, l_linenumber, count(*) AS c
                 FROM lineitem WHERE l_linenumber BETWEEN 1 AND 4
                 GROUP BY 1, 2)
               GROUP BY 1 HAVING count(*) = 4 AND max(c) = 1),
             r AS (SELECT CAST(l.l_orderkey AS VARCHAR) AS b,
                 CAST(l_linenumber AS VARCHAR) AS t,
                 l_extendedprice AS v
               FROM lineitem l JOIN elig USING (l_orderkey)
               WHERE l_linenumber BETWEEN 1 AND 4
                 AND l_extendedprice IS NOT NULL),
             rk AS (SELECT b, t,
                 2 * rank() OVER (PARTITION BY b ORDER BY v)
                   + count(*) OVER (PARTITION BY b, v) - 1 AS r2
               FROM r),
             pt AS (SELECT t, CAST(count(*) AS BIGINT) AS n_blocks,
                 CAST(sum(CAST(r2 AS DECIMAL(38,0))) AS HUGEINT)
                   AS r2sum
               FROM rk GROUP BY 1),
             ties AS (SELECT CAST(sum(CAST(c AS HUGEINT) * c * c - c)
                   AS DOUBLE) AS tt
               FROM (SELECT b, v, count(*) AS c FROM r GROUP BY 1, 2)),
             kk AS (SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(min(n_blocks) AS BIGINT) AS n FROM pt),
             ss AS (SELECT CAST(sum(CAST(
                   CAST(r2sum AS DOUBLE) * CAST(r2sum AS DOUBLE) / 4.0
                   AS DECIMAL(38,6))) AS DOUBLE) AS rsq FROM pt),
             verdict AS (SELECT
                 round(12.0 / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE)
                     * (CAST(k AS DOUBLE) + 1.0)) * rsq
                   - 3.0 * CAST(n AS DOUBLE)
                     * (CAST(k AS DOUBLE) + 1.0), 6) AS chi2,
                 round((12.0 / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE)
                     * (CAST(k AS DOUBLE) + 1.0)) * rsq
                   - 3.0 * CAST(n AS DOUBLE)
                     * (CAST(k AS DOUBLE) + 1.0))
                   / (1.0 - tt / (CAST(n AS DOUBLE)
                     * CAST(k AS DOUBLE)
                     * (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0))),
                   6) AS chi2_adj,
                 k - 1 AS df
               FROM kk CROSS JOIN ss CROSS JOIN ties)
        SELECT t AS treatment, n_blocks,
               round(CAST(r2sum AS DOUBLE) / 2.0, 1) AS rank_sum,
               round(CAST(r2sum AS DOUBLE)
                 / (2.0 * CAST(n_blocks AS DOUBLE)), 6) AS mean_rank,
               chi2, chi2_adj, df
        FROM pt CROSS JOIN verdict ORDER BY treatment"""))

  /** MEAN-AVERAGE-PRECISION companion to q312 ([[graft.ops.Eval
    * .averagePrecisionAtK]]): the SAME candidate fixture (segments
    * as queries, rounded balances as scores, the 7/3 modulus
    * relevance), but scored by AP@10 — the order-sensitive metric
    * the q312 set misses. Exact lcm(1..10) lattice, integer ppm.
    */
  private val q370_map_at_k: Q = (
    (s, dir) => graft.ops.Eval.averagePrecisionAtK(
      read(s, dir, "customer"),
      query = col("c_mktsegment"), doc = col("c_custkey"),
      score = round(col("c_acctbal"), 0).cast("long"),
      gain = when(col("c_custkey") % 7 === 0, 2L)
        .when(col("c_custkey") % 3 === 0, 1L).otherwise(0L),
      k = 10),
    Some("""WITH cand AS (SELECT c_mktsegment AS query,
                 c_custkey AS d,
                 CAST(round(c_acctbal, 0) AS BIGINT) AS s,
                 CASE WHEN c_custkey % 7 = 0 THEN 2
                      WHEN c_custkey % 3 = 0 THEN 1 ELSE 0 END AS g
               FROM customer),
             r AS (SELECT *, row_number() OVER (PARTITION BY query
                 ORDER BY s DESC, d ASC) AS rr FROM cand),
             h AS (SELECT *, sum(CASE WHEN g > 0 THEN 1 ELSE 0 END)
                 OVER (PARTITION BY query ORDER BY rr
                   ROWS UNBOUNDED PRECEDING) AS hits FROM r),
             t AS (SELECT query, count(*) AS n_candidates,
                 CAST(sum(CASE WHEN g > 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_relevant,
                 CAST(sum(CASE WHEN rr <= 10 AND g > 0
                   THEN (2520 // rr) * hits ELSE 0 END)
                   AS BIGINT) AS apnum
               FROM h GROUP BY 1)
        SELECT query, n_candidates, n_relevant,
               CASE WHEN n_relevant = 0 THEN 0
                 ELSE apnum * 1000000 //
                   (2520 * least(n_relevant, 10)) END AS ap_ppm
        FROM t ORDER BY query"""))

  /** The complete-blocks fixture shared by q369/q372/q373: orders
    * carrying line positions 1..4 exactly once each.
    */
  private def eligibleBlocks(s: org.apache.spark.sql.SparkSession,
      dir: String) = {
    val li = read(s, dir, "lineitem")
      .where(col("l_linenumber").between(1, 4))
    val elig = li.groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("__k"), max(col("__c")).as("__m"))
      .where(col("__k") === 4 && col("__m") === 1)
      .select(col("l_orderkey"))
    li.join(elig, Seq("l_orderkey"))
  }

  private val eligSql: String =
    """elig AS (SELECT l_orderkey FROM (
         SELECT l_orderkey, l_linenumber, count(*) AS c
         FROM lineitem WHERE l_linenumber BETWEEN 1 AND 4
         GROUP BY 1, 2)
       GROUP BY 1 HAVING count(*) = 4 AND max(c) = 1)"""

  /** COCHRAN'S Q ([[graft.ops.Eval.cochranQ]]): "was the line
    * returned?" as k=4 binary treatments over the complete order
    * blocks — the binary sibling of q369's Friedman and the k-way
    * McNemar (q361). Integer numerator/denominator, one double
    * ratio.
    */
  private val q372_cochran_q: Q = (
    (s, dir) => graft.ops.Eval.cochranQ(
      eligibleBlocks(s, dir),
      block = col("l_orderkey"), treatment = col("l_linenumber"),
      success = col("l_returnflag") === "R"),
    Some(s"""WITH $eligSql,
             r AS (SELECT CAST(l.l_orderkey AS VARCHAR) AS b,
                 CAST(l_linenumber AS VARCHAR) AS t,
                 CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS x
               FROM lineitem l JOIN elig USING (l_orderkey)
               WHERE l_linenumber BETWEEN 1 AND 4
                 AND l_returnflag IS NOT NULL),
             pt AS (SELECT t, CAST(count(*) AS BIGINT) AS n_blocks,
                 CAST(sum(x) AS BIGINT) AS successes
               FROM r GROUP BY 1),
             ca AS (SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(CAST(successes AS HUGEINT)) AS HUGEINT)
                   AS nn,
                 CAST(sum(CAST(successes AS HUGEINT) * successes)
                   AS HUGEINT) AS c2
               FROM pt),
             ra AS (SELECT CAST(sum(CAST(rr AS HUGEINT) * rr)
                   AS HUGEINT) AS r2
               FROM (SELECT b, sum(x) AS rr FROM r GROUP BY 1)),
             v AS (SELECT CASE WHEN k * nn - r2 = 0 THEN NULL
                   ELSE round(CAST(k - 1 AS DOUBLE)
                     * CAST(k * c2 - nn * nn AS DOUBLE)
                     / CAST(k * nn - r2 AS DOUBLE), 6) END AS q_stat,
                 k - 1 AS df
               FROM ca CROSS JOIN ra)
        SELECT t AS treatment, n_blocks, successes, q_stat, df
        FROM pt CROSS JOIN v ORDER BY treatment"""))

  /** JONCKHEERE-TERPSTRA ([[graft.ops.RankStats
    * .jonckheereTerpstra]]): is quantity stochastically increasing
    * across line positions 1..4 — the independent-groups ordered
    * test next to q387's blocked Page; exact decimal 2J from the
    * guarded (group, value) census pairs, one double close,
    * one-sided p.
    */
  private val q389_jonckheere: Q = (
    (s, dir) => graft.ops.RankStats.jonckheereTerpstra(
      read(s, dir, "lineitem")
        .where(col("l_linenumber").between(1, 4)),
      group = col("l_linenumber"), value = col("l_quantity")),
    Some(s"""WITH r AS (SELECT CAST(l_linenumber AS BIGINT) AS g,
                 CAST(l_quantity AS BIGINT) AS v
               FROM lineitem
               WHERE l_linenumber BETWEEN 1 AND 4
                 AND l_quantity IS NOT NULL),
             cells AS (SELECT g, v, count(*) AS c FROM r
               GROUP BY 1, 2),
             j2 AS (SELECT CAST(coalesce(sum(
                   CAST(a.c AS HUGEINT) * b.c
                   * (CASE WHEN a.v < b.v THEN 2
                       WHEN a.v = b.v THEN 1 ELSE 0 END)), 0)
                 AS HUGEINT) AS j2
               FROM cells a JOIN cells b ON a.g < b.g),
             gs AS (SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(n) AS BIGINT) AS nn,
                 CAST(sum(CAST(n AS HUGEINT) * n) AS HUGEINT) AS sn2,
                 CAST(sum(CAST(n AS HUGEINT) * n * (2 * n + 3))
                   AS HUGEINT) AS sn3
               FROM (SELECT g, sum(c) AS n FROM cells GROUP BY 1)),
             zc AS (SELECT nn, k, j2,
                 (CAST(j2 AS DOUBLE)
                   - (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
                     - CAST(sn2 AS DOUBLE)) / 2.0)
                 / (2.0 * sqrt((CAST(nn AS DOUBLE)
                     * CAST(nn AS DOUBLE)
                     * (2.0 * CAST(nn AS DOUBLE) + 3.0)
                     - CAST(sn3 AS DOUBLE)) / 72.0)) AS z
               FROM j2 CROSS JOIN gs),
             ph AS (SELECT nn, k, j2, z,
                 1.0 / (1.0 + 0.2316419 * abs(z)) AS t FROM zc)
        SELECT nn AS n, k AS k_groups, CAST(j2 AS BIGINT) AS j_x2,
               round(z, 6) AS z,
               round(CASE WHEN z >= 0.0 THEN ($sqlTwoSidedP) / 2.0
                 ELSE 1.0 - ($sqlTwoSidedP) / 2.0 END, 6) AS p_value
        FROM ph"""))

  /** GWET'S AC1 ([[graft.ops.Eval.gwetAc1]]): the q379 panel under
    * the prevalence-robust chance term — return flags are heavily
    * imbalanced, exactly where kappa's Σπ² paradox bites; running
    * both puts a number on how much of q379's kappa is prevalence.
    */
  private val q390_gwet_ac1: Q = (
    (s, dir) => graft.ops.Eval.gwetAc1(
      eligibleBlocks(s, dir),
      unit = col("l_orderkey"), category = col("l_returnflag")),
    Some(s"""WITH $eligSql,
             r AS (SELECT CAST(l.l_orderkey AS VARCHAR) AS u,
                 l_returnflag AS v
               FROM lineitem l JOIN elig USING (l_orderkey)
               WHERE l_linenumber BETWEEN 1 AND 4
                 AND l_returnflag IS NOT NULL),
             cells AS (SELECT u, v, count(*) AS c FROM r
               GROUP BY 1, 2),
             un AS (SELECT u, sum(c) AS m, sum(c * c) AS ss
               FROM cells GROUP BY 1),
             ob AS (SELECT CAST(count(*) AS BIGINT) AS nu,
                 CAST(max(m) AS BIGINT) AS mr,
                 CAST(sum(CAST(ss - m AS HUGEINT)) AS HUGEINT) AS a
               FROM un),
             ct AS (SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(CAST(cj AS HUGEINT)) AS HUGEINT) AS ctot,
                 CAST(sum(CAST(cj AS HUGEINT) * cj) AS HUGEINT)
                   AS c2
               FROM (SELECT v, sum(c) AS cj FROM cells GROUP BY 1)),
             dn AS (SELECT nu, mr, k, a,
                 CAST(nu AS HUGEINT) * mr * (mr - 1) AS poden,
                 CAST(nu AS HUGEINT) * mr * ctot - c2 AS penum,
                 CAST(k - 1 AS HUGEINT) * (CAST(nu AS HUGEINT) * mr)
                   * (CAST(nu AS HUGEINT) * mr) AS peden
               FROM ob CROSS JOIN ct)
        SELECT nu AS n_units, mr AS m_raters, k AS k_categories,
               CAST(floor(CAST(a AS DOUBLE) / CAST(poden AS DOUBLE)
                 * 1e6 + 0.5) AS BIGINT) AS po_ppm,
               CASE WHEN k = 1 THEN NULL
                 ELSE CAST(floor(CAST(penum AS DOUBLE)
                   / CAST(peden AS DOUBLE) * 1e6 + 0.5) AS BIGINT)
                 END AS pe_gamma_ppm,
               CASE WHEN k = 1 THEN NULL
                 ELSE CAST(floor(CAST(a * peden - penum * poden
                     AS DOUBLE)
                   / CAST(poden * (peden - penum) AS DOUBLE)
                   * 1e6 + 0.5) AS BIGINT) END AS ac1_ppm
        FROM dn"""))

  /** INTRACLASS CORRELATION ICC(1,1) ([[graft.ops.Eval.icc]]): the
    * four line quantities of each complete order as repeated
    * measurements of the order — how much quantity variance is
    * BETWEEN orders vs within them; the continuous-scale completion
    * of the agreement family (q360/q366/q379/q390 judge categories,
    * q373 asks whether the items cohere, ICC whether the repeats
    * do). Exact decimal sufficient statistics, one fixed-double
    * close replayed verbatim, ppm.
    */
  private val q391_icc: Q = (
    (s, dir) => graft.ops.Eval.icc(
      eligibleBlocks(s, dir),
      unit = col("l_orderkey"),
      score = col("l_quantity").cast("long")),
    Some(s"""WITH $eligSql,
             r AS (SELECT CAST(l.l_orderkey AS VARCHAR) AS u,
                 CAST(l_quantity AS BIGINT) AS x
               FROM lineitem l JOIN elig USING (l_orderkey)
               WHERE l_linenumber BETWEEN 1 AND 4
                 AND l_quantity IS NOT NULL),
             us AS (SELECT u, CAST(count(*) AS BIGINT) AS c,
                 CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS t,
                 CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q
               FROM r GROUP BY 1),
             ag AS (SELECT CAST(count(*) AS BIGINT) AS n_units,
                 CAST(min(c) AS BIGINT) AS k_ratings,
                 CAST(sum(t) AS HUGEINT) AS tt,
                 CAST(sum(t * t) AS HUGEINT) AS a2,
                 CAST(sum(q) AS HUGEINT) AS ss
               FROM us),
             cl AS (SELECT n_units, k_ratings,
                 CAST(n_units AS DOUBLE) AS nd,
                 CAST(k_ratings AS DOUBLE) AS kd,
                 CAST(tt AS DOUBLE) AS td,
                 CAST(a2 AS DOUBLE) AS ad,
                 CAST(ss AS DOUBLE) AS sd
               FROM ag),
             ms AS (SELECT n_units, k_ratings, kd,
                 (ad / kd - td * td / (nd * kd)) / (nd - 1.0) AS msb,
                 (sd - ad / kd) / (nd * (kd - 1.0)) AS msw
               FROM cl)
        SELECT n_units, k_ratings, round(msb, 6) AS msb,
               round(msw, 6) AS msw,
               CASE WHEN msb + (kd - 1.0) * msw = 0 THEN NULL
                 ELSE CAST(floor((msb - msw)
                     / (msb + (kd - 1.0) * msw) * 1e6 + 0.5)
                   AS BIGINT) END AS icc_ppm
        FROM ms"""))

  /** COHEN'S d / HEDGES' g ([[graft.ops.RankStats.effectSize]]):
    * the standardized size of the q308 returned-vs-accepted price
    * gap — at catalog scale every test is "significant"; this is
    * the number that says whether it matters. Same exact-decimal
    * sufficient statistics, one fixed-double close.
    */
  private val q386_effect_size: Q = (
    (s, dir) => graft.ops.RankStats.effectSize(
      read(s, dir, "lineitem"),
      inA = col("l_returnflag") === "R",
      inB = col("l_returnflag") === "A",
      value = col("l_extendedprice")),
    Some("""WITH sums AS (SELECT
                 CAST(sum(CAST(CASE WHEN l_returnflag = 'R'
                     THEN l_extendedprice END AS DECIMAL(25,6)))
                   AS DOUBLE) AS sa,
                 CAST(sum(CAST(CASE WHEN l_returnflag = 'R'
                     THEN l_extendedprice * l_extendedprice END
                   AS DECIMAL(38,10))) AS DOUBLE) AS ssa,
                 CAST(sum(CASE WHEN l_returnflag = 'R'
                     AND l_extendedprice IS NOT NULL THEN 1
                   ELSE 0 END) AS BIGINT) AS na,
                 CAST(sum(CAST(CASE WHEN l_returnflag = 'A'
                     THEN l_extendedprice END AS DECIMAL(25,6)))
                   AS DOUBLE) AS sb,
                 CAST(sum(CAST(CASE WHEN l_returnflag = 'A'
                     THEN l_extendedprice * l_extendedprice END
                   AS DECIMAL(38,10))) AS DOUBLE) AS ssb,
                 CAST(sum(CASE WHEN l_returnflag = 'A'
                     AND l_extendedprice IS NOT NULL THEN 1
                   ELSE 0 END) AS BIGINT) AS nb
               FROM lineitem),
             st AS (SELECT na, nb,
                 sa / CAST(na AS DOUBLE) AS ma,
                 sb / CAST(nb AS DOUBLE) AS mb,
                 ssa - sa * sa / CAST(na AS DOUBLE) AS qa,
                 ssb - sb * sb / CAST(nb AS DOUBLE) AS qb
               FROM sums),
             cl AS (SELECT na, nb, ma, mb,
                 sqrt((qa + qb) / (CAST(na AS DOUBLE)
                   + CAST(nb AS DOUBLE) - 2.0)) AS sp,
                 (ma - mb) / sqrt((qa + qb) / (CAST(na AS DOUBLE)
                   + CAST(nb AS DOUBLE) - 2.0)) AS d,
                 qa + qb > 0.0 AS ok
               FROM st)
        SELECT na AS n_a, nb AS n_b, round(ma, 6) AS mean_a,
               round(mb, 6) AS mean_b,
               CASE WHEN ok THEN round(sp, 6) END AS sd_pooled,
               CASE WHEN ok THEN round(d, 6) END AS cohens_d,
               CASE WHEN ok THEN round(d * (1.0 - 3.0
                 / (4.0 * (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))
                   - 9.0)), 6) END AS hedges_g
        FROM cl"""))

  /** PAGE'S TREND TEST ([[graft.ops.RankStats.pageTrend]]): is
    * there an INCREASING quantity trend across line positions 1..4
    * of complete orders — q369's Friedman asks "any difference",
    * Page asks the ordered question; exact 2-rank lattice L, one
    * fixed-double z, one-sided p.
    */
  private val q387_page_trend: Q = (
    (s, dir) => graft.ops.RankStats.pageTrend(
      eligibleBlocks(s, dir),
      block = col("l_orderkey"), treatment = col("l_linenumber"),
      value = col("l_quantity")),
    Some(s"""WITH $eligSql,
             r AS (SELECT CAST(l.l_orderkey AS VARCHAR) AS b,
                 CAST(l_linenumber AS BIGINT) AS t,
                 CAST(l_quantity AS DOUBLE) AS v
               FROM lineitem l JOIN elig USING (l_orderkey)
               WHERE l_linenumber BETWEEN 1 AND 4
                 AND l_quantity IS NOT NULL),
             rk AS (SELECT b, t,
                 2 * rank() OVER (PARTITION BY b ORDER BY v)
                   + count(*) OVER (PARTITION BY b, v) - 1 AS r2
               FROM r),
             pt AS (SELECT t, CAST(count(*) AS BIGINT) AS n_blocks,
                 CAST(sum(CAST(r2 AS DECIMAL(38,0))) AS HUGEINT)
                   AS r2sum
               FROM rk GROUP BY 1),
             ptp AS (SELECT t, n_blocks, r2sum,
                 CAST(row_number() OVER (ORDER BY t) AS BIGINT)
                   AS position
               FROM pt),
             ag AS (SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(min(n_blocks) AS BIGINT) AS n,
                 CAST(sum(CAST(position AS HUGEINT) * r2sum)
                   AS HUGEINT) AS l2
               FROM ptp),
             zc AS (SELECT l2,
                 (CAST(l2 AS DOUBLE) / 2.0
                   - CAST(n AS DOUBLE) * CAST(k AS DOUBLE)
                     * (CAST(k AS DOUBLE) + 1.0)
                     * (CAST(k AS DOUBLE) + 1.0) / 4.0)
                 / sqrt(CAST(n AS DOUBLE) * CAST(k AS DOUBLE)
                     * CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0)
                     * (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0)
                     / 144.0) AS z
               FROM ag),
             ph AS (SELECT l2, z,
                 1.0 / (1.0 + 0.2316419 * abs(z)) AS t FROM zc),
             verdict AS (SELECT CAST(l2 AS BIGINT) AS l_x2,
                 round(z, 6) AS z,
                 round(CASE WHEN z >= 0.0
                   THEN 1.0 - (1.0 - ($sqlTwoSidedP) / 2.0)
                   ELSE 1.0 - ($sqlTwoSidedP) / 2.0 END, 6)
                   AS p_value
               FROM ph)
        SELECT t AS treatment, position, n_blocks,
               CAST(r2sum AS BIGINT) AS rank_sum_x2,
               l_x2, z, p_value
        FROM ptp CROSS JOIN verdict ORDER BY position"""))

  /** Paired fixture shared by q384/q385: orders whose lines 1 and 2
    * each appear EXACTLY once ((l_orderkey, l_linenumber) is NOT
    * unique in the synthetic lineitem — the TESTDATA gotcha), with
    * both quantities as the pair.
    */
  private def linePairs(s: org.apache.spark.sql.SparkSession,
      dir: String) = {
    val li = read(s, dir, "lineitem")
      .where(col("l_linenumber").isin(1, 2))
    val elig = li.groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("__k"), max(col("__c")).as("__m"))
      .where(col("__k") === 2 && col("__m") === 1)
      .select(col("l_orderkey"))
    val l1 = li.where(col("l_linenumber") === 1)
      .select(col("l_orderkey"),
        col("l_quantity").cast("long").as("qa"))
    val l2 = li.where(col("l_linenumber") === 2)
      .select(col("l_orderkey"),
        col("l_quantity").cast("long").as("qb"))
    l1.join(l2, Seq("l_orderkey")).join(elig, Seq("l_orderkey"))
  }

  private val pairSql: String =
    """pe AS (SELECT l_orderkey FROM (
         SELECT l_orderkey, l_linenumber, count(*) AS c
         FROM lineitem WHERE l_linenumber IN (1, 2)
         GROUP BY 1, 2)
       GROUP BY 1 HAVING count(*) = 2 AND max(c) = 1),
       pr AS (SELECT a.l_orderkey AS id,
           CAST(a.l_quantity AS BIGINT) AS qa,
           CAST(b.l_quantity AS BIGINT) AS qb
         FROM lineitem a
         JOIN lineitem b ON a.l_orderkey = b.l_orderkey
         JOIN pe ON pe.l_orderkey = a.l_orderkey
         WHERE a.l_linenumber = 1 AND b.l_linenumber = 2)"""

  /** WILCOXON SIGNED-RANK ([[graft.ops.RankStats
    * .wilcoxonSignedRank]]): line-1 vs line-2 quantities of two-line
    * orders — the paired location test over the |d| census; exact
    * 2-rank lattice W+, tie-corrected z, portable phi p.
    */
  private val q384_wilcoxon: Q = (
    (s, dir) => {
      val p = linePairs(s, dir)
      graft.ops.RankStats.wilcoxonSignedRank(p, col("qa"), col("qb"))
    },
    Some(s"""WITH $pairSql,
             d AS (SELECT qa - qb AS d FROM pr),
             z0 AS (SELECT CAST(sum(CASE WHEN d = 0 THEN 1 ELSE 0
                 END) AS BIGINT) AS n_zero FROM d),
             cs AS (SELECT abs(d) AS v, count(*) AS c,
                 sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS p
               FROM d WHERE d <> 0 GROUP BY 1),
             rk AS (SELECT v, c, p, sum(c) OVER (ORDER BY v
                 ROWS UNBOUNDED PRECEDING) AS cum FROM cs),
             ag AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                 CAST(sum(CAST(p AS HUGEINT)
                   * (2 * (cum - c) + c + 1)) AS HUGEINT) AS w2,
                 CAST(sum(CAST(c AS HUGEINT) * c * c - c) AS HUGEINT)
                   AS tt
               FROM rk),
             zc AS (SELECT n, w2,
                 (CAST(w2 AS DOUBLE) / 2.0
                   - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
                     / 4.0)
                 / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
                     * (2.0 * CAST(n AS DOUBLE) + 1.0) / 24.0
                   - CAST(tt AS DOUBLE) / 48.0) AS z
               FROM ag),
             ph AS (SELECT n, w2, z,
                 1.0 / (1.0 + 0.2316419 * abs(z)) AS t FROM zc)
        SELECT n AS n_pairs, n_zero, CAST(w2 AS BIGINT) AS w_plus_x2,
               round(z, 6) AS z, round($sqlTwoSidedP, 6) AS p_value
        FROM ph CROSS JOIN z0"""))

  /** PAIRED SIGN-FLIP RANDOMIZATION TEST ([[graft.ops.Experiment
    * .signFlipTest]]): the same line-1/line-2 quantity pairs under
    * 199 hash-seeded sign flips — the assumption-free companion to
    * q384; exact integer permutation sums, exact rank p-value.
    */
  private val q385_sign_flip: Q = (
    (s, dir) => {
      val p = linePairs(s, dir)
      graft.ops.Experiment.signFlipTest(p, col("l_orderkey"),
        col("qa") - col("qb"), nPerms = 199, seed = 42L)
    },
    Some(s"""WITH $pairSql,
             d AS (SELECT id, qa - qb AS d FROM pr),
             ob AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
                 CAST(coalesce(sum(CAST(d AS HUGEINT)), 0)
                   AS HUGEINT) AS obs
               FROM d),
             s AS (SELECT k.k AS k,
                 CAST(sum(CASE WHEN (((id % 1000000007 + 1000000007)
                       % 1000000007) * (2654435761 + 2 * k.k)
                     + 42 + k.k * 1000003) % 1000000007 % 2 = 0
                   THEN CAST(d AS HUGEINT) ELSE -CAST(d AS HUGEINT)
                   END) AS HUGEINT) AS sk
               FROM d CROSS JOIN range(1, 200) k(k) GROUP BY 1),
             tl AS (SELECT CAST(coalesce(sum(CASE WHEN abs(sk) >=
                 abs(obs) THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_ge
               FROM s CROSS JOIN ob)
        SELECT n_pairs, CAST(199 AS BIGINT) AS n_perms,
               CAST(obs AS BIGINT) AS obs_sum, n_ge,
               CAST((1 + n_ge) * 1000000 // 200 AS BIGINT) AS p_ppm
        FROM ob CROSS JOIN tl"""))

  /** BARTLETT'S TEST ([[graft.ops.RankStats.bartlett]]): price
    * variance homogeneity across the three return flags — the
    * parametric sibling of q368's Brown-Forsythe over the same
    * grouping; exact decimal variances, decimal(38,6)-quantized ln
    * terms, one double close.
    */
  private val q383_bartlett: Q = (
    (s, dir) => graft.ops.RankStats.bartlett(
      read(s, dir, "lineitem"),
      group = col("l_returnflag"),
      value = round(col("l_extendedprice"), 0)),
    Some("""WITH r AS (SELECT l_returnflag AS grp,
                 CAST(round(l_extendedprice, 0) AS BIGINT) AS v
               FROM lineitem
               WHERE l_returnflag IS NOT NULL
                 AND l_extendedprice IS NOT NULL),
             pg AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(v AS HUGEINT)) AS HUGEINT) AS s1,
                 CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS s2
               FROM r GROUP BY 1),
             t AS (SELECT grp, n,
                 CAST(n * s2 - s1 * s1 AS DOUBLE)
                   / CAST(n * (n - 1) AS DOUBLE) AS var_g
               FROM pg),
             ag AS (SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(n) AS BIGINT) AS nn,
                 CAST(sum(CAST(CAST(n - 1 AS DOUBLE) * var_g
                   AS DECIMAL(38,6))) AS DOUBLE) AS wsum,
                 CAST(sum(CAST(CAST(n - 1 AS DOUBLE) * ln(var_g)
                   AS DECIMAL(38,4))) AS DOUBLE) AS lsum,
                 CAST(sum(CAST(1.0 / CAST(n - 1 AS DOUBLE)
                   AS DECIMAL(38,6))) AS DOUBLE) AS isum
               FROM t),
             v AS (SELECT round(
                 (CAST(nn - k AS DOUBLE)
                     * ln(wsum / CAST(nn - k AS DOUBLE)) - lsum)
                 / (1.0 + (isum - 1.0 / CAST(nn - k AS DOUBLE))
                     / (3.0 * CAST(k - 1 AS DOUBLE))), 6) AS t_stat,
                 k - 1 AS df
               FROM ag)
        SELECT grp, n, round(var_g, 6) AS var_g, t_stat, df
        FROM t CROSS JOIN v ORDER BY grp"""))

  /** KENDALL'S TAU-B ([[graft.ops.RankStats.kendallTau]]): quantity
    * vs 10k-bucketed price over lineitem — the pairwise-concordance
    * complement to q306's Spearman, computed entirely from the
    * (x,y) contingency census with exact decimal pair products;
    * one sqrt close, tie-corrected on both margins.
    */
  private val q380_kendall_tau: Q = (
    (s, dir) => graft.ops.RankStats.kendallTau(
      read(s, dir, "lineitem"),
      x = col("l_quantity"), y = round(col("l_extendedprice"), -4)),
    Some("""WITH r AS (SELECT CAST(l_quantity AS BIGINT) AS x,
                 CAST(round(l_extendedprice, -4) AS BIGINT) AS y
               FROM lineitem
               WHERE l_quantity IS NOT NULL
                 AND l_extendedprice IS NOT NULL),
             cells AS (SELECT x, y, count(*) AS c FROM r
               GROUP BY 1, 2),
             pg AS (SELECT
                 CAST(coalesce(sum(CASE WHEN a.y < b.y
                     THEN CAST(a.c AS HUGEINT) * b.c END), 0)
                   AS HUGEINT) AS conc,
                 CAST(coalesce(sum(CASE WHEN a.y > b.y
                     THEN CAST(a.c AS HUGEINT) * b.c END), 0)
                   AS HUGEINT) AS disc
               FROM cells a JOIN cells b ON a.x < b.x),
             tx AS (SELECT CAST(sum(CAST(t AS HUGEINT) * (t - 1))
                   AS HUGEINT) AS tx2,
                 CAST(sum(CAST(t AS HUGEINT)) AS HUGEINT) AS n
               FROM (SELECT sum(c) AS t FROM cells GROUP BY x)),
             ty AS (SELECT CAST(sum(CAST(t AS HUGEINT) * (t - 1))
                   AS HUGEINT) AS ty2
               FROM (SELECT sum(c) AS t FROM cells GROUP BY y)),
             nc AS (SELECT count(*) AS n_cells FROM cells)
        SELECT CAST(n AS BIGINT) AS n,
               CAST(n_cells AS BIGINT) AS n_cells,
               CAST(conc AS BIGINT) AS concordant,
               CAST(disc AS BIGINT) AS discordant,
               CASE WHEN n * (n - 1) = tx2 OR n * (n - 1) = ty2
                 THEN NULL
                 ELSE CAST(floor(2.0 * CAST(conc - disc AS DOUBLE)
                   / sqrt(CAST(n * (n - 1) - tx2 AS DOUBLE)
                     * CAST(n * (n - 1) - ty2 AS DOUBLE))
                   * 1e6 + 0.5) AS BIGINT) END AS tau_b_ppm
        FROM pg CROSS JOIN tx CROSS JOIN ty CROSS JOIN nc"""))

  /** FLEISS' KAPPA ([[graft.ops.Eval.fleissKappa]]): each complete
    * 4-line order as a unit rated by an anonymous panel of m=4
    * (the line slots), category = return flag — the fixed-size-
    * panel member of the annotation-QA family (q360 two named
    * raters, q366 variable panels, this one exact-m crowdsourcing
    * panels). All-integer P_o/P_e lattice, three ppm closes.
    */
  private val q379_fleiss: Q = (
    (s, dir) => graft.ops.Eval.fleissKappa(
      eligibleBlocks(s, dir),
      unit = col("l_orderkey"), category = col("l_returnflag")),
    Some(s"""WITH $eligSql,
             r AS (SELECT CAST(l.l_orderkey AS VARCHAR) AS u,
                 l_returnflag AS v
               FROM lineitem l JOIN elig USING (l_orderkey)
               WHERE l_linenumber BETWEEN 1 AND 4
                 AND l_returnflag IS NOT NULL),
             cells AS (SELECT u, v, count(*) AS c FROM r
               GROUP BY 1, 2),
             un AS (SELECT u, sum(c) AS m, sum(c * c) AS ss
               FROM cells GROUP BY 1),
             ob AS (SELECT CAST(count(*) AS BIGINT) AS nu,
                 CAST(max(m) AS BIGINT) AS mr,
                 CAST(sum(CAST(ss - m AS HUGEINT)) AS HUGEINT) AS a
               FROM un),
             ct AS (SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(CAST(cj AS HUGEINT) * cj) AS HUGEINT)
                   AS pe
               FROM (SELECT v, sum(c) AS cj FROM cells GROUP BY 1)),
             dn AS (SELECT nu, mr, k, a, pe,
                 CAST(nu AS HUGEINT) * mr * (mr - 1) AS poden,
                 CAST(nu AS HUGEINT) * nu * mr * mr AS peden
               FROM ob CROSS JOIN ct)
        SELECT nu AS n_units, mr AS m_raters, k AS k_categories,
               CAST(floor(CAST(a AS DOUBLE) / CAST(poden AS DOUBLE)
                 * 1e6 + 0.5) AS BIGINT) AS po_ppm,
               CAST(floor(CAST(pe AS DOUBLE) / CAST(peden AS DOUBLE)
                 * 1e6 + 0.5) AS BIGINT) AS pe_ppm,
               CASE WHEN peden = pe THEN NULL
                 ELSE CAST(floor(CAST(a * peden - pe * poden AS DOUBLE)
                   / CAST(poden * (peden - pe) AS DOUBLE)
                   * 1e6 + 0.5) AS BIGINT) END AS kappa_ppm
        FROM dn"""))

  /** CRONBACH'S ALPHA ([[graft.ops.Eval.cronbachAlpha]]): the four
    * line quantities of each complete order as a 4-item "scale" —
    * the reliability audit before collapsing multi-probe scores
    * into one label. Exact decimal sums, one double ratio, ppm.
    */
  private val q373_cronbach: Q = (
    (s, dir) => graft.ops.Eval.cronbachAlpha(
      eligibleBlocks(s, dir),
      unit = col("l_orderkey"), item = col("l_linenumber"),
      score = col("l_quantity").cast("long")),
    Some(s"""WITH $eligSql,
             r AS (SELECT CAST(l.l_orderkey AS VARCHAR) AS u,
                 CAST(l_linenumber AS VARCHAR) AS i,
                 CAST(l_quantity AS BIGINT) AS x
               FROM lineitem l JOIN elig USING (l_orderkey)
               WHERE l_linenumber BETWEEN 1 AND 4
                 AND l_quantity IS NOT NULL),
             it AS (SELECT i,
                 CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS s1,
                 CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS s2,
                 CAST(count(*) AS BIGINT) AS n
               FROM r GROUP BY 1),
             ia AS (SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(min(n) AS BIGINT) AS n_units,
                 CAST(sum(CAST(n AS HUGEINT) * s2 - s1 * s1)
                   AS HUGEINT) AS a
               FROM it),
             ut AS (SELECT u, sum(x) AS t FROM r GROUP BY 1),
             ua AS (SELECT CAST(count(*) AS HUGEINT)
                 * CAST(sum(CAST(t AS HUGEINT) * t) AS HUGEINT)
                 - CAST(sum(CAST(t AS HUGEINT)) AS HUGEINT)
                   * CAST(sum(CAST(t AS HUGEINT)) AS HUGEINT)
                 AS bden FROM ut)
        SELECT n_units, k AS k_items,
               CAST(floor(CAST(k AS DOUBLE) / CAST(k - 1 AS DOUBLE)
                 * (1.0 - CAST(a AS DOUBLE) / CAST(bden AS DOUBLE))
                 * 1e6 + 0.5) AS BIGINT) AS alpha_ppm
        FROM ia CROSS JOIN ua"""))

  /** POPULATION STABILITY INDEX ([[graft.ops.Eval.psi]]): order
    * totals before vs since 1998 over exact base-decile bins — the
    * model-monitoring drift score (q139's ratio monitor alarms
    * per-bucket; PSI is the one-number read across all bins). Add-½
    * smoothing keeps empty current bins total; cut points from
    * integer rank targets over the value census.
    */
  private val q376_psi: Q = (
    (s, dir) => graft.ops.Eval.psi(
      read(s, dir, "orders"),
      inBase = col("o_orderdate") < lit("1998-01-01").cast("timestamp"),
      value = round(col("o_totalprice"), -2),
      bins = 10),
    Some("""WITH r AS (SELECT
                 (o_orderdate < TIMESTAMP '1998-01-01') AS b,
                 CAST(round(o_totalprice, -2) AS BIGINT) AS v
               FROM orders
               WHERE o_orderdate IS NOT NULL
                 AND o_totalprice IS NOT NULL),
             bc AS (SELECT v, count(*) AS c FROM r WHERE b
               GROUP BY 1),
             cum AS (SELECT v, c, sum(c) OVER (ORDER BY v
                 ROWS UNBOUNDED PRECEDING) AS cum FROM bc),
             nb AS (SELECT sum(c) AS n FROM bc),
             tg AS (SELECT i, (i * n + 9) // 10 AS target
               FROM range(1, 10) t(i), nb),
             ed AS (SELECT i, min(v) AS e FROM tg JOIN cum
               ON cum >= target GROUP BY 1),
             el AS (SELECT list(e ORDER BY i) AS es FROM ed),
             binned AS (SELECT len(list_filter(es, e -> v > e))
                 AS bin, b FROM r CROSS JOIN el),
             g0 AS (SELECT bin,
                 CAST(sum(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT)
                   AS base_n,
                 CAST(sum(CASE WHEN b THEN 0 ELSE 1 END) AS BIGINT)
                   AS cur_n
               FROM binned GROUP BY 1),
             g AS (SELECT CAST(fb.i AS BIGINT) AS bin,
                 coalesce(base_n, 0) AS base_n,
                 coalesce(cur_n, 0) AS cur_n
               FROM range(0, 10) fb(i)
               LEFT JOIN g0 ON g0.bin = fb.i),
             tot AS (SELECT sum(base_n) AS tb, sum(cur_n) AS tc
               FROM g),
             wt AS (SELECT bin, base_n, cur_n,
                 CAST(((CAST(base_n AS DOUBLE) + 0.5)
                     / (CAST(tb AS DOUBLE) + 5.0)
                   - (CAST(cur_n AS DOUBLE) + 0.5)
                     / (CAST(tc AS DOUBLE) + 5.0))
                   * ln(((CAST(base_n AS DOUBLE) + 0.5)
                     / (CAST(tb AS DOUBLE) + 5.0))
                     / ((CAST(cur_n AS DOUBLE) + 0.5)
                       / (CAST(tc AS DOUBLE) + 5.0)))
                   * 1e6 AS DECIMAL(38,6)) AS t6
               FROM g CROSS JOIN tot),
             pa AS (SELECT CAST(floor(CAST(sum(t6) AS DOUBLE) + 0.5)
                 AS BIGINT) AS psi_e6 FROM wt)
        SELECT bin,
               CASE WHEN bin = 0 THEN NULL ELSE es[bin] END AS lo_q,
               base_n, cur_n,
               CAST(floor(CAST(t6 AS DOUBLE) + 0.5) AS BIGINT)
                 AS term_e6,
               psi_e6
        FROM wt CROSS JOIN pa CROSS JOIN el ORDER BY bin"""))

  /** YUEN'S TRIMMED t-TEST ([[graft.ops.RankStats.yuenT]]):
    * returned vs accepted lineitem prices (the q308 comparison)
    * with 20% trimming — the robust read when heavy tails would
    * hand Welch to outliers. Census-exact trimming/winsorizing,
    * one fixed-double close.
    */
  private val q377_yuen: Q = (
    (s, dir) => graft.ops.RankStats.yuenT(
      read(s, dir, "lineitem"),
      inA = col("l_returnflag") === "R",
      value = round(col("l_extendedprice"), 0),
      trimPpm = 200000L),
    Some(s"""WITH r AS (SELECT
                 CASE WHEN l_returnflag = 'R' THEN 'a' ELSE 'b' END
                   AS g,
                 CAST(round(l_extendedprice, 0) AS BIGINT) AS v
               FROM lineitem WHERE l_extendedprice IS NOT NULL),
             census AS (SELECT g, v, count(*) AS c FROM r
               GROUP BY 1, 2),
             cum AS (SELECT g, v, c, sum(c) OVER (PARTITION BY g
                 ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum
               FROM census),
             ng AS (SELECT g, sum(c) AS n,
                 (sum(c) * 200000) // 1000000 AS k
               FROM census GROUP BY 1),
             j AS (SELECT cum.g AS g, v, c, cum, n, k
               FROM cum JOIN ng USING (g)),
             bounds AS (SELECT g,
                 min(CASE WHEN cum >= k + 1 THEN v END) AS vlo,
                 min(CASE WHEN cum >= n - k THEN v END) AS vhi
               FROM j GROUP BY 1),
             pg AS (SELECT g, min(n) AS n, min(k) AS k,
                 CAST(sum(CAST(greatest(0, least(cum, n - k)
                     - greatest(cum - c + 1, k + 1) + 1) AS HUGEINT)
                   * v) AS HUGEINT) AS ts,
                 CAST(sum(CAST(greatest(0, least(cum, n - k)
                     - greatest(cum - c + 1, k + 1) + 1) AS HUGEINT)
                   * v * v) AS HUGEINT) AS tss
               FROM j GROUP BY 1),
             w AS (SELECT pg.g AS g, n, k, n - 2 * k AS h, ts,
                 ts + CAST(k AS HUGEINT) * vlo
                   + CAST(k AS HUGEINT) * vhi AS ws,
                 tss + CAST(k AS HUGEINT) * vlo * vlo
                   + CAST(k AS HUGEINT) * vhi * vhi AS wss
               FROM pg JOIN bounds USING (g)),
             cl AS (SELECT
                 CAST(wa.n AS BIGINT) AS n_a,
                 CAST(wb.n AS BIGINT) AS n_b,
                 CAST(wa.h AS BIGINT) AS h_a,
                 CAST(wb.h AS BIGINT) AS h_b,
                 CAST(wa.ts AS DOUBLE) / CAST(wa.h AS DOUBLE) AS ma,
                 CAST(wb.ts AS DOUBLE) / CAST(wb.h AS DOUBLE) AS mb,
                 (CAST(wa.wss AS DOUBLE) - CAST(wa.ws AS DOUBLE)
                     * CAST(wa.ws AS DOUBLE) / CAST(wa.n AS DOUBLE))
                   / (CAST(wa.h AS DOUBLE)
                     * (CAST(wa.h AS DOUBLE) - 1.0)) AS da,
                 (CAST(wb.wss AS DOUBLE) - CAST(wb.ws AS DOUBLE)
                     * CAST(wb.ws AS DOUBLE) / CAST(wb.n AS DOUBLE))
                   / (CAST(wb.h AS DOUBLE)
                     * (CAST(wb.h AS DOUBLE) - 1.0)) AS db
               FROM (SELECT * FROM w WHERE g = 'a') wa
               CROSS JOIN (SELECT * FROM w WHERE g = 'b') wb),
             zc AS (SELECT *, (ma - mb) / sqrt(da + db) AS z FROM cl),
             ph AS (SELECT *,
                 1.0 / (1.0 + 0.2316419 * abs(z)) AS t FROM zc)
        SELECT n_a, n_b, h_a, h_b,
               round(ma, 6) AS tmean_a, round(mb, 6) AS tmean_b,
               round(z, 6) AS t_stat,
               round((da + db) * (da + db)
                 / (da * da / (CAST(h_a AS DOUBLE) - 1.0)
                   + db * db / (CAST(h_b AS DOUBLE) - 1.0)), 2)
                 AS df_yuen,
               round($sqlTwoSidedP, 6) AS p_value
        FROM ph"""))

  val all: Map[String, Q] = Map(
    "q395_mh_progressive" -> q395_mh_progressive,
    "q396_mh_stream" -> q396_mh_stream,
    "q393_cochran_armitage" -> q393_cochran_armitage,
    "q394_mantel_haenszel" -> q394_mantel_haenszel,
    "q392_elo_stream" -> q392_elo_stream,
    "q391_icc" -> q391_icc,
    "q389_jonckheere" -> q389_jonckheere,
    "q390_gwet_ac1" -> q390_gwet_ac1,
    "q388_elo" -> q388_elo,
    "q386_effect_size" -> q386_effect_size,
    "q387_page_trend" -> q387_page_trend,
    "q384_wilcoxon" -> q384_wilcoxon,
    "q385_sign_flip" -> q385_sign_flip,
    "q383_bartlett" -> q383_bartlett,
    "q380_kendall_tau" -> q380_kendall_tau,
    "q379_fleiss" -> q379_fleiss,
    "q376_psi" -> q376_psi,
    "q377_yuen" -> q377_yuen,
    "q372_cochran_q" -> q372_cochran_q,
    "q373_cronbach" -> q373_cronbach,
    "q370_map_at_k" -> q370_map_at_k,
    "q368_brown_forsythe" -> q368_brown_forsythe,
    "q369_friedman" -> q369_friedman,
    "q365_bradley_terry" -> q365_bradley_terry,
    "q366_krippendorff" -> q366_krippendorff,
    "q364_conformal" -> q364_conformal,
    "q358_irr_bisect" -> q358_irr_bisect,
    "q359_eigen2" -> q359_eigen2,
    "q360_kappa" -> q360_kappa,
    "q361_mcnemar" -> q361_mcnemar,
    "q362_durbin_watson" -> q362_durbin_watson,
    "q356_cvm" -> q356_cvm,
    "q357_capture" -> q357_capture,
    "q352_group_seq" -> q352_group_seq,
    "q346_changepoint" -> q346_changepoint,
    "q347_cum_incidence" -> q347_cum_incidence,
    "q348_kmv_sketch" -> q348_kmv_sketch,
    "q349_kmv_intersect" -> q349_kmv_intersect,
    "q309_cox_fit" -> q309_cox_fit,
    "q310_cox_risk" -> q310_cox_risk,
    "q305_auc" -> q305_auc,
    "q306_spearman" -> q306_spearman,
    "q307_kruskal" -> q307_kruskal,
    "q308_welch" -> q308_welch,
    "q312_retrieval_eval" -> q312_retrieval_eval,
    "q313_scoring_rules" -> q313_scoring_rules,
    "q314_kfold_cv" -> q314_kfold_cv,
    "q315_mutual_info" -> q315_mutual_info,
    "q316_power" -> q316_power,
    "q317_srm" -> q317_srm,
    "q318_t_closeness" -> q318_t_closeness,
    "q320_backtest" -> q320_backtest,
    "q321_confusion" -> q321_confusion,
    "q327_mann_kendall" -> q327_mann_kendall,
    "q333_threshold_sweep" -> q333_threshold_sweep,
    "q334_brier_decomp" -> q334_brier_decomp,
    "q335_wasserstein" -> q335_wasserstein,
    "q343_seasonal_mk" -> q343_seasonal_mk)
}
