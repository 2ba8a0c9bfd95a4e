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
                 CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1
                   ELSE 0 END) AS BIGINT) AS na,
                 CAST(sum(CAST(CASE WHEN l_returnflag = 'A'
                     THEN l_extendedprice END AS DECIMAL(25,6)))
                   AS DOUBLE) AS sb,
                 CAST(sum(CAST(CASE WHEN l_returnflag = 'A'
                     THEN l_extendedprice * l_extendedprice END
                   AS DECIMAL(38,10))) AS DOUBLE) AS ssb,
                 CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1
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

  val all: Map[String, Q] = Map(
    "q309_cox_fit" -> q309_cox_fit,
    "q310_cox_risk" -> q310_cox_risk,
    "q305_auc" -> q305_auc,
    "q306_spearman" -> q306_spearman,
    "q307_kruskal" -> q307_kruskal,
    "q308_welch" -> q308_welch)
}
