package graft

import graft.QH._
import graft.functions.Stats
import graft.ml.ModSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.7 (Assess/KS) / §2.12 — model diagnostics and the
  * ModSpec -> MLlib pipeline.
  */
object QueriesML {

  /** In-query model-quality gate (VERDICT r2 task 5): a rows-only ML
    * entry proves nothing if the solver silently degenerates, so the
    * query asserts accuracy against the label before returning its
    * rows. The gated labels below are LEARNABLE from the features
    * (price thresholds, per-priority shifts, an XOR for the net), so
    * the gate sits well above the constant-majority baseline — a
    * broken solver cannot pass it by predicting one class.
    */
  /** Like [[gateAccuracy]], but the check rides the output plan: the
    * accuracy scalar broadcast-joins onto every row and a failing gate
    * raises from inside the predicted column, so the gate costs no
    * separate action and no cache — any consumer that materializes
    * the predictions trips it. (The prediction column itself carries
    * the guard; a consumer that prunes every output column away —
    * count-only — skips it, which the Verify parquet dump never
    * does.)
    */
  private[graft] def gatedPreds(preds: org.apache.spark.sql.DataFrame,
      labelCol: String, predCol: String, minAcc: Double,
      name: String): org.apache.spark.sql.DataFrame = {
    val g = preds.agg(
      avg(when(col(labelCol).cast("double") ===
        col(predCol).cast("double"), 1.0).otherwise(0.0)).as("__acc"))
    preds.crossJoin(broadcast(g))
      .withColumn(predCol,
        when(col("__acc") < minAcc,
          raise_error(concat(
            lit(s"$name: accuracy "), round(col("__acc"), 4),
            lit(s" below quality gate $minAcc — solver degenerated")))
            .cast(preds.schema(predCol).dataType))
          .otherwise(col(predCol)))
      .drop("__acc")
  }

  private def gateAccuracy(preds: org.apache.spark.sql.DataFrame,
      labelCol: String, predCol: String, minAcc: Double,
      name: String): Unit = {
    val row = preds.agg(
      avg(when(col(labelCol).cast("double") ===
        col(predCol).cast("double"), 1.0).otherwise(0.0)).as("acc"),
      avg(col(labelCol).cast("double")).as("pos")).head()
    val acc = row.getDouble(0)
    val base = math.max(row.getDouble(1), 1.0 - row.getDouble(1))
    require(acc >= minAcc,
      f"$name: accuracy $acc%.4f below quality gate $minAcc%.2f " +
        f"(constant-majority baseline $base%.4f) — solver degenerated")
  }

  /** KS statistic between score CDFs of target / non-target
    * (diags.go:110-221). CDFs evaluated at distinct scores (tie-safe),
    * sup-gap exact; one row out. Running counts via
    * ScanOps.prefixSums — range-bucketed, no single-partition window;
    * integer counts keep it bit-identical to the sequential CDF.
    */
  private val q37_ks: Q = (
    (s, dir) => {
      val o = read(s, dir, "orders")
      Stats.ksGaps(o, col("o_totalprice"),
          when(col("o_orderstatus") === "F", 1.0).otherwise(0.0))
        .agg(round(max(col("gap")) * 100.0, 6).as("ks"))
    },
    Some("""WITH d AS (SELECT o_totalprice AS score,
                         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
                       FROM orders),
                 per AS (SELECT score, sum(y) AS n1, sum(1 - y) AS n0
                         FROM d GROUP BY score),
                 tot AS (SELECT sum(y) AS t1, sum(1 - y) AS t0 FROM d),
                 gaps AS (SELECT abs(
                     CAST(sum(n1) OVER w AS DOUBLE) / tot.t1 -
                     CAST(sum(n0) OVER w AS DOUBLE) / tot.t0) AS gap
                   FROM per, tot
                   WINDOW w AS (ORDER BY score ROWS UNBOUNDED PRECEDING))
            SELECT round(max(gap) * 100.0, 6) AS ks FROM gaps"""))

  /** Assess: n / precision / recall / accuracy at a cutoff
    * (diags.go:476-529) — ratios of exact integer counts.
    */
  private val q38_assess: Q = (
    (s, dir) => Stats.assess(read(s, dir, "orders"),
      col("o_totalprice") / 200000.0,
      when(col("o_orderstatus") === "F", 1.0).otherwise(0.0),
      cutoff = 0.75).orderBy(col("n")),
    Some("""SELECT count(*) AS n,
                   CAST(sum(pred * obs) AS DOUBLE) / sum(pred) AS precision,
                   CAST(sum(pred * obs) AS DOUBLE) / sum(obs) AS recall,
                   CAST(sum(CASE WHEN pred = obs THEN 1 ELSE 0 END)
                     AS DOUBLE) / count(*) AS accuracy
            FROM (SELECT CASE WHEN o_totalprice / 200000.0 > 0.75
                           THEN 1 ELSE 0 END AS pred,
                         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
                           AS obs
                  FROM orders)
            ORDER BY n"""))

  /** Decile calibration table (diags.go:231-373): ntile buckets of
    * the score, per-bucket mean score / mean target.
    */
  private val q39_decile: Q = (
    (s, dir) => {
      val c = read(s, dir, "customer")
      // exact ntile from a range-partitioned rank (ScanOps.ntile) —
      // no global ntile window; (acctbal, custkey) is a total order so
      // bucketing is deterministic and oracle-identical
      graft.ops.ScanOps.ntile(c,
          Seq(col("c_acctbal").asc, col("c_custkey").asc), 10, "bucket")
        .groupBy(col("bucket"))
        .agg(davg(col("c_acctbal")).as("mean_score"),
          davg(when(col("c_acctbal") > 0, 1.0).otherwise(0.0))
            .as("mean_target"),
          count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    },
    Some(s"""SELECT bucket, ${sqlDavg("c_acctbal")} AS mean_score,
                    ${sqlDavg("CASE WHEN c_acctbal > 0 THEN 1.0 ELSE 0.0 END")}
                      AS mean_target,
                    count(*) AS n
             FROM (SELECT c_acctbal,
                     ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS bucket
                   FROM customer)
             GROUP BY bucket ORDER BY bucket"""))

  /** ModSpec -> MLlib pipeline fit + predict (modspec.go / nn.go).
    * Logistic regression on continuous + one-hot features; predictions
    * are solver-dependent, so rows-only checked (SURVEY §7.4 risk 6).
    */
  private val q57_ml_predict: Q = (
    (s, dir) => {
      // learnable label (price threshold) so the quality gate below
      // actually separates a working solver from a degenerate one
      val o = read(s, dir, "orders")
        .withColumn("label",
          when(col("o_totalprice") > 150000.0, 1.0).otherwise(0.0))
        .withColumn("price_k", col("o_totalprice") / 1000.0)
      val layers = ModSpec.parse(Seq(
        "Input(price_k + o_orderpriorityoh)",
        "FC(size:1, activation:sigmoid)",
        "Target(label)"))
      val pipeline = ModSpec.toPipeline(layers, classification = true)
      // rows-only check: cap solver work (no native BLAS here; full
      // convergence adds seconds for no correctness value)
      pipeline.getStages.last match {
        case lr: org.apache.spark.ml.classification.LogisticRegression =>
          lr.setMaxIter(12).setRegParam(0.01)
        case _ =>
      }
      // sampled fit, full predict: the solver trains on a DETERMINISTIC
      // 20% hash-sample (Sampling.hashSample — stable across runs and
      // engines), then scores every row. Cache spans the indexer fit
      // and the solver fit; scoring is a broadcast projection, so the
      // quality gate rides the OUTPUT PLAN (raise_error over a
      // broadcast accuracy scalar) instead of paying its own action +
      // a second cache.
      val cached = o.cache()
      // fixed 30k-row budget (not a fraction): fit work must not
      // grow with the corpus — sf1 capture r6
      val trainSet = graft.llmdata.Sampling.hashSample(cached,
        "o_orderkey", math.min(1.0, 30000.0 / cached.count()))
      val model = pipeline.fit(trainSet)
      val preds = model.transform(cached)
        .select(col("o_orderkey"), col("label"), col("prediction"))
      gatedPreds(preds, "label", "prediction", 0.90, "q57_ml_predict")
        .select(col("o_orderkey"), col("prediction"))
        .orderBy(col("o_orderkey"))
    },
    None)

  /** E(f, k) trained-embedding spec end-to-end: the o_orderpriority
    * levels train a 3-dim lookup (Embeddings.fit), which feeds the
    * logistic head. Solver-dependent -> rows-only.
    */
  private val q66_ml_embed: Q = (
    (s, dir) => {
      // per-priority price threshold: the embedding must SEPARATE the
      // levels for the head to learn this, so the accuracy gate also
      // gates embedding quality
      val thr = when(col("o_orderpriority") === "1-URGENT", 100000.0)
        .when(col("o_orderpriority") === "2-HIGH", 140000.0)
        .when(col("o_orderpriority") === "3-MEDIUM", 180000.0)
        .when(col("o_orderpriority") === "4-NOT SPECIFIED", 220000.0)
        .otherwise(260000.0)
      val o = read(s, dir, "orders")
        .withColumn("label",
          when(col("o_totalprice") > thr, 1.0).otherwise(0.0))
        .withColumn("price_k", col("o_totalprice") / 1000.0)
        .cache()
      val layers = ModSpec.parse(Seq(
        "Input(price_k + E(o_orderpriorityoh, 3))",
        "FC(size:1, activation:sigmoid)",
        "Target(label)"))
      // sampled fit (deterministic hash-sample), full predict — same
      // contract as q57. Fixed 30k-row budget, not a fraction: fit
      // cost must not grow with the corpus (sf1 capture r6)
      val trainSet = graft.llmdata.Sampling
        .hashSample(o, "o_orderkey", math.min(1.0, 30000.0 / o.count()))
      val fitted = ModSpec.fitEmbedded(layers, trainSet,
        classification = true, embedMaxIter = 6, mainMaxIter = 12)
      // solver-health gates: the trained lookup must actually separate
      // levels (distinct vectors), and the composed model must beat
      // the gate on the learnable per-priority-threshold label
      fitted.embeddings.foreach { e =>
        val vecs = e.table.values.toSeq
        val spread = (for (a <- vecs; b <- vecs) yield
          math.sqrt(a.zip(b).map { case (x, y) =>
            (x - y) * (x - y) }.sum)).max
        require(spread > 1e-3,
          s"q66_ml_embed: embedding '${e.feature}' collapsed " +
            f"(max pairwise distance $spread%.2e)")
      }
      val preds = fitted.transform(o)
        .select(col("o_orderkey"), col("label"), col("prediction"))
      gatedPreds(preds, "label", "prediction", 0.85, "q66_ml_embed")
        .select(col("o_orderkey"), col("prediction"))
        .orderBy(col("o_orderkey"))
    },
    None)

  /** Native parity trainer: LeakyRelu hidden layer + DropOut + K-1
    * softmax head (the activations MLlib's MLP can't express), sampled
    * fit / full distributed predict. Rows-only: NN weights are not
    * SQL-expressible.
    */
  private val q78_net_native: Q = (
    (s, dir) => {
      // XOR of a price threshold and a priority bit: linearly
      // INSEPARABLE by construction, so passing the gate proves the
      // hidden LeakyRelu layer actually trains (a linear-collapsed or
      // degenerate net tops out near 0.5)
      // price CENTERED on the decision threshold and scaled to ~unit
      // range: raw price_k (0..500) against 0/1 one-hots conditions
      // the SGD so badly the XOR never trains
      val o = read(s, dir, "orders")
        .withColumn("label",
          when((col("o_totalprice") > 150000.0) =!=
            col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
            .otherwise(0))
        .withColumn("price_k",
          (col("o_totalprice") - 150000.0) / 100000.0)
        .cache()
      val layers = ModSpec.parse(Seq(
        "Input(price_k + o_orderpriorityoh)",
        "FC(size:8, activation:LeakyRelu(0.1))",
        "DropOut(.1)",
        "FC(size:2, activation:SoftMax)",
        "Target(label)"))
      // FIXED training budget, not a fraction: the driver-side
      // mini-batch fit is linear in collected rows, so a fractional
      // sample grows the fit with the corpus (sf1 capture: 8.1x at
      // 10x data). 30k rows trains the XOR well past the gate at
      // every scale; scoring still covers the full frame.
      val trainSet = graft.llmdata.Sampling
        .hashSample(o, "o_orderkey", math.min(1.0, 30000.0 / o.count()))
      val m = ModSpec.fitNative(layers, trainSet,
        classification = true, nClasses = 2,
        cfg = graft.ml.Net.Config(batchSize = 128, epochs = 30,
          lrStart = 5e-2, lrEnd = 2e-3))
      val preds = m.transform(o)
        .select(col("o_orderkey"), col("label"),
          col("__predicted_class").as("predicted"))
      gatedPreds(preds, "label", "predicted", 0.80, "q78_net_native")
        .select(col("o_orderkey"), col("predicted"))
        .orderBy(col("o_orderkey"))
    },
    None)

  /** The DISTRIBUTED native fit under the accuracy gate (VERDICT r4
    * task 5): same linearly-inseparable XOR label as q78, but trained
    * via Net.fitDistributed on the FULL frame — no row cap, no driver
    * matrix; each step broadcasts the weight stack and treeAggregates
    * gradient sums (the spec pins distributed == local to 1e-9). The
    * in-plan gate proves the synchronous large-batch path actually
    * learns the nonlinearity, not just that it runs.
    */
  private val q108_net_distributed: Q = (
    (s, dir) => {
      val o = read(s, dir, "orders")
        .withColumn("label",
          when((col("o_totalprice") > 150000.0) =!=
            col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
            .otherwise(0))
        .withColumn("price_k",
          (col("o_totalprice") - 150000.0) / 100000.0)
        .cache()
      val layers = ModSpec.parse(Seq(
        "Input(price_k + o_orderpriorityoh)",
        "FC(size:8, activation:LeakyRelu(0.1))",
        "FC(size:2, activation:SoftMax)",
        "Target(label)"))
      // full-batch steps: epochs = step count for the distributed
      // path; each step is one treeAggregate pass, so the budget is
      // kept tight (60 hot steps converge on this 2-D XOR; the gate
      // catches any regression)
      val m = ModSpec.fitNative(layers, o,
        classification = true, nClasses = 2, distributed = true,
        cfg = graft.ml.Net.Config(epochs = 30,
          lrStart = 2e-1, lrEnd = 2e-2))
      val preds = m.transform(o)
        .select(col("o_orderkey"), col("label"),
          col("__predicted_class").as("predicted"))
      gatedPreds(preds, "label", "predicted", 0.80, "q108_net_distributed")
        .select(col("o_orderkey"), col("predicted"))
        .orderBy(col("o_orderkey"))
    },
    None)

  /** Marginal effects under the oracle (reference diags.go:534-731,
    * [[graft.ml.Diagnostics.marginal]]): a deterministic linear
    * scorer (prediction = 1 + 2*l_quantity + 3*l_linenumber, exact
    * double arithmetic on integer-valued features) segments lineitem
    * into 6 exact ntiles over (prediction, full unique tiebreak),
    * takes per-segment EXACT medians of both features (integer
    * values, so the even-count interpolated midpoint is binary-exact
    * in both engines), sweeps l_quantity across its exact discrete
    * quantiles (Spark approxQuantile at relativeError=0 equals
    * DuckDB's quantile_disc — verified on this table), and
    * re-predicts over the 6x5 grid. Every stage — ntile closed form,
    * exact medians, quantile sweep, grid arithmetic — is replayed by
    * the oracle.
    */
  private val q152_marginal_effects: Q = (
    (s, dir) => {
      val li = read(s, dir, "lineitem")
      val m = new graft.ml.Diagnostics.LinearModel(
        Seq("l_quantity" -> 2.0, "l_linenumber" -> 3.0), 1.0)
      graft.ml.Diagnostics.marginal(m, li,
          Seq("l_quantity", "l_linenumber"), "l_quantity",
          nSeg = 6, sweepPoints = 5,
          tiebreak = Seq(col("l_quantity"), col("l_linenumber"),
            col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
            col("l_extendedprice")),
          exactMedians = true, sweepErr = 0.0)
        .orderBy(col("segment"), col("l_quantity_value"))
    },
    Some("""WITH s AS (SELECT l_quantity, l_linenumber, l_orderkey,
                 l_partkey, l_suppkey, l_extendedprice,
                 1.0 + l_quantity * 2.0 + l_linenumber * 3.0 AS pred
               FROM lineitem),
             seg AS (SELECT l_quantity, l_linenumber,
                 ntile(6) OVER (ORDER BY pred, l_quantity,
                   l_linenumber, l_orderkey, l_partkey, l_suppkey,
                   l_extendedprice) AS segment
               FROM s),
             med AS (SELECT segment,
                 quantile_cont(l_linenumber, 0.5) AS med_ln
               FROM seg GROUP BY segment),
             qs AS (SELECT quantile_disc(l_quantity,
                 [0.0, 0.25, 0.5, 0.75, 1.0]) AS qlist FROM lineitem),
             sw AS (SELECT DISTINCT v FROM
                 (SELECT unnest(qlist) AS v FROM qs))
            SELECT med.segment AS segment, sw.v AS l_quantity_value,
                   1.0 + sw.v * 2.0 + med.med_ln * 3.0 AS prediction
            FROM med, sw
            ORDER BY segment, l_quantity_value"""))

  /** The SCALE path of q152: same linear scorer, same segmentation,
    * but sketch medians (percentile_approx, bounded GK state) and a
    * sketched sweep (relative rank error 1e-4) — the configuration
    * that actually runs at 100 TB, where exact percentile's
    * collect-all-values aggregation state is the one part of q152
    * that grows with data. Rows-only by nature (GK estimates are not
    * engine-replayable), but the sketch is held to its own contract
    * IN-PLAN: each segment median's true rank interval must overlap
    * n*(0.5 ± 0.02) or the query raises (the q130 rank-audit gate),
    * and q152 stays the exact oracle twin pinning the surrounding
    * machinery.
    */
  private val q206_marginal_sketch: Q = (
    (s, dir) => {
      val li = read(s, dir, "lineitem")
      val m = new graft.ml.Diagnostics.LinearModel(
        Seq("l_quantity" -> 2.0, "l_linenumber" -> 3.0), 1.0)
      graft.ml.Diagnostics.marginal(m, li,
          Seq("l_quantity", "l_linenumber"), "l_quantity",
          nSeg = 6, sweepPoints = 5,
          tiebreak = Seq(col("l_quantity"), col("l_linenumber"),
            col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
            col("l_extendedprice")),
          auditRankTol = 0.02)
        .orderBy(col("segment"), col("l_quantity_value"))
    },
    None)

  /** Smoothed leave-one-out target encoding
    * ([[graft.functions.Tabular.targetEncode]]): the high-
    * cardinality categorical encoder with the leakage path removed
    * (own row excluded) and rare categories shrunk to the prior.
    * Exact decimal sums; one double division per row (6dp).
    */
  private val q241_target_encoding: Q = (
    (s, dir) => graft.functions.Tabular.targetEncode(
        read(s, dir, "orders"), "o_orderpriority",
        col("o_totalprice"), m = 10.0)
      .select(col("o_orderkey"), col("o_orderpriority"), col("te"))
      .orderBy(col("o_orderkey")),
    Some(s"""WITH pc AS (SELECT o_orderpriority, count(*) AS nc,
                 ${sqlDsum("o_totalprice")} AS sc
               FROM orders GROUP BY 1),
             pr AS (SELECT ${sqlDsum("o_totalprice")}
                 / CAST(count(*) AS DOUBLE) AS prior FROM orders)
        SELECT o_orderkey, o.o_orderpriority,
               round(CASE WHEN nc = 1 THEN prior
                 ELSE (sc - o_totalprice + 10.0 * prior)
                   / (CAST(nc - 1 AS DOUBLE) + 10.0) END, 6) AS te
        FROM orders o JOIN pc USING (o_orderpriority) CROSS JOIN pr
        ORDER BY o_orderkey"""))

  /** Weight of evidence + information value
    * ([[graft.functions.Tabular.woeIv]]) of the customer segment
    * against high-value orders — the credit-scoring predictive-power
    * read; integer cells, fixed-order ln (6dp), 0.5 Laplace on zero
    * cells.
    */
  private val q242_woe_iv: Q = (
    (s, dir) => graft.functions.Tabular.woeIv(
        read(s, dir, "orders").join(read(s, dir, "customer"),
          col("o_custkey") === col("c_custkey")),
        "c_mktsegment", (col("o_totalprice") > 250000.0).cast("int"))
      .orderBy(col("c_mktsegment")),
    Some("""WITH j AS (SELECT c_mktsegment,
                 CAST(o_totalprice > 250000.0 AS INTEGER) AS t
               FROM orders JOIN customer ON o_custkey = c_custkey),
             cells AS (SELECT c_mktsegment,
                 CAST(sum(t) AS BIGINT) AS bad,
                 CAST(sum(1 - t) AS BIGINT) AS good
               FROM j GROUP BY 1),
             tot AS (SELECT CAST(sum(bad) AS BIGINT) AS bt,
                 CAST(sum(good) AS BIGINT) AS gt FROM cells),
             b AS (SELECT c_mktsegment, bad, good,
                 ln((CASE WHEN bad = 0 THEN 0.5
                      ELSE CAST(bad AS DOUBLE) END
                     / CAST(bt AS DOUBLE))
                   / ((CASE WHEN good = 0 THEN 0.5
                        ELSE CAST(good AS DOUBLE) END)
                     / CAST(gt AS DOUBLE))) AS w,
                 (CASE WHEN bad = 0 THEN 0.5
                    ELSE CAST(bad AS DOUBLE) END / CAST(bt AS DOUBLE)
                  - (CASE WHEN good = 0 THEN 0.5
                      ELSE CAST(good AS DOUBLE) END)
                     / CAST(gt AS DOUBLE)) AS share_gap
               FROM cells CROSS JOIN tot),
             iv AS (SELECT round(sum(share_gap * w), 6) AS iv FROM b)
        SELECT c_mktsegment, bad, good, round(w, 6) AS woe, iv.iv
        FROM b CROSS JOIN iv ORDER BY c_mktsegment"""))

  /** Calibration (reliability) table
    * ([[graft.functions.Tabular.calibrationBins]]): deterministic
    * pseudo-score binned 10-wide, predicted mean vs observed rate
    * per bin — the data behind every calibration plot.
    */
  private val q243_calibration: Q = (
    (s, dir) => graft.functions.Tabular.calibrationBins(
        read(s, dir, "orders"),
        (col("o_custkey") % 97).cast("double") / 97.0,
        col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
        bins = 10)
      .orderBy(col("bin")),
    Some("""WITH s AS (SELECT
                 CAST(o_custkey % 97 AS DOUBLE) / 97.0 AS sc,
                 CAST(o_orderpriority IN ('1-URGENT', '2-HIGH')
                   AS INTEGER) AS t
               FROM orders)
        SELECT CAST(least(floor(sc * 10), 9) AS BIGINT) AS bin,
               count(*) AS n,
               round(CAST(sum(CAST(sc AS DECIMAL(25,10))) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS mean_score,
               round(CAST(sum(t) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS obs_rate
        FROM s GROUP BY 1 ORDER BY bin"""))

  /** ISOTONIC CALIBRATION ([[graft.functions.Tabular.isotonicFit]])
    * over ten score bins with PLANTED monotonicity violations
    * (threshold law 10,20,15,25,30,28,40,50,45,60 per mille-of-100 —
    * bins 2, 5 and 8 dip below their predecessors, so the pool-
    * adjacent machinery demonstrably pools): the minimax closed form
    * in pure integer ppm, fitted rates monotone by construction.
    * The q243 reliability table's corrective sibling.
    */
  private val q290_isotonic: Q = (
    (s, dir) => {
      val o = read(s, dir, "orders")
      val binned = o.select(
          (col("o_custkey") % 10).cast("long").as("bin"),
          ((col("o_custkey") * 7919) % 100 <
            expr("""CASE o_custkey % 10 WHEN 0 THEN 10
              WHEN 1 THEN 20 WHEN 2 THEN 15 WHEN 3 THEN 25
              WHEN 4 THEN 30 WHEN 5 THEN 28 WHEN 6 THEN 40
              WHEN 7 THEN 50 WHEN 8 THEN 45 ELSE 60 END"""))
            .cast("long").as("t"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), sum(col("t")).as("events"))
      graft.functions.Tabular.isotonicFit(binned, "bin", "events",
          "n")
        .orderBy(col("bin"))
    },
    Some("""WITH s AS (SELECT o_custkey % 10 AS bin,
                 CAST((o_custkey * 7919) % 100 <
                   CASE o_custkey % 10 WHEN 0 THEN 10
                     WHEN 1 THEN 20 WHEN 2 THEN 15 WHEN 3 THEN 25
                     WHEN 4 THEN 30 WHEN 5 THEN 28 WHEN 6 THEN 40
                     WHEN 7 THEN 50 WHEN 8 THEN 45 ELSE 60 END
                   AS BIGINT) AS t
               FROM orders),
             b AS (SELECT bin, CAST(count(*) AS BIGINT) AS cn,
                 CAST(sum(t) AS BIGINT) AS e
               FROM s GROUP BY 1),
             p AS (SELECT bin AS i, e, cn,
                 CAST(sum(e) OVER w AS BIGINT) AS ce,
                 CAST(sum(cn) OVER w AS BIGINT) AS cnn
               FROM b
               WINDOW w AS (ORDER BY bin
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             iv AS (SELECT j.i AS j, k.i AS k,
                 (k.ce - (j.ce - j.e)) * 1000000 //
                   (k.cnn - (j.cnn - j.cn)) AS aq
               FROM p j JOIN p k ON j.i <= k.i),
             mk AS (SELECT g.i, iv.j, min(aq) AS mn
               FROM iv JOIN p g ON iv.j <= g.i AND g.i <= iv.k
               GROUP BY 1, 2),
             f AS (SELECT i, CAST(max(mn) AS BIGINT) AS fitted_ppm
               FROM mk GROUP BY 1)
        SELECT p.i AS bin, p.cn AS n, p.e AS events,
               CAST(p.e * 1000000 // p.cn AS BIGINT) AS obs_ppm,
               f.fitted_ppm
        FROM p JOIN f ON p.i = f.i ORDER BY bin"""))

  /** Population stability index
    * ([[graft.functions.Tabular.psi]]) between pre- and post-1999
    * order cohorts over priority bins — the tabular drift gate
    * (the q139 fertility monitor's batch-score sibling).
    */
  private val q244_psi: Q = (
    (s, dir) => {
      val o = read(s, dir, "orders")
      graft.functions.Tabular.psi(
          o.where(year(col("o_orderdate")) < 1999),
          o.where(year(col("o_orderdate")) >= 1999),
          col("o_orderpriority"))
        .orderBy(col("bin"))
    },
    Some("""WITH e AS (SELECT o_orderpriority AS bin,
                 count(*) AS n_expected
               FROM orders WHERE year(o_orderdate) < 1999 GROUP BY 1),
             a AS (SELECT o_orderpriority AS bin,
                 count(*) AS n_actual
               FROM orders WHERE year(o_orderdate) >= 1999
               GROUP BY 1),
             j AS (SELECT COALESCE(e.bin, a.bin) AS bin,
                 COALESCE(n_expected, 0) AS n_expected,
                 COALESCE(n_actual, 0) AS n_actual
               FROM e FULL OUTER JOIN a ON e.bin = a.bin),
             tot AS (SELECT CAST(sum(n_expected) AS BIGINT) AS et,
                 CAST(sum(n_actual) AS BIGINT) AS at FROM j),
             b AS (SELECT bin, n_expected, n_actual,
                 ((CASE WHEN n_actual = 0 THEN 0.5
                     ELSE CAST(n_actual AS DOUBLE) END
                    / CAST(at AS DOUBLE))
                  - (CASE WHEN n_expected = 0 THEN 0.5
                      ELSE CAST(n_expected AS DOUBLE) END
                    / CAST(et AS DOUBLE)))
                 * ln((CASE WHEN n_actual = 0 THEN 0.5
                        ELSE CAST(n_actual AS DOUBLE) END
                       / CAST(at AS DOUBLE))
                      / ((CASE WHEN n_expected = 0 THEN 0.5
                           ELSE CAST(n_expected AS DOUBLE) END)
                        / CAST(et AS DOUBLE))) AS term
               FROM j CROSS JOIN tot),
             p AS (SELECT round(sum(term), 6) AS psi FROM b)
        SELECT bin, CAST(n_expected AS BIGINT) AS n_expected,
               CAST(n_actual AS BIGINT) AS n_actual,
               round(term, 6) AS psi_term, p.psi
        FROM b CROSS JOIN p ORDER BY bin"""))

  val all: Map[String, Q] = Map(
    "q241_target_encoding" -> q241_target_encoding,
    "q242_woe_iv" -> q242_woe_iv,
    "q243_calibration" -> q243_calibration,
    "q290_isotonic" -> q290_isotonic,
    "q244_psi" -> q244_psi,
    "q152_marginal_effects" -> q152_marginal_effects,
    "q206_marginal_sketch" -> q206_marginal_sketch,
    "q37_ks" -> q37_ks,
    "q38_assess" -> q38_assess,
    "q39_decile" -> q39_decile,
    "q57_ml_predict" -> q57_ml_predict,
    "q66_ml_embed" -> q66_ml_embed,
    "q78_net_native" -> q78_net_native,
    "q108_net_distributed" -> q108_net_distributed)
}
