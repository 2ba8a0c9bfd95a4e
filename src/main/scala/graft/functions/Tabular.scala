package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tabular-ML feature engineering and monitoring: target encoding,
  * weight-of-evidence binning, calibration tables, population
  * stability — the credit-scoring / GBM-era toolkit, each a closed
  * form over exact grouped sums so encodings and monitoring verdicts
  * replay bit-for-bit across engines.
  */
object Tabular {

  /** SMOOTHED LEAVE-ONE-OUT target encoding (the Kaggle/CatBoost-era
    * standard for high-cardinality categoricals, minus the RNG):
    * enc_i = (sum_cat - y_i + m * prior) / (n_cat - 1 + m), with the
    * global mean as prior — excluding the own row kills the direct
    * leakage path, the m-weighted prior shrinks rare categories.
    * One grouped aggregate + a broadcast join of the category table;
    * sums are exact decimals, the division is one double op (6dp).
    * Rows in singleton categories (n_cat = 1) fall back to the pure
    * prior (the n-1 = 0 edge).
    */
  def targetEncode(df: DataFrame, cat: String, y: Column,
      m: Double = 10.0, out: String = "te"): DataFrame = {
    require(m > 0, s"targetEncode: m $m")
    val perCat = df.groupBy(col(cat))
      .agg(count(lit(1)).as("__nc"), graft.QH.dsum(y).as("__sc"))
    val prior = df.agg((graft.QH.dsum(y) /
      count(lit(1)).cast("double")).as("__prior"))
    df.join(broadcast(perCat), Seq(cat))
      .crossJoin(broadcast(prior))
      .withColumn(out, round(
        when(col("__nc") === 1, col("__prior"))
          .otherwise(
            (col("__sc") - y.cast("double") +
              lit(m) * col("__prior")) /
            ((col("__nc") - 1).cast("double") + lit(m))), 6))
      .drop("__nc", "__sc", "__prior")
  }

  /** WEIGHT OF EVIDENCE + INFORMATION VALUE per category of a binary
    * target (the credit-scoring binning standard):
    * woe = ln( (bad_c/bad_tot) / (good_c/good_tot) ) and
    * IV = Σ (bad% - good%) * woe. Counts exact; each ln evaluates on
    * the same integer ratios in one fixed op order (6dp). Categories
    * with a zero cell get the standard 0.5 Laplace adjustment (an
    * infinite WOE is a data bug, not a feature). IV rides on every
    * row for a one-table read.
    */
  def woeIv(df: DataFrame, cat: String, target: Column): DataFrame = {
    val cells = df.groupBy(col(cat))
      .agg(sum(target.cast("long")).as("bad"),
        sum((lit(1L) - target.cast("long"))).as("good"))
    val tot = cells.agg(sum(col("bad")).as("__bt"),
      sum(col("good")).as("__gt"))
    val adj = (c: Column) =>
      when(c === 0, lit(0.5)).otherwise(c.cast("double"))
    val woeCol = log(
      (adj(col("bad")) / col("__bt").cast("double")) /
        (adj(col("good")) / col("__gt").cast("double")))
    val base = cells.crossJoin(broadcast(tot))
      .withColumn("woe", round(woeCol, 6))
      .withColumn("__iv_term",
        (adj(col("bad")) / col("__bt").cast("double") -
          adj(col("good")) / col("__gt").cast("double")) * woeCol)
    val iv = base.agg(round(sum(col("__iv_term")), 6).as("iv"))
    base.crossJoin(broadcast(iv))
      .select(col(cat), col("bad"), col("good"), col("woe"),
        col("iv"))
  }

  /** CALIBRATION table: bucket a deterministic score into
    * equal-width bins, report predicted-mean vs observed rate per
    * bin — the reliability-diagram data. Bin = floor(score * bins)
    * clamped; all ratios are single double divisions over exact
    * sums (6dp). Feed a q145-style integer scorer through a sigmoid
    * upstream for cross-engine determinism.
    */
  def calibrationBins(df: DataFrame, score: Column, target: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"calibrationBins: $bins")
    df.withColumn("bin",
        least(floor(score * bins), lit(bins - 1)).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        round(sum(score.cast("decimal(25,10)")).cast("double") /
          count(lit(1)).cast("double"), 6).as("mean_score"),
        round(sum(target.cast("long")).cast("double") /
          count(lit(1)).cast("double"), 6).as("obs_rate"))
  }

  /** POPULATION STABILITY INDEX between an expected (training) and
    * an actual (serving) sample, over caller-provided bins:
    * PSI = Σ (a% - e%) * ln(a% / e%). The drift gate tabular model
    * monitoring standardized on; zero cells take the 0.5 adjustment.
    * Counts exact; shares and logs in one fixed op order (6dp).
    */
  def psi(expected: DataFrame, actual: DataFrame,
      bin: Column): DataFrame = {
    val e = expected.groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n_expected"))
    val a = actual.groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n_actual"))
    val joined = e.join(a, Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("n_expected"), lit(0L)).as("n_expected"),
        coalesce(col("n_actual"), lit(0L)).as("n_actual"))
    val tot = joined.agg(sum(col("n_expected")).as("__et"),
      sum(col("n_actual")).as("__at"))
    val adj = (c: Column) =>
      when(c === 0, lit(0.5)).otherwise(c.cast("double"))
    val base = joined.crossJoin(broadcast(tot))
      .withColumn("__term",
        (adj(col("n_actual")) / col("__at").cast("double") -
          adj(col("n_expected")) / col("__et").cast("double")) *
        log((adj(col("n_actual")) / col("__at").cast("double")) /
          (adj(col("n_expected")) / col("__et").cast("double"))))
    val total = base.agg(round(sum(col("__term")), 6).as("psi"))
    base.crossJoin(broadcast(total))
      .select(col("bin"), col("n_expected"), col("n_actual"),
        round(col("__term"), 6).as("psi_term"), col("psi"))
  }

  /** PAIRWISE COVARIANCE / CORRELATION MATRIX in ONE pass — the
    * feature-redundancy report every tabular pipeline opens with.
    * All k sums, k sums-of-squares and k(k-1)/2 cross-sums are
    * EXACT decimal aggregates computed in a single partial-aggregated
    * scan (no per-pair repeat reads — at 100 TB the difference
    * between one pass and k^2/2 passes); the moments then combine in
    * one fixed double operation order (sample covariance,
    * Pearson correlation), rounded 6dp. Rows with a null in ANY of
    * `cols` are dropped first (listwise deletion), so every pair
    * shares the same n. Emits the upper triangle as
    * (f_a, f_b, n, cov, corr).
    */
  def covarianceMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2 && cols.distinct.size == cols.size,
      s"covarianceMatrix: need >= 2 distinct columns, got $cols")
    val clean = df.na.drop(cols)
    def cross(a: String, b: String): Column =
      sum((col(a).cast("double") * col(b).cast("double"))
        .cast("decimal(38,10)")).cast("double")
    val aggs =
      cols.map(c => graft.QH.dsum(col(c)).as(s"__s_$c")) ++
      cols.map(c => graft.QH.dsumsq(col(c)).as(s"__q_$c")) ++
      (for (i <- cols.indices; j <- i + 1 until cols.size)
        yield cross(cols(i), cols(j)).as(s"__x_${i}_$j")) :+
      count(lit(1)).as("__n")
    covCloseFromMoments(clean.agg(aggs.head, aggs.tail: _*), cols)
  }

  /** The shared fixed-operation-order close over one moment row
    * (__s_c, __q_c, __x_i_j doubles + __n) — both the decimal and
    * the quantized-long accumulation paths land here, so their
    * outputs are comparable value-for-value.
    */
  private def covCloseFromMoments(row: DataFrame, cols: Seq[String])
      : DataFrame = {
    val nD = col("__n").cast("double")
    def css(c: String): Column = // centered sum of squares
      col(s"__q_$c") - col(s"__s_$c") * col(s"__s_$c") / nD
    val pairs = for (i <- cols.indices; j <- i + 1 until cols.size)
      yield {
        val (a, b) = (cols(i), cols(j))
        val sxy = col(s"__x_${i}_$j") -
          col(s"__s_$a") * col(s"__s_$b") / nD
        struct(lit(a).as("f_a"), lit(b).as("f_b"),
          round(sxy / (nD - 1.0), 6).as("cov"),
          round(sxy / sqrt(css(a) * css(b)), 6).as("corr"))
      }
    row.select(col("__n").as("n"),
        explode(array(pairs.toSeq: _*)).as("__p"))
      .select(col("__p.f_a").as("f_a"), col("__p.f_b").as("f_b"),
        col("n"), col("__p.cov").as("cov"), col("__p.corr").as("corr"))
  }

  /** [[covarianceMatrix]] with QUANTIZED-LONG accumulation (the r11
    * verdict's ask 3): columns that live on a fixed 1/`scale`
    * decimal grid (money, rates, counts) are scaled to longs and
    * every moment is accumulated as pairs of LONG sums — squares and
    * cross products split into (p >> 31, pmod(p, 2^31)) halves so a
    * per-partition partial NEVER leaves int64 — with only the final
    * per-partition combine (one row per partition) touching
    * decimal(38). The decimal path spends its time in non-compact
    * BigDecimal adds per row (profiled: 3.1s decimal sums vs 0.66s
    * long sums on sf0.1 lineitem); this path keeps whole-stage
    * codegen in pure long arithmetic.
    *
    * EXACTNESS, not margins: the recombined decimal moments equal
    * the decimal path's moments VALUE-FOR-VALUE (integer arithmetic
    * is exact and order-free; the final divide by `scale` is exact
    * in decimal scale 8 >= 2·log10(scale)), so the close emits
    * bit-identical doubles and the q257 oracle is UNCHANGED.
    * In-plan gates (raise_error, no driver action) refuse when the
    * contract would break: a scaled value >= 2^31 (its square would
    * overflow), a partition over 2^31 rows (a split-half partial
    * could overflow), or a column farther than 1e-3 (in grid units)
    * off its grid (the quantization would not be the identity the
    * equality argument needs).
    *
    * Shuffle shape: stage 1 groups by spark_partition_id — a MAP-
    * LOCAL aggregate whose exchange carries one row per input
    * partition; stage 2 is a single-row combine. Grouping by
    * partition id is safe here BECAUSE every partial is an exact
    * integer: any re-slicing recombines to the identical total.
    */
  def covarianceMatrixQuantized(df: DataFrame, cols: Seq[String],
      scale: Long = 100L): DataFrame = {
    require(cols.size >= 2 && cols.distinct.size == cols.size,
      s"covarianceMatrixQuantized: need >= 2 distinct columns")
    require(scale >= 1L && scale <= 10000L,
      s"covarianceMatrixQuantized: scale $scale outside [1, 1e4] — " +
        "the exact-divide argument needs 2·log10(scale) <= 8")
    val M = 2147483648L // 2^31 split base
    val clean = df.na.drop(cols)
    val base = clean.select(
      cols.map(c => round(col(c).cast("double") * scale)
        .cast("long").as(s"__v_$c")) ++
      cols.map(c => abs(col(c).cast("double") * scale -
        round(col(c).cast("double") * scale)).as(s"__e_$c")): _*)
    def v(c: String) = col(s"__v_$c")
    def hi(p: Column) = shiftright(p, 31) // arithmetic = floor-div
    def lo(p: Column) = pmod(p, lit(M))
    val pairIdx = for (i <- cols.indices; j <- i + 1 until cols.size)
      yield (i, j)
    val agg1 = count(lit(1)).as("__c") +:
      (cols.map(c => sum(v(c)).as(s"__s_$c")) ++
       cols.map(c => sum(hi(v(c) * v(c))).as(s"__qh_$c")) ++
       cols.map(c => sum(lo(v(c) * v(c))).as(s"__ql_$c")) ++
       pairIdx.map { case (i, j) =>
         sum(hi(v(cols(i)) * v(cols(j)))).as(s"__xh_${i}_$j") } ++
       pairIdx.map { case (i, j) =>
         sum(lo(v(cols(i)) * v(cols(j)))).as(s"__xl_${i}_$j") } ++
       cols.map(c => max(abs(v(c))).as(s"__m_$c")) ++
       cols.map(c => max(col(s"__e_$c")).as(s"__g_$c")))
    val stage1 = base.groupBy(spark_partition_id().as("__pid"))
      .agg(agg1.head, agg1.tail: _*)
    def dec(c: Column) = c.cast("decimal(38,0)")
    def recombine(h: String, l: String) =
      sum(dec(col(h))) * lit(M) + sum(dec(col(l)))
    val vmaxArgs = lit(0L) +: cols.map(c => max(col(s"__m_$c")))
    val gmaxArgs = lit(0.0) +: cols.map(c => max(col(s"__g_$c")))
    val agg2 = sum(col("__c")).as("__n") +:
      (cols.map(c => sum(dec(col(s"__s_$c"))).as(s"__sd_$c")) ++
       cols.map(c =>
         recombine(s"__qh_$c", s"__ql_$c").as(s"__qd_$c")) ++
       pairIdx.map { case (i, j) =>
         recombine(s"__xh_${i}_$j", s"__xl_${i}_$j")
           .as(s"__xd_${i}_$j") } :+
       greatest(vmaxArgs: _*).as("__vmax") :+
       greatest(gmaxArgs: _*).as("__gmax") :+
       max(col("__c")).as("__cmax"))
    val stage2 = stage1.agg(agg2.head, agg2.tail: _*)
    val gate = when(col("__vmax") >= M ||
        col("__cmax") > lit(M) || col("__gmax") > 1e-3,
      raise_error(concat(
        lit("covarianceMatrixQuantized: contract violated — "),
        lit("max|scaled| "), col("__vmax").cast("string"),
        lit(" (cap 2^31), max partition rows "),
        col("__cmax").cast("string"),
        lit(" (cap 2^31), max grid error "),
        col("__gmax").cast("string"), lit(" (cap 1e-3)"))))
    val sc1 = lit(scale).cast("decimal(7,0)")
    val sc2 = lit(scale * scale).cast("decimal(9,0)")
    val moments = stage2.select(
      (coalesce(gate.cast("long"), col("__n"))).as("__n") +:
      (cols.map(c =>
        (col(s"__sd_$c") / sc1).cast("double").as(s"__s_$c")) ++
       cols.map(c =>
         (col(s"__qd_$c") / sc2).cast("double").as(s"__q_$c")) ++
       pairIdx.map { case (i, j) =>
         (col(s"__xd_${i}_$j") / sc2).cast("double")
           .as(s"__x_${i}_$j") }): _*)
    covCloseFromMoments(moments, cols)
  }

  /** CLOSED-FORM 2x2 EIGENDECOMPOSITION of the sample covariance of
    * two columns — the oracle-replayable twin of the Jacobi PCA
    * solver ([[graft.llmdata.Similarity.pcaFit]], catalog q265):
    * for a symmetric 2x2 [[a b],[b c]] the eigenvalues are
    * (a+c)/2 ± sqrt(((a−c)/2)² + b²) EXACTLY — the same rotation a
    * single Jacobi sweep performs, but as one fixed-order double
    * expression an independent SQL engine replays bit-for-bit
    * (moments via the exact-decimal dsum lattice, one correctly-
    * rounded sqrt, half-up ppm quantization — no iteration, no
    * library pow/atan).
    *
    * Quantization margin: past 2^53 of unscaled sum the
    * decimal→double casts are not bit-identical cross-engine (Spark
    * is correctly rounded, DuckDB casts the int128 then divides — a
    * few-ulp wobble, observed at sf0.1), so every emitted value is
    * BOUNDED: eigenvalue SHARES of the trace and the unit
    * eigenvector components (all in [-1, 1], ppm quantum 1e-6 vs
    * ~1e-13 wobble — safety ~1e7), plus the trace itself on an
    * integer grid (quantum 0.5 vs ~1e-6 wobble — safety ~1e5).
    * Never a ppm of an unbounded magnitude.
    *
    * Emits one row: (n, trace_unit, lam1_share_ppm >= lam2_share_ppm
    * summing to ~1e6, pc1_x_ppm, pc1_y_ppm — the unit principal
    * direction, undefined only for an exactly isotropic input). One
    * partial-aggregated scan, one 1-row close — scale-free.
    */
  def eigen2(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val clean = df.na.drop(Seq(xCol, yCol))
    val x = col(xCol); val y = col(yCol)
    val row = clean.agg(
      graft.QH.dsum(x).as("__sx"), graft.QH.dsum(y).as("__sy"),
      graft.QH.dsumsq(x).as("__qx"), graft.QH.dsumsq(y).as("__qy"),
      sum((x.cast("double") * y.cast("double"))
        .cast("decimal(38,10)")).cast("double").as("__xy"),
      count(lit(1)).as("n"))
    val nD = col("n").cast("double")
    val withCov = row
      .withColumn("__a", (col("__qx") - col("__sx") * col("__sx") /
        nD) / (nD - 1.0))
      .withColumn("__b", (col("__xy") - col("__sx") * col("__sy") /
        nD) / (nD - 1.0))
      .withColumn("__c", (col("__qy") - col("__sy") * col("__sy") /
        nD) / (nD - 1.0))
    val closed = withCov
      .withColumn("__h", (col("__a") - col("__c")) * lit(0.5))
      .withColumn("__m", (col("__a") + col("__c")) * lit(0.5))
      .withColumn("__s", sqrt(col("__h") * col("__h") +
        col("__b") * col("__b")))
      .withColumn("__l1", col("__m") + col("__s"))
      .withColumn("__l2", col("__m") - col("__s"))
    def ppm(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("long")
    val tr = col("__a") + col("__c")
    val ev = col("__l1") - col("__a")
    val nv = sqrt(ev * ev + col("__b") * col("__b"))
    closed.select(col("n"),
      floor(tr + lit(0.5)).cast("long").as("trace_unit"),
      ppm(col("__l1") / tr).as("lam1_share_ppm"),
      ppm(col("__l2") / tr).as("lam2_share_ppm"),
      ppm(col("__b") / nv).as("pc1_x_ppm"),
      ppm(ev / nv).as("pc1_y_ppm"))
  }

  /** ISOTONIC CALIBRATION FIT (PAVA's minimax closed form; Ayer et
    * al. 1955): the weighted monotone regression of per-bin observed
    * rates, fitted_i = max_{j<=i} min_{k>=i} rate(j..k) over pooled
    * intervals — the calibration map isotonic regression is the
    * standard for (Zadrozny & Elkan 2002). Interval rates come from
    * exact prefix sums and quantize by INTEGER floor division to
    * ppm, so the minimax — and therefore every fitted value — is
    * pure int64 arithmetic. Bins are the bounded analysis dimension
    * (guarded): the B³ interval lattice is driver-free relational
    * algebra over O(B²) rows, while data volume enters only the
    * upstream bin aggregate. Input is one row per ordered bin;
    * emits (ord, n, events, obs_ppm, fitted_ppm) with fitted_ppm
    * monotone by construction.
    */
  def isotonicFit(binned: DataFrame, ord: String, events: String,
      n: String, maxBins: Int = 4096): DataFrame = {
    val nb = binned.count()
    require(nb >= 1 && nb <= maxBins,
      s"isotonicFit: $nb bins (max $maxBins) — bins are the bounded" +
        " analysis dimension")
    val W = org.apache.spark.sql.expressions.Window
    val w = W
      .partitionBy(graft.ops.ScanOps.pinnedZero(col("i")))
      .orderBy(col("i"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val p = binned.select(col(ord).cast("long").as("i"),
        col(events).cast("long").as("e"), col(n).cast("long").as("cn"))
      .withColumn("ce", sum(col("e")).over(w))
      .withColumn("cnn", sum(col("cn")).over(w))
    val js = p.select(col("i").as("j"),
      (col("ce") - col("e")).as("ej0"),
      (col("cnn") - col("cn")).as("nj0"))
    val ks = p.select(col("i").as("k"), col("ce").as("ek"),
      col("cnn").as("nk"))
    val iv = js.crossJoin(ks).where(col("j") <= col("k"))
      .select(col("j"), col("k"),
        expr("(ek - ej0) * 1000000 div (nk - nj0)").as("aq"))
    val grid = p.select(col("i"))
    val minK = iv.join(grid,
        iv("j") <= grid("i") && grid("i") <= iv("k"))
      .groupBy(col("i"), col("j")).agg(min(col("aq")).as("mn"))
    val fit = minK.groupBy(col("i")).agg(max(col("mn"))
      .as("fitted_ppm"))
    p.join(fit, Seq("i"))
      .select(col("i").as(ord), col("cn").as(n),
        col("e").as(events),
        expr("e * 1000000 div cn").as("obs_ppm"), col("fitted_ppm"))
  }

  /** 2-D MAHALANOBIS outlier distance — the covariance-aware
    * generalization of a z-score: d² = Δᵀ Σ⁻¹ Δ with the 2×2 sample
    * covariance inverted in CLOSED FORM (no solver, no collect of
    * data — only the five moment sums reach the driver-free
    * broadcast row). Moments are exact decimal sums; means,
    * variances and d² evaluate in one fixed double operation order
    * on every row, so the ranking is engine-reproducible. One
    * aggregate + one broadcast join; flags correlated-pair outliers
    * the per-axis rule (q186) structurally misses. Emits the input
    * keyed rows with d2 (6dp).
    */
  def mahalanobis2d(df: DataFrame, x: Column, y: Column)
      : DataFrame = {
    val m = df.agg(count(lit(1)).as("__n"),
      graft.QH.dsum(x).as("__sx"), graft.QH.dsum(y).as("__sy"),
      graft.QH.dsumsq(x).as("__sxx"), graft.QH.dsumsq(y).as("__syy"),
      sum((x.cast("double") * y.cast("double"))
        .cast("decimal(38,10)")).cast("double").as("__sxy"))
    val nD = col("__n").cast("double")
    val mx = col("__sx") / nD
    val my = col("__sy") / nD
    val vxx = (col("__sxx") - col("__sx") * col("__sx") / nD) /
      (nD - lit(1.0))
    val vyy = (col("__syy") - col("__sy") * col("__sy") / nD) /
      (nD - lit(1.0))
    val vxy = (col("__sxy") - col("__sx") * col("__sy") / nD) /
      (nD - lit(1.0))
    val dx = x.cast("double") - mx
    val dy = y.cast("double") - my
    df.crossJoin(broadcast(m))
      .withColumn("d2", round(
        (dx * dx * vyy - lit(2.0) * dx * dy * vxy + dy * dy * vxx) /
          (vxx * vyy - vxy * vxy), 6))
      .drop("__n", "__sx", "__sy", "__sxx", "__syy", "__sxy")
  }
}
