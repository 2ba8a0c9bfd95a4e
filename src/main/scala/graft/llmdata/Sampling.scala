package graft.llmdata

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reproducible sampling and splitting for training-data pipelines.
  *
  * Everything keys off a PORTABLE integer hash of the row id —
  * `(id * 2654435761 + seed) mod 1e9+7` (Knuth multiplicative step;
  * products stay far under 2^63, so ANSI engines never overflow) —
  * NOT an RNG: membership is a pure function of (id, seed), so
  * samples are stable across runs, engines, partitionings, and
  * re-executions, and any engine (the DuckDB oracle included)
  * reproduces them bit-for-bit. That determinism is what makes a
  * 100 TB pipeline auditable: "which split was this row in" is
  * answerable forever.
  *
  * All operators are one codegen'd projection/filter — no shuffle, no
  * state, fully pushdown-friendly.
  */
object Sampling {

  private val Mult = 2654435761L
  private val Mod = 1000000007L
  private val Buckets = 1000000L

  /** The sampling bucket in [0, 1e6) for an integer id column. */
  def bucket(id: Column, seed: Long): Column =
    pmod(id.cast("long") * Mult + seed, lit(Mod)) % Buckets

  /** The sampling bucket for a STRING key — the group-level (domain /
    * source / URL) variant: the key hashes through the portable
    * char-code polynomial ([[graft.llmdata.Dedup.portableTokenHash]]),
    * then the same multiplicative step as [[bucket]]. Every row with
    * the same key lands in the same bucket, so group-keyed splits are
    * leakage-safe BY CONSTRUCTION: no group straddles a split
    * boundary.
    */
  def bucketBy(key: Column, seed: Long): Column =
    pmod(Dedup.portableTokenHashFast(key) * Mult + seed, lit(Mod)) %
      Buckets

  /** [[assignSplit]] keyed on a string GROUP column: all rows of one
    * group (site, source, author) take the same split — the
    * decontamination-grade train/test split where near-duplicates
    * within a group can never leak across the boundary.
    */
  def assignSplitBy(df: DataFrame, key: Column,
      splits: Seq[(String, Double)], seed: Long = 42L,
      out: String = "split"): DataFrame = {
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split weights must sum to 1")
    val b = bucketBy(key, seed)
    val cuts = splits.scanLeft(0.0)(_ + _._2).tail
      .map(c => (c * Buckets).toLong)
    val expr = splits.zip(cuts).foldLeft(when(lit(false), "")) {
      case (acc, ((name, _), cut)) => acc.when(b < cut, name)
    }.otherwise(splits.last._1)
    df.withColumn(out, expr)
  }

  /** Keep ~`fraction` of rows, deterministically by id hash. */
  def hashSample(df: DataFrame, id: String, fraction: Double,
      seed: Long = 42L): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction")
    df.where(bucket(col(id), seed) < (fraction * Buckets).toLong)
  }

  /** Stratified variant: a fraction PER STRATUM value (unlisted strata
    * are dropped) — class rebalancing / source re-weighting in one
    * filter.
    */
  def stratifiedSample(df: DataFrame, id: String, stratum: Column,
      fractions: Map[String, Double], seed: Long = 42L): DataFrame = {
    val cut = fractions.foldLeft(lit(-1L)) { case (acc, (k, f)) =>
      when(stratum === k, (f * Buckets).toLong).otherwise(acc)
    }
    df.where(bucket(col(id), seed) < cut)
  }

  /** Per-ROW keep probability (importance sampling — quality-weighted
    * corpus thinning): row kept iff its id-hash bucket falls under
    * `weight` (clamped to [0,1]) — the per-row generalization of
    * [[hashSample]]'s constant fraction. Same portable determinism:
    * membership is a pure function of (id, seed, weight expression),
    * reproducible in any engine; one codegen'd filter, no shuffle, no
    * RNG.
    */
  def weightedSample(df: DataFrame, id: String, weight: Column,
      seed: Long = 42L): DataFrame = {
    val w = least(greatest(weight.cast("double"), lit(0.0)), lit(1.0))
    df.where(bucket(col(id), seed) < floor(w * Buckets).cast("long"))
  }

  /** Assign every row to a named split with the given weights (e.g.
    * train/valid/test 0.8/0.1/0.1): one deterministic column, rows
    * never lost or duplicated.
    */
  def assignSplit(df: DataFrame, id: String,
      splits: Seq[(String, Double)], seed: Long = 42L,
      out: String = "split"): DataFrame = {
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split weights must sum to 1")
    val b = bucket(col(id), seed)
    val cuts = splits.scanLeft(0.0)(_ + _._2).tail
      .map(c => (c * Buckets).toLong)
    val expr = splits.zip(cuts).foldLeft(when(lit(false), "")) {
      case (acc, ((name, _), cut)) => acc.when(b < cut, name)
    }.otherwise(splits.last._1) // rounding tail joins the last split
    df.withColumn(out, expr)
  }

  /** Sample down to a TOKEN budget instead of a row fraction — the
    * "give me ~1B tokens of this corpus" cut every training run
    * starts with. Documents are ordered by the portable id hash
    * (an engine-reproducible shuffle), token counts are prefix-summed
    * in that order ([[graft.ops.ScanOps.prefixSums]] — range-bucketed
    * two-pass, integer-exact, no single-partition window), and a
    * document is kept while the running total fits the budget. The
    * same (corpus, seed, budget) always selects the same documents,
    * in any engine, at any partitioning.
    */
  def sampleToTokenBudget(df: DataFrame, id: String, tokens: Column,
      budget: Long, seed: Long = 42L,
      out: String = "cum_tokens"): DataFrame = {
    require(budget > 0, s"budget $budget")
    val withTok = df.withColumn("__tok", tokens.cast("long"))
      .withColumn("__h", pmod(col(id).cast("long") * Mult + seed,
        lit(Mod)))
    graft.ops.ScanOps.prefixSums(withTok, "__h",
        Seq(out -> col("__tok")))
      .where(col(out) <= budget)
      .withColumnRenamed("__tok", "n_tokens")
      .drop("__h")
  }

  /** Temperature-based source mixing (the multilingual-corpus
    * sampler): source s is kept at a rate proportional to
    * count(s)^alpha — alpha = 1 keeps natural proportions, alpha -> 0
    * flattens toward uniform, the standard dial for keeping
    * low-resource sources represented. Given a total row budget
    * `targetRows`, source s's keep-fraction is
    * min(1, (n_s^alpha / sum_t n_t^alpha) * targetRows / n_s),
    * applied as the same portable hash filter as [[hashSample]] —
    * fully deterministic and engine-reproducible. The per-source
    * counts are ONE grouped aggregate collected to the driver
    * (O(#sources), bounded by construction — sources are a curated
    * enum, not data-scale).
    */
  def mixByTemperature(df: DataFrame, id: String, sourceCol: String,
      alpha: Double, targetRows: Long, seed: Long = 42L): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    require(targetRows > 0, s"targetRows $targetRows")
    // contract: null-source rows carry no mixable weight and are
    // dropped (stratifiedSample's fall-through would drop them anyway;
    // filtering up front also keeps the driver-side key map NPE-free)
    val counts = df.where(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol)).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.get(0).toString -> r.getLong(1))
    val sumW = counts.map { case (_, n) => math.pow(n.toDouble, alpha) }.sum
    // round to 9 decimals before bucketing: the weight sum's fp value
    // depends on summation order, which no engine guarantees — the
    // rounding absorbs last-ulp drift so the cutoff is reproducible
    val fractions = counts.map { case (s, n) =>
      s -> BigDecimal(math.min(1.0,
          (math.pow(n.toDouble, alpha) / sumW) * targetRows / n))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    stratifiedSample(df, id, col(sourceCol), fractions, seed)
  }

  /** Mix sources at target sampling rates into one frame, tagging each
    * row's origin — the dataset-mixture step of a training pipeline.
    * Each (source, fraction) pair is hash-sampled independently (with
    * per-source seed offsets so identical ids in different sources
    * make independent choices), then unioned by name.
    */
  def mixByRatio(sources: Seq[(String, DataFrame, Double)], id: String,
      seed: Long = 42L, tag: String = "source"): DataFrame =
    sources.zipWithIndex.map { case ((name, df, f), i) =>
      hashSample(df, id, f, seed + i * 7919L)
        .withColumn(tag, lit(name))
    }.reduce(_ unionByName _)
}
