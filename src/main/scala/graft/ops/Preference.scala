package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pairwise-preference models — the aggregation layer under RLHF /
  * preference-tuning data pipelines: billions of (winner, loser)
  * comparisons reduced to a per-item strength table.
  *
  * Reference scope: seafan has no preference layer; this is a
  * training-data-pipeline extension (prompt mandate), same family as
  * the DoReMi mixture learner (llmdata/Sampling.scala) whose
  * scaled-integer trajectory discipline it reuses.
  */
object Preference {

  private val Scale = 1000000L

  /** BRADLEY–TERRY strengths (Bradley & Terry 1952) via the MM
    * algorithm (Hunter 2004, Ann. Statist. 32(1) — the standard
    * minorize-maximize update p_i' = W_i / Σ_j n_ij/(p_i+p_j)),
    * run for a FIXED `steps` iterations in scaled-integer
    * arithmetic so the whole trajectory is exactly replayable by
    * any engine (the q151 DoReMi / q358 bisection discipline):
    *
    *   - strengths live on the 1e-6 lattice (long, init 1.0);
    *   - each MM term n_ij·S²/(p_i+p_j) is one integer floor
    *     division — exact, order-independent to sum;
    *   - the normalize step pins Σp = K·S (mean strength 1.0)
    *     with one more floor division.
    *
    * Distribution shape: the N-row comparison stream is reduced to
    * the K²-sparse win matrix by one hash aggregation (the only
    * data-sized pass); the O(K²·steps) trajectory runs on the
    * collected census, guarded BEFORE the collect by `maxItems`
    * (distinct items, counted distributed) and `maxCells` (the
    * driver-memory budget on collected win-matrix cells — ~100 B a
    * cell, so the 1M default caps the collect near 100 MB; real
    * pairwise data is K·avg-degree sparse, far under K²). Both
    * checks fire on aggregates only — nothing data-sized ever
    * reaches the driver. Numerators overflow long past ~9e6
    * comparisons per cell, so the driver loop is BigInt and the
    * oracle HUGEINT.
    *
    * Items that never win get strength 0 (the MLE boundary); two
    * zero-win items can never share a decisive game, so no MM
    * denominator hits 0 after the uniform first step.
    *
    * Input: one row per decisive comparison. Ties must be dropped
    * by the caller (they carry no Bradley–Terry information).
    * Output: (item, games, wins, strength, score) — strength on the
    * 1e-6 lattice after `steps` updates, score = strength/1e6.
    */
  def bradleyTerry(comparisons: DataFrame, winner: Column, loser: Column,
      steps: Int = 10, maxItems: Int = 4096,
      maxCells: Long = 1000000L): DataFrame = {
    require(steps >= 1, s"bradleyTerry: steps $steps")
    val cmp = comparisons
      .select(winner.cast("string").as("__w"),
        loser.cast("string").as("__l"))
      .where(col("__w").isNotNull && col("__l").isNotNull &&
        col("__w") =!= col("__l"))
    // the one data-sized pass: N comparisons -> K²-sparse win counts
    val dirWins = graft.Caches.pin(
      cmp.groupBy(col("__w").as("i"), col("__l").as("j"))
        .agg(count(lit(1)).as("w")))
    // both census guards run DISTRIBUTED, before anything is
    // collected: item count first (the semantic bound), then the
    // cell count against the driver-memory budget
    val nItems = dirWins.select(col("i").as("x"))
      .union(dirWins.select(col("j").as("x"))).distinct().count()
    require(nItems <= maxItems.toLong,
      s"bradleyTerry: $nItems items > maxItems $maxItems — " +
        "bucket the item space")
    val nCells = dirWins.count()
    require(nCells <= maxCells,
      s"bradleyTerry: $nCells win-matrix cells > maxCells $maxCells " +
        "driver budget — raise maxCells or bucket the item space")
    val g = dirWins.select(col("i"), col("j"), col("w"))
      .join(dirWins.select(col("j").as("i"), col("i").as("j"),
        col("w").as("rev")), Seq("i", "j"), "full_outer")
      .na.fill(0L, Seq("w", "rev"))
      .select(col("i"), col("j"), (col("w") + col("rev")).as("n"),
        col("w"))
    val census = g.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
      .sortBy(r => (r._1, r._2))
    require(census.nonEmpty, "bradleyTerry: no decisive comparisons")
    val items = census.map(_._1).distinct.sorted
    val k = items.length
    require(k <= maxItems,
      s"bradleyTerry: $k items > maxItems $maxItems — bucket the item space")
    val idx = items.zipWithIndex.toMap
    val games = Array.fill(k)(0L)
    val wins = Array.fill(k)(0L)
    census.foreach { case (i, _, n, w) =>
      val ii = idx(i); games(ii) += n; wins(ii) += w
    }
    val s2 = BigInt(Scale) * BigInt(Scale)
    val p = Array.fill(k)(BigInt(Scale))
    var t = 0
    while (t < steps) {
      val d = Array.fill(k)(BigInt(0))
      census.foreach { case (i, j, n, _) =>
        d(idx(i)) += BigInt(n) * s2 / (p(idx(i)) + p(idx(j)))
      }
      val raw = Array.tabulate(k) { ii =>
        if (wins(ii) == 0L) BigInt(0) else BigInt(wins(ii)) * s2 / d(ii)
      }
      val s = raw.sum
      var ii = 0
      while (ii < k) { p(ii) = raw(ii) * k * Scale / s; ii += 1 }
      t += 1
    }
    val spark = comparisons.sparkSession
    import spark.implicits._
    items.indices.map { ii =>
      (items(ii), games(ii), wins(ii), p(ii).toLong,
        p(ii).toLong.toDouble / Scale)
    }.toSeq.toDF("item", "games", "wins", "strength", "score")
  }

  /** The unrolled-CTE oracle half of [[bradleyTerry]]: given SQL for
    * a `cmp(winner, loser)` relation, emits the full DuckDB query
    * replaying the identical integer MM trajectory (HUGEINT where
    * the driver loop is BigInt). Kept next to the operator so the
    * two can never drift apart.
    */
  def bradleyTerrySql(cmpSql: String, steps: Int): String = {
    // AS MATERIALIZED is load-bearing: each step references the
    // previous strengths TWICE (pi/pj), so DuckDB's default CTE
    // inlining would expand 4^steps copies of the base scan.
    val stepCtes = (1 to steps).map { t =>
      val prev = if (t == 1) "t0" else s"t${t - 1}"
      s"""d$t AS MATERIALIZED (SELECT g.i,
               sum((CAST(g.n AS HUGEINT) * 1000000 * 1000000)
                 // (pi.p + pj.p)) AS d
             FROM g JOIN $prev pi ON g.i = pi.i
                    JOIN $prev pj ON g.j = pj.i
             GROUP BY g.i),
           r$t AS MATERIALIZED (SELECT it.i,
               CASE WHEN it.wins = 0 THEN CAST(0 AS HUGEINT)
                 ELSE (CAST(it.wins AS HUGEINT) * 1000000 * 1000000)
                   // d$t.d END AS raw
             FROM items it JOIN d$t ON it.i = d$t.i),
           t$t AS MATERIALIZED (SELECT i,
               (raw * (SELECT count(*) FROM items) * 1000000)
                 // (SELECT sum(raw) FROM r$t) AS p
             FROM r$t)"""
    }.mkString(",\n           ")
    s"""WITH cmp AS ($cmpSql),
           dw AS (SELECT winner AS i, loser AS j, count(*) AS w
                  FROM cmp GROUP BY 1, 2),
           g AS MATERIALIZED (SELECT coalesce(a.i, b.i) AS i,
                   coalesce(a.j, b.j) AS j,
                   coalesce(a.w, 0) + coalesce(b.w, 0) AS n,
                   coalesce(a.w, 0) AS w
                 FROM dw a
                 FULL OUTER JOIN
                   (SELECT j AS i, i AS j, w FROM dw) b
                   USING (i, j)),
           items AS MATERIALIZED (SELECT i AS i, sum(n) AS games, sum(w) AS wins
                     FROM g GROUP BY 1),
           t0 AS (SELECT i, CAST(1000000 AS HUGEINT) AS p FROM items),
           $stepCtes
      SELECT it.i AS item, CAST(it.games AS BIGINT) AS games,
             CAST(it.wins AS BIGINT) AS wins,
             CAST(tf.p AS BIGINT) AS strength,
             CAST(tf.p AS DOUBLE) / 1000000.0 AS score
      FROM items it JOIN t$steps tf ON it.i = tf.i
      ORDER BY item"""
  }
}
