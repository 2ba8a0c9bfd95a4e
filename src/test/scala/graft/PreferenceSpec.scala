package graft

import graft.llmdata.Dedup
import graft.ops.{Eval, Preference}
import org.apache.spark.sql.functions._

/** Hand-computed cases for the round-12 session-2 batch: Bradley–
  * Terry integer MM, Krippendorff's alpha, and the benchmark
  * n-gram contamination sweep — each small enough to check by
  * pencil, pinning the arithmetic independently of the DuckDB
  * oracles that replay the same trajectories.
  */
class PreferenceSpec extends SparkSuite {
  import spark.implicits._

  override protected def withFixture(test: NoArgTest) =
    try super.withFixture(test) finally graft.Caches.release()

  test("bradleyTerry: two items, 2:1 wins — integer MM fixed point " +
      "at (4/3, 2/3) on the 1e-6 lattice") {
    val cmp = Seq(("A", "B"), ("A", "B"), ("B", "A"))
      .toDF("winner", "loser")
    val r = Preference.bradleyTerry(cmp, col("winner"), col("loser"),
      steps = 10).orderBy(col("item")).collect()
    assert(r.length == 2)
    val a = r(0); val b = r(1)
    assert(a.getString(0) == "A" && b.getString(0) == "B")
    assert(a.getAs[Long]("games") == 3 && b.getAs[Long]("games") == 3)
    assert(a.getAs[Long]("wins") == 2 && b.getAs[Long]("wins") == 1)
    // iter 1: D = 3e12/2e6 = 1.5e6 both; raw_A = 2e12/1.5e6 =
    // 1333333, raw_B = 666666; normalize to sum 2e6 keeps
    // (1333333, 666666), which every later step reproduces.
    assert(a.getAs[Long]("strength") == 1333333L)
    assert(b.getAs[Long]("strength") == 666666L)
    assert(a.getAs[Double]("score") == 1.333333)
  }

  test("bradleyTerry: zero-win item pinned to strength 0, winner " +
      "takes the whole normalized mass") {
    val cmp = Seq(("A", "B"), ("A", "B")).toDF("winner", "loser")
    val r = Preference.bradleyTerry(cmp, col("winner"), col("loser"),
      steps = 3).orderBy(col("item")).collect()
    assert(r(1).getAs[Long]("strength") == 0L)     // B never wins
    assert(r(0).getAs[Long]("strength") == 2000000L) // sum = K·S
  }

  test("bradleyTerry: ties and self-comparisons are rejected rows, " +
      "not silent data") {
    val cmp = Seq(("A", "A"), ("A", "B")).toDF("winner", "loser")
    val r = Preference.bradleyTerry(cmp, col("winner"), col("loser"),
      steps = 2).collect()
    // the (A,A) row is dropped by the =!= filter: one decisive game
    assert(r.map(_.getAs[Long]("games")).sum == 2L)
  }

  test("bradleyTerry: item-count guard fires BEFORE any collect — " +
      "3 items vs maxItems 2 refused by distinct-item census") {
    val cmp = Seq(("A", "B"), ("B", "C"), ("C", "A"))
      .toDF("winner", "loser")
    val e = intercept[IllegalArgumentException] {
      Preference.bradleyTerry(cmp, col("winner"), col("loser"),
        steps = 2, maxItems = 2)
    }
    assert(e.getMessage.contains("3 items > maxItems 2"))
  }

  test("bradleyTerry: maxCells driver budget refuses a win matrix " +
      "wider than the documented collect bound") {
    val cmp = Seq(("A", "B"), ("B", "C"), ("C", "A"))
      .toDF("winner", "loser")
    val e = intercept[IllegalArgumentException] {
      Preference.bradleyTerry(cmp, col("winner"), col("loser"),
        steps = 2, maxItems = 8, maxCells = 2L)
    }
    assert(e.getMessage.contains("win-matrix cells > maxCells"))
  }

  test("elo: two A-beats-B games replay the exact integer table " +
      "trajectory, zero-sum holds, input row order is irrelevant") {
    val games = Seq((2L, "A", "B"), (1L, "A", "B"))
      .toDF("ts", "w", "l")
    val r = Preference.elo(games, col("ts"), col("w"), col("l"))
      .orderBy(col("item")).collect()
    graft.Caches.release()
    // replay by hand with the shared table
    val init = 1500000000L
    var (ra, rb) = (init, init)
    (1 to 2).foreach { _ =>
      val b = math.min(31L, math.max(0L,
        Math.floorDiv(ra - rb + 400000000L, 25000000L))).toInt
      val d = 32L * (1000000L - Preference.EloTable(b))
      ra += d; rb -= d
    }
    assert(r.map(_.getAs[String]("item")).toSeq == Seq("A", "B"))
    assert(r(0).getAs[Long]("rating_ppm") == ra)
    assert(r(1).getAs[Long]("rating_ppm") == rb)
    assert(r(0).getAs[Long]("games") == 2 &&
      r(0).getAs[Long]("wins") == 2)
    assert(r(1).getAs[Long]("wins") == 0)
    // zero-sum: total rating mass is conserved
    assert(r.map(_.getAs[Long]("rating_ppm")).sum == 2 * init)
    // first game is at even ratings: E = table(16), winner gains
    assert(ra > init && Preference.EloTable(16) > 500000L)

    val shuffled = Seq((1L, "A", "B"), (2L, "A", "B"))
      .toDF("ts", "w", "l")
    val r2 = Preference.elo(shuffled, col("ts"), col("w"), col("l"))
      .orderBy(col("item")).collect()
    graft.Caches.release()
    assert(r2(0).getAs[Long]("rating_ppm") == ra)
  }

  test("elo: maxGames guard refuses an oversized stream before " +
      "any collect") {
    val games = (1L to 5L).map((_, "A", "B")).toDF("ts", "w", "l")
    val e = intercept[IllegalArgumentException] {
      Preference.elo(games, col("ts"), col("w"), col("l"),
        maxGames = 3L)
    }
    assert(e.getMessage.contains("games (> 3)"))
    graft.Caches.release()
  }

  test("elo: self-games and null-field rows are hygiene-dropped " +
      "(trajectory identical to the clean stream); an all-dirty " +
      "stream fails with the empty-input message, not the " +
      "maxGames one") {
    val clean = Seq((1L, "A", "B"), (2L, "B", "A"))
      .toDF("ts", "w", "l")
    val dirty = Seq(
      (Some(1L), Some("A"), Some("B")),
      (Some(5L), Some("A"), Some("A")), // self-game
      (None: Option[Long], Some("A"), Some("B")), // null ord
      (Some(6L), None: Option[String], Some("B")), // null winner
      (Some(7L), Some("A"), None: Option[String]), // null loser
      (Some(2L), Some("B"), Some("A")))
      .toDF("ts", "w", "l")
    val rc = Preference.elo(clean, col("ts"), col("w"), col("l"))
      .orderBy(col("item")).collect()
    graft.Caches.release()
    val rd = Preference.elo(dirty, col("ts"), col("w"), col("l"))
      .orderBy(col("item")).collect()
    graft.Caches.release()
    assert(rc.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq ==
      rd.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq)

    val allDirty = Seq((1L, "A", "A"), (2L, "B", "B"))
      .toDF("ts", "w", "l")
    val e = intercept[IllegalArgumentException] {
      Preference.elo(allDirty, col("ts"), col("w"), col("l"))
    }
    assert(e.getMessage.contains("no games after hygiene"))
    graft.Caches.release()
  }

  test("krippendorffAlpha: no unit with >= 2 ratings fails with a " +
      "clear message, not an NPE") {
    val df = Seq(("u1", "a"), ("u2", "b")).toDF("unit", "v")
    val e = intercept[IllegalArgumentException] {
      Eval.krippendorffAlpha(df, col("unit"), col("v"))
    }
    assert(e.getMessage.contains("no unit has >= 2 ratings"))
  }

  test("krippendorffAlpha: 3 two-rater units (aa, ab, bb) -> " +
      "D_o=1/3, D_e=0.6, alpha=4/9; single-rating units excluded") {
    val df = Seq(
      ("u1", "a"), ("u1", "a"),
      ("u2", "a"), ("u2", "b"),
      ("u3", "b"), ("u3", "b"),
      ("u4", "c")) // m=1: must not enter D_o, n, or the pooled counts
      .toDF("unit", "v")
    val r = Eval.krippendorffAlpha(df, col("unit"), col("v"),
      maxRaters = 4).collect()(0)
    assert(r.getAs[Long]("n_units") == 3)
    assert(r.getAs[Long]("n_ratings") == 6)
    assert(r.getAs[Long]("do_ppm") == 333333L)  // floor(1e6/3 + .5)
    assert(r.getAs[Long]("de_ppm") == 600000L)  // 18/(6*5)
    assert(r.getAs[Long]("alpha_ppm") == 444444L) // 1 - 10/18
  }

  test("krippendorffAlpha: perfect agreement -> alpha_ppm = 1e6") {
    val df = Seq(("u1", "x"), ("u1", "x"), ("u2", "y"), ("u2", "y"))
      .toDF("unit", "v")
    val r = Eval.krippendorffAlpha(df, col("unit"), col("v"))
      .collect()(0)
    assert(r.getAs[Long]("do_ppm") == 0L)
    assert(r.getAs[Long]("alpha_ppm") == 1000000L)
  }

  test("sq8TopK: hand-coded 8-bit lattice — aligned vector scores " +
      "255*255, orthogonal scores 0, constant dim drops out") {
    val df = Seq(
      (0L, Array(0f, 10f, 5f)),   // query
      (1L, Array(0f, 10f, 5f)),   // identical -> code dot 65025
      (2L, Array(10f, 0f, 5f)))   // orthogonal -> 0
      .toDF("vec_id", "embedding")
    val r = graft.llmdata.Similarity.sq8TopK(df, "vec_id",
      "embedding", queryId = 0L, k = 2).collect()
    assert(r.map(x => (x.getLong(0), x.getAs[Long]("dot_q"))).toSeq ==
      Seq((1L, 65025L), (2L, 0L)))
  }

  test("benchmarkContamination: hand-counted 2-gram overlap, " +
      "short doc reports 0 grams") {
    val bench = Seq((100L, "one two three four five"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "one two three six"), // 3 shingles, 2 in benchmark
      (2L, "seven eight"),       // 1 shingle, 0 hits
      (3L, "nine"))              // < 2 words: no shingles
      .toDF("doc_id", "text")
    val r = Dedup.benchmarkContamination(corpus, bench,
      "doc_id", "text", shingleN = 2, flagPpm = 500000L)
      .orderBy(col("doc_id")).collect()
    assert(r.map(_.getAs[Long]("n_grams")).toSeq == Seq(3L, 1L, 0L))
    assert(r.map(_.getAs[Long]("n_hit")).toSeq == Seq(2L, 0L, 0L))
    // 2*1e6 div 3 = 666666 (exact integer div, no float)
    assert(r.map(_.getAs[Long]("contam_ppm")).toSeq ==
      Seq(666666L, 0L, 0L))
    assert(r.map(_.getAs[Int]("flagged")).toSeq == Seq(1, 0, 0))
  }
}
