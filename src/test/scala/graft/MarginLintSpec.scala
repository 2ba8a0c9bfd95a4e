package graft

import org.scalatest.funspec.AnyFunSpec

/** Guard for the q294 fragility class: an entry that rounds (or
  * floors) a TRANSCENDENTAL into hashed output can flip its last
  * rounded digit on a 1-ulp cross-engine libm difference (driver
  * DuckDB vs JVM StrictMath), failing the oracle hash with matching
  * rows and schema — exactly how q294_es_sample went red in round 10.
  *
  * This spec scans the catalog sources for `round(`/`floor(` sites
  * with a transcendental in reach and requires the owning entry to be
  * on the AUDITED list below. Every listed entry has either
  *   - an empirical safety factor ≥ ~1e4 at sf0.01 from
  *     `tools/margin_sweep.py` / `tools/margin_manual.py` (the r11
  *     sweep table lives in BENCH_NOTES.md), or
  *   - a structural argument (integer-quantize-before-sum with a
  *     written ulp margin, the `Graph.linkScores` aaScale standard).
  * A NEW entry with such a site fails here until it is audited and
  * added — run the sweep tools at sf0.01 and record the margin.
  *
  * The detector over-approximates (any round/floor within 240 chars
  * of a transcendental call, Spark side or oracle SQL) — that is the
  * point: reviewing a false positive costs one allowlist line;
  * missing a true positive costs a red driver row.
  */
class MarginLintSpec extends AnyFunSpec {

  private val audited = Set(
    "q109_moving_std", "q113_group_split", "q119_dsir_weights",
    "q120_dsir_score", "q140_unigram_em", "q148_unimax_mix",
    "q161_char_entropy", "q167_bm25", "q174_curriculum",
    "q18_npv_per_order", "q212_pmi", "q220_chi_square", "q222_benford",
    "q223_corr_matrix", "q235_ab_test", "q237_did", "q245_kaplan_meier",
    "q247_geo_distance", "q248_geo_radius", "q24_coalesce_softmax",
    "q250_geo_radius_cells", "q251_link_scores", "q253_item_cf",
    "q254_record_linkage", "q257_cov_matrix", "q259_winnow",
    "q263_linkage_entities", "q264_nelson_aalen", "q270_dbscan",
    "q271_zipf", "q278_jackknife", "q283_assortativity",
    // r12 session-2: Heaps'-law ln sites probed by the
    // margin_manual.py q371 probe — safety 8.2e6 at sf0.01 AND
    // sf0.1 (the binding site is a shared power-of-two checkpoint);
    // the Theil-Sen slope floor is IEEE-exact arithmetic, not libm
    // (argument in the probe comment + BENCH_NOTES)
    "q371_heaps",
    // r13: Kendall tau-b — ONE global ppm floor over exact-integer
    // inputs; probed safety 4.8e11 (sf0.01) / 2.1e12 (sf0.1).
    // Bartlett — per-group (n-1)·ln(var) quantized at 4dp (6dp left
    // only ~600x headroom at 1e7 magnitudes; 4dp buys 100x): probed
    // safety 1.3e5 (sf0.01) / 9.4e3 (sf0.1); var_g rounds are IEEE
    // ratios of exact decimals, not libm (the Theil-Sen argument).
    "q380_kendall_tau", "q383_bartlett",
    "q288_jackknife_diff", "q292_km_grouped", "q299_msprt",
    "q300_bh_fdr", "q301_eb_shrink", "q303_ps_ate", "q304_ps_static",
    "q306_spearman", "q312_retrieval_eval", "q313_scoring_rules",
    "q314_kfold_cv", "q315_mutual_info", "q317_srm", "q320_backtest",
    "q323_jsd", "q325_jsd_matrix", "q329_lsh_calibration",
    "q332_ipw_ate", "q337_policy_replay", "q338_rmst", "q339_aipw",
    "q341_wilson", "q344_theil_sen_ci", "q345_policy_ips",
    "q36_expr_maxmin", "q84_ivf_batch_exact", "q86_lm_perplexity",
    // r11 additions: Aalen-Johansen CIF — KM survival margin is the
    // audited q245/q338 site; the CIF running sum and the q352
    // z/boundary rounds are probed in tools/margin_manual.py
    "q347_cum_incidence", "q352_group_seq",
    // q300's construction over the arm lattice — same z/p rounds,
    // probed in tools/margin_manual.py
    "q355_pairwise_arms")

  private val entryStart = """private val (q\w+): Q""".r
  private val roundSite = """\b(round|floor)\s*\(""".r
  // a transcendental CALL (mandatory paren — a bare word like
  // "Experiment" in a neighboring scaladoc must not trip the lint);
  // haversineM( and charEntropy( count via the suffix/prefix forms
  private val transcendental =
    ("""(?i)(\b(ln|log|log10|log2|exp|sqrt|power|pow|asin|acos)""" +
      """\s*\(|haversine\w*\s*\(|\w*entropy\s*\()""").r

  it("every transcendental round/floor site belongs to an audited " +
      "entry") {
    val dir = new java.io.File("src/main/scala/graft")
    val files = dir.listFiles()
      .filter(f => f.getName.startsWith("Queries") &&
        f.getName.endsWith(".scala"))
    assert(files.nonEmpty, s"catalog sources not found under $dir")
    val offenders = scala.collection.mutable.SortedSet.empty[String]
    for (f <- files) {
      val src = {
        val s = scala.io.Source.fromFile(f, "UTF-8")
        try s.mkString finally s.close()
      }
      val entries = entryStart.findAllMatchIn(src)
        .map(m => (m.start, m.group(1))).toVector
      for (m <- roundSite.findAllMatchIn(src)) {
        val seg = src.substring(m.start,
          math.min(src.length, m.start + 240))
        if (transcendental.findFirstIn(seg).isDefined) {
          val owner = entries.takeWhile(_._1 <= m.start).lastOption
          owner.foreach { case (_, name) =>
            if (!audited.contains(name)) offenders += name
          }
        }
      }
    }
    assert(offenders.isEmpty,
      s"entries with UN-AUDITED transcendental rounding sites: " +
        s"${offenders.mkString(", ")} — run tools/margin_sweep.py + " +
        "tools/margin_manual.py at sf0.01, record the safety factor " +
        "in BENCH_NOTES.md, then add the entry to MarginLintSpec")
  }
}
