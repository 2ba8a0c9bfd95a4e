package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc stage timing for optimization work (not part of the driver
  * contract). Current experiment: q147_corpus_pipeline phase split +
  * staged-pin A/B — the old shape recomputes `staged` (keeper agg +
  * linearScoreRow UDF pass + contamination window join) twice: once
  * for the survivors feeding sampleToTokenBudget and once for the
  * final fate join. The candidate pins the narrow (doc_id, n_tokens,
  * early_stage) frame once. INTERLEAVED in one JVM so JIT/codegen
  * warm-up is shared and the ±25% solo-run envelope cancels
  * (BENCH_NOTES records the conclusions). Earlier experiments (q328
  * canonical-skip r15, BPE merge loops r14, singleScan trades r6)
  * recorded in BENCH_NOTES.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val W = (0 until 64).map(b => (b % 7).toLong - 3L)
    def toks = filter(split(col("text"), " "), t => t =!= "")

    // --- q147 body, factored so phases can be timed and the staged
    // frame optionally pinned ---
    def build(s: SparkSession, dir: String, pinStaged: Boolean,
        phase: (String, () => Unit) => Unit): Long = {
      val raw = graft.Caches.pin(graft.QH.spread(
          graft.QH.read(s, dir, "documents"))
        .where(col("text").isNotNull)
        .select(col("doc_id"), col("text")))
      var off = 0L
      phase("raw_pin+off", () =>
        off = raw.agg(max(col("doc_id"))).head.getLong(0) + 1L)
      val dupPlant = raw.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + off).as("doc_id"), col("text"))
      val contamPlant = raw.where(col("doc_id") % 97 === 0)
        .select((col("doc_id") + 2L * off).as("doc_id"), col("text"))
      val d0 = raw.unionByName(dupPlant).unionByName(contamPlant)
        .select(col("doc_id"), col("text"),
          size(toks).cast("long").as("n_tokens"),
          md5(graft.llmdata.Dedup.normalize(col("text"))).as("__fp"),
          (col("doc_id") % 97 === 0).as("__eval"))
      val base = graft.Caches.pin(d0)
      phase("base_pin", () => { base.count(); () })
      val train = base.where(!col("__eval"))
      val keeper = train.groupBy(col("__fp"))
        .agg(min(col("doc_id")).as("__keep"))
      phase("keeper", () => { keeper.count(); () })
      val scored = graft.llmdata.TextAnalysis.linearScoreRow(
          train, "doc_id", "text", W, intercept = 135L)
        .select(col("doc_id"), col("score_raw"))
      phase("scored", () => { scored.count(); () })
      def wins(df: DataFrame) =
        df.where(size(toks) >= 8)
          .select(col("doc_id"), explode(transform(
            sequence(lit(0), size(toks) - 8),
            i => array_join(slice(toks, i + 1, lit(8)), " "))).as("__w"))
      val evalW = wins(base.where(col("__eval")))
        .select(col("__w")).distinct()
      val contam = wins(train).join(broadcast(evalW), Seq("__w"))
        .select(col("doc_id")).distinct()
        .withColumn("__contam", lit(true))
      phase("contam", () => { contam.count(); () })
      val staged0 = base
        .join(keeper, Seq("__fp"), "left")
        .join(scored, Seq("doc_id"), "left")
        .join(contam, Seq("doc_id"), "left")
        .withColumn("early_stage",
          when(col("__eval"), "eval")
            .when(col("doc_id") =!= col("__keep"), "dedup")
            .when(coalesce(col("score_raw"), lit(0L)) <= 0L, "quality")
            .when(coalesce(col("__contam"), lit(false)), "decontam"))
        .select(col("doc_id"), col("n_tokens"), col("early_stage"))
      val staged =
        if (pinStaged) graft.Caches.pin(staged0) else staged0
      if (pinStaged) phase("staged_pin", () => { staged.count(); () })
      val surv = staged.where(col("early_stage").isNull)
        .select(col("doc_id"), col("n_tokens"))
      val kept = graft.llmdata.Sampling.sampleToTokenBudget(surv,
          "doc_id", col("n_tokens"), budget = 12000L)
        .select(col("doc_id")).withColumn("__kept", lit(true))
      phase("budget", () => { kept.count(); () })
      var n = 0L
      phase("final_join", () => n = staged.join(kept, Seq("doc_id"), "left")
        .withColumn("stage", coalesce(col("early_stage"),
          when(coalesce(col("__kept"), lit(false)), "kept")
            .otherwise("budget")))
        .select(col("doc_id"), col("n_tokens"), col("stage"))
        .orderBy(col("doc_id")).collect().length.toLong)
      n
    }

    // probe=true: force+time every intermediate (phase split).
    // probe=false: only the actions the real q147 performs (the `off`
    // head and the final collect) run — the honest A/B timing.
    val required = Set("raw_pin+off", "final_join")
    def run(pinStaged: Boolean, probe: Boolean): Double = {
      val t0 = System.nanoTime()
      val n = build(spark, sfDir, pinStaged, (name, f) => {
        if (probe || required(name)) {
          val p0 = System.nanoTime()
          f()
          if (probe)
            println(f"[scratch]   $name%-12s ${(System.nanoTime() - p0) / 1e9}%6.2f s")
        }
      })
      val dt = (System.nanoTime() - t0) / 1e9
      graft.Caches.release()
      spark.catalog.clearCache()
      if (probe) println(f"[scratch]   rows=$n total $dt%6.2f s")
      dt
    }

    // shared warm-up: one untimed rep of EACH shape
    run(pinStaged = false, probe = false)
    run(pinStaged = true, probe = false)
    // phase split, steady state, one rep each
    println("[scratch] phase split OLD (no staged pin):")
    run(pinStaged = false, probe = true)
    println("[scratch] phase split NEW (staged pinned):")
    run(pinStaged = true, probe = true)
    // interleaved A/B
    val times = collection.mutable.Map("old" -> List.empty[Double],
      "new" -> List.empty[Double])
    for (rep <- 1 to 6; (tag, p) <- Seq("old" -> false, "new" -> true)) {
      val dt = run(pinStaged = p, probe = false)
      times(tag) = times(tag) :+ dt
      println(f"[scratch] rep $rep $tag%-3s $dt%6.2f s")
    }
    for (tag <- Seq("old", "new")) {
      val s = times(tag).sorted
      println(f"[scratch] $tag%-3s median ${s(s.length / 2)}%6.2f s " +
        f"min ${s.head}%6.2f max ${s.last}%6.2f")
    }
    spark.stop()
  }
}
