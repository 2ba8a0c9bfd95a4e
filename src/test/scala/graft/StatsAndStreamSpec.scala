package graft

import graft.exprlang.Financial
import graft.functions.Stats
import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** Diagnostics (KS/assess/coalesce — diags.go goldens), financial
  * solvers, and REAL Structured Streaming runs (watermark + windows
  * through readStream, not just the batch shape).
  */
class StatsAndStreamSpec extends SparkSuite {
  import spark.implicits._

  test("KS = 100 on perfectly separable data (diags_test.go golden)") {
    val df = (1 to 100).map(i =>
      (i.toDouble, if (i > 50) 1.0 else 0.0)).toDF("score", "y")
    val (ks, _) = Stats.ks(df, col("score"), col("y"))
    assert(math.abs(ks - 100.0) < 1e-9)
  }

  test("KS ~ 0 on identical distributions") {
    val df = (1 to 100).map(i => (i % 10 * 1.0, i % 2 * 1.0))
      .toDF("score", "y")
    val (ks, _) = Stats.ks(df, col("score"), col("y"))
    assert(ks < 25.0)
  }

  test("assess precision/recall/accuracy on a known confusion matrix " +
      "(diags.go:476-529)") {
    // pred>0.5: rows 3,4; obs: rows 2,4 -> tp=1 fp=1 fn=1 tn=1
    val df = Seq((0.1, 0.0), (0.2, 1.0), (0.9, 0.0), (0.8, 1.0))
      .toDF("score", "y")
    val r = Stats.assess(df, col("score"), col("y"), 0.5).head()
    assert(r.getAs[Long]("n") == 4)
    assert(math.abs(r.getAs[Double]("precision") - 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("recall") - 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("accuracy") - 0.5) < 1e-12)
  }

  test("coalesce: softmax from logodds sums to the target slice " +
      "(diags.go:32-95)") {
    val df = Seq((1.0, 2.0, 3.0)).toDF("l0", "l1", "l2")
    val p = df.select(Stats.coalesceCols(
      Seq(col("l0"), col("l1"), col("l2")), Seq(0, 2),
      binary = false, logodds = true).as("p")).head().getDouble(0)
    val Seq(e0, e1, e2) = Seq(1.0, 2.0, 3.0).map(math.exp)
    assert(math.abs(p - (e0 + e2) / (e0 + e1 + e2)) < 1e-12)
  }

  test("irr solves npv(r)=0 (parser.go:617-658 semantics)") {
    // invest 100, receive 60 twice: irr ~ 13.07%
    val r = Financial.irr(Array(-100.0, 60.0, 60.0))
    assert(math.abs(Financial.npv(r, Array(-100.0, 60.0, 60.0))) < 1e-6)
    assert(r > 0.13 && r < 0.131)
  }

  test("irr returns 0 when no sign change (reference failure mode)") {
    assert(Financial.irr(Array(10.0, 10.0)) == 0.0)
  }

  test("segment table: per-level fitted vs observed (SegPlot data, " +
      "diags.go:261-307)") {
    val df = Seq(("a", 0.8, 1.0), ("a", 0.6, 1.0), ("b", 0.3, 0.0),
      ("b", 0.1, 0.0)).toDF("seg", "score", "y")
    val t = Stats.segment(df, col("seg"), col("score"), col("y"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    assert(t("a") == ((0.7, 1.0, 2L)))
    assert(t("b") == ((0.2, 0.0, 2L)))
  }

  test("irr through the formula path solves an ordered cashflow " +
      "(parser.go:617-658)") {
    val pipe = Seq((-100.0, 0L), (60.0, 1L), (60.0, 2L))
      .toDF("cf", "__seq")
    val out = graft.exprlang.Formula.addToPipe(pipe, "r", "irr(cf)",
      Some("__seq"))
    val r = out.select(max(col("r"))).head().getDouble(0)
    assert(r > 0.13 && r < 0.131)
  }

  test("ProductAgg: exact grouped product incl. zeros and negatives") {
    val df = Seq((1, 2.0), (1, -3.0), (1, 4.0), (2, 5.0), (2, 0.0))
      .toDF("k", "v")
    val got = df.groupBy(col("k"))
      .agg(graft.functions.ProductAgg(col("v")).as("p"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(got(1) == -24.0 && got(2) == 0.0)
  }

  test("print formula shows rows and evaluates to 1 " +
      "(parser.go:572-613)") {
    val out = graft.exprlang.Formula.addToPipe(corpusPipe, "p",
      "print(c + D, 1)", Some("__seq"))
    assert(col1(out, "p") == Seq(1.0, 1.0))
  }

  test("describeBy: per-group Desc equals per-slice describe " +
      "(slicer loop collapsed to one aggregate)") {
    import spark.implicits._
    val df = ((1 to 50).map(i => ("a", i.toDouble)) ++
      (1 to 30).map(i => ("b", i * 2.0))).toDF("g", "x")
    val grouped = Stats.describeBy(df, col("g"), "x").collect()
      .map(r => r.getString(0) -> r).toMap
    Seq("a", "b").foreach { g =>
      val single = Stats.describe(df.where(col("g") === g), "x").head()
      val got = grouped(g)
      assert(got.getLong(1) == single.getLong(0)) // n
      assert(math.abs(got.getDouble(2) - single.getDouble(1)) < 1e-9)
      assert(math.abs(got.getDouble(7) - single.getDouble(6)) < 1e-9) // q50
    }
  }

  test("winsorize clips at empirical quantiles, keeps interior values") {
    import spark.implicits._
    val df = ((1 to 98).map(_.toDouble) ++ Seq(-1e6, 1e6)).toDF("x")
    val w = Stats.winsorize(df, "x", lo = 0.02, hi = 0.98,
      out = "xc").select("x", "xc").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(w(-1e6) > -1e6 && w(1e6) < 1e6) // outliers capped
    assert(w(50.0) == 50.0)                // interior untouched
    val (lo, hi) = (w.values.min, w.values.max)
    assert(lo >= 1.0 && hi <= 98.0)
  }

  test("describe matches exact quantiles on a known vector") {
    val df = (1 to 100).map(_.toDouble).toDF("x")
    val d = Stats.describe(df, "x").head()
    assert(d.getAs[Long]("n") == 100)
    assert(math.abs(d.getAs[Double]("q50") - 50.5) < 1e-9)
    assert(d.getAs[Double]("q0") == 1.0 && d.getAs[Double]("q100") == 100.0)
  }

  test("streaming tumbling window over file source matches batch " +
      "(readStream + watermark + AvailableNow)") {
    val dir = TestSpark.sfDir
    val q = Streams.runStreaming(spark, s"$dir/events.parquet",
      df => Streams.tumbling(df, "1 hour"), "t_tumbling")
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql(
      "SELECT sum(n_events) FROM t_tumbling").head().getLong(0)
    val batchEvents = QH.read(spark, dir, "events").count()
    assert(streamed == batchEvents)
  }

  test("stream-stream interval join with watermarks matches the " +
      "batch join (state-bounded attribution)") {
    val dir = TestSpark.sfDir
    val ev = QH.read(spark, dir, "events")
    def side(t: String) = ev.where(col("event_type") === t)
      .select(col("event_id"), col("user_id"), col("ts"))
    val want = Streams.intervalJoin(side("view"), side("purchase"),
      "user_id", "ts", "1 HOUR").count()
    assert(want > 0)

    val schema = ev.schema
    val tmp = java.nio.file.Files.createTempDirectory("graft_ssj")
    java.nio.file.Files.createSymbolicLink(tmp.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    def streamSide(t: String) = {
      val raw = spark.readStream
        .schema(spark.read.parquet(tmp.toString).schema)
        .parquet(tmp.toString)
      QH.normalizeTs(raw).where(col("event_type") === t)
        .select(col("event_id"), col("user_id"), col("ts"))
        .withWatermark("ts", "2 hours")
    }
    val q = Streams.intervalJoin(streamSide("view"),
        streamSide("purchase"), "user_id", "ts", "1 HOUR")
      .writeStream.outputMode("append").format("memory")
      .queryName("t_ssj")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    assert(spark.sql("SELECT count(*) FROM t_ssj").head().getLong(0)
      == want)
  }

  test("flatMapGroupsWithState carries per-user running state across " +
      "micro-batches") {
    val dir = TestSpark.sfDir
    val schema = QH.read(spark, dir, "events").schema
    val tmp = java.nio.file.Files.createTempDirectory("graft_state")
    java.nio.file.Files.createSymbolicLink(tmp.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val src = spark.readStream.schema(schema).parquet(tmp.toString)
      .select(col("user_id"), col("value")).as[Streams.UserEvent]
    val q = Streams.runningPerUser(src).writeStream
      .outputMode("update").format("memory").queryName("t_running")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    // the LAST state row per user must equal the batch aggregate
    val got = spark.sql(
      """SELECT user_id, max(n_events) AS n FROM t_running
         GROUP BY user_id""").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = QH.read(spark, dir, "events").groupBy(col("user_id"))
      .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("dedup-at-ingest: a near-dup arriving in a LATER micro-batch " +
      "is flagged against bucket state (MinHash-LSH + " +
      "flatMapGroupsWithState)") {
    import graft.streaming.StreamingDedup
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest tonight"
    val tmp = java.nio.file.Files.createTempDirectory("graft_sdedup")
    // batch 1: original + unrelated; batch 2 (separate file, forced
    // separate trigger): the near-duplicate
    Seq((1L, base),
      (2L, "completely unrelated content about query engines and " +
        "distributed systems running on large clusters"))
      .toDF("doc_id", "text").coalesce(1).write
      .parquet(s"$tmp/b1.parquet")
    Seq((3L, base + " extra")).toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$tmp/b2.parquet")
    val schema = spark.read.parquet(s"$tmp/b1.parquet").schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/*")
    val q = StreamingDedup.dedupStream(src, "doc_id", "text",
        shingleN = 3, bands = 8, rows = 4, threshold = 0.5)
      .writeStream.outputMode("update").format("memory")
      .queryName("t_dedup")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    // multiple triggers actually happened (state had to carry over)
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
      q.recentProgress.map(_.numInputRows).mkString(","))
    val pairs = spark.sql(
      "SELECT DISTINCT doc_a, doc_b FROM t_dedup").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 3L)), s"cross-batch near-dup missed: $pairs")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L),
      s"unrelated doc flagged: $pairs")

    // TTL wiring must not change detection semantics (checked in
    // batch mode — a drain-the-directory AvailableNow query with
    // processing-time timers would wait for them to fire)
    val batchDocs = spark.read.schema(schema).parquet(s"$tmp/*")
    val ttlPairs = StreamingDedup.dedupStream(batchDocs, "doc_id",
        "text", shingleN = 3, bands = 8, rows = 4, threshold = 0.5,
        stateTtlMs = 3600L * 1000L)
      .select("doc_a", "doc_b").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ttlPairs.contains((1L, 3L)), s"TTL variant missed: $ttlPairs")
  }

  test("event-time TTL: an out-of-window near-dup stops matching " +
      "while an in-window one still flags (watermark-driven eviction)") {
    import graft.streaming.StreamingDedup
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest tonight"
    val fresh = "modern columnar engines vectorize their scan and " +
      "aggregate operators for throughput on wide analytic tables"
    def ts(min: Int) = java.sql.Timestamp.valueOf(
      f"2024-01-01 10:$min%02d:00")
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val src = in.toDF().toDF("doc_id", "text", "ts")
    val q = StreamingDedup.dedupStream(src, "doc_id", "text",
        shingleN = 3, bands = 8, rows = 4, threshold = 0.5,
        stateTtlMs = 5L * 60L * 1000L, eventTimeCol = "ts")
      .writeStream.outputMode("update").format("memory")
      .queryName("t_ev_ttl").start()
    // batch 1 @10:00: two originals enroll; watermark -> 10:00
    in.addData((1L, base, ts(0)), (2L, fresh, ts(0)))
    q.processAllAvailable()
    // batch 2 @10:04: in-window near-dup of doc 2 -> must flag
    in.addData((3L, fresh + " extra", ts(4)))
    q.processAllAvailable()
    // batch 3 @10:30: advances the watermark far past every expiry
    in.addData((4L, "totally different text about nothing else at " +
      "all in particular today", ts(30)))
    q.processAllAvailable()
    // batch 4 @10:31: near-dup of doc 1 — its signature is 31 min
    // old vs a 5 min TTL -> must NOT flag
    in.addData((5L, base + " extra", ts(31)))
    q.processAllAvailable(); q.stop()
    val pairs = spark.sql(
      "SELECT DISTINCT doc_a, doc_b FROM t_ev_ttl").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((2L, 3L)), s"in-window near-dup missed: $pairs")
    assert(!pairs.contains((1L, 5L)),
      s"expired signature still matched: $pairs")
  }

  test("baselineAlert: real readStream (windowed agg + stream-static " +
      "broadcast join) equals the batch form under two slicings") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.Streams
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(
      f"2024-01-01 $h%02d:$m%02d:00")
    val rows = Seq(
      ("a", ts(1, 0)), ("a", ts(1, 10)), ("a", ts(1, 20)), // 3 > 2*1
      ("a", ts(2, 0)),                                     // 1, quiet
      ("b", ts(1, 5)), ("b", ts(1, 6)))                    // 2 <= 2*1
    val base = Seq(("a", 1, 1L), ("a", 2, 1L), ("b", 1, 1L))
      .toDF("event_type", "pos", "expected")
    val batch = Streams.baselineAlert(
        rows.toDF("event_type", "ts"), base, "1 hour", 2L, 1L)
      .select("window_start", "event_type", "n", "alert")
      .collect().map(r => (r.getTimestamp(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSet
    for ((name, slices) <- Seq(
        ("one", Seq(rows)),
        ("split", Seq(rows.take(2), rows.slice(2, 5), rows.drop(5))))) {
      val in = MemoryStream[(String, java.sql.Timestamp)]
      val src = in.toDF().toDF("event_type", "ts")
        .withWatermark("ts", "10 minutes")
      val q = Streams.baselineAlert(src, base, "1 hour", 2L, 1L)
        .writeStream.outputMode("append").format("memory")
        .queryName(s"t_alert_$name").start()
      slices.foreach { s2 => in.addData(s2); q.processAllAvailable() }
      // advance the watermark past every window so appends flush
      in.addData(("z", ts(9, 0))); q.processAllAvailable(); q.stop()
      val got = spark.sql(s"SELECT window_start, event_type, n, " +
          s"alert FROM t_alert_$name WHERE event_type <> 'z'")
        .collect().map(r => (r.getTimestamp(0), r.getString(1),
          r.getLong(2), r.getLong(3))).toSet
      assert(got == batch, s"$name: $got vs $batch")
    }
    // the hand case itself: only (a, 01:00) alerts
    val alerts = batch.filter(_._4 == 1L).map(t => (t._2, t._1))
    assert(alerts == Set(("a", ts(1, 0))), s"alerts $alerts")
  }

  test("srmMonitor: real readStream equals the batch form under two " +
      "slicings; a biased window alarms, a balanced one does not") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.Streams
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    def ts(d: Int, h: Int) = java.sql.Timestamp.valueOf(
      f"2024-01-0$d%d $h%02d:00:00")
    // day 1: exp a balanced 2/2; day 2: exp a biased 40/0
    val rows = Seq(
      ("a", 0L, ts(1, 1)), ("a", 1L, ts(1, 2)),
      ("a", 2L, ts(1, 3)), ("a", 3L, ts(1, 4))) ++
      (1 to 40).map(i => ("a", 2L * i, ts(2, i % 20)))
    val inA = (col("user_id") % 2 === 0).cast("long")
    val batch = Streams.srmMonitor(
        rows.toDF("event_type", "user_id", "ts"), inA, "1 day")
      .collect().map(r => (r.getTimestamp(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getDouble(4), r.getInt(6))).toSet
    // hand: day1 chi2 = 0 no flag; day2 n_a=40 n_b=0 chi2 = 40, flag
    val byDay = batch.map(t => t._1.toString.take(10) ->
      ((t._3, t._4, t._5, t._6))).toMap
    assert(byDay("2024-01-01") == ((2L, 2L, 0.0, 0)))
    assert(byDay("2024-01-02") == ((40L, 0L, 40.0, 1)))
    for ((name, slices) <- Seq(
        ("one", Seq(rows)),
        ("split", Seq(rows.take(3), rows.slice(3, 10), rows.drop(10))))) {
      val in = MemoryStream[(String, Long, java.sql.Timestamp)]
      val src = in.toDF().toDF("event_type", "user_id", "ts")
        .withWatermark("ts", "1 hour")
      val q = Streams.srmMonitor(src, inA, "1 day")
        .writeStream.outputMode("append").format("memory")
        .queryName(s"t_srm_$name").start()
      slices.foreach { s2 => in.addData(s2); q.processAllAvailable() }
      in.addData(("z", 1L, ts(9, 0))); q.processAllAvailable(); q.stop()
      val got = spark.sql(s"SELECT * FROM t_srm_$name " +
          "WHERE event_type <> 'z'")
        .collect().map(r => (r.getTimestamp(0), r.getString(1),
          r.getLong(2), r.getLong(3), r.getDouble(4), r.getInt(6))).toSet
      assert(got == batch, s"$name: $got vs $batch")
    }
  }

  test("shapleyAttribution: hand lattice — marginal contributions " +
      "average to exact ppm credits and satisfy efficiency") {
    import graft.streaming.Streams
    // u1 {a} converts, u2 {a} no, u3 {b} no, u4 {a,b} converts:
    // v(a)=0.5, v(b)=0, v(ab)=1 -> phi_a=0.75, phi_b=0.25
    val ev = Seq((1L, "a"), (1L, "z"), (2L, "a"), (3L, "b"),
      (4L, "a"), (4L, "b"), (4L, "z"))
      .toDF("user_id", "event_type")
    val got = Streams.shapleyAttribution(ev, Seq("a", "b"), "z")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    graft.Caches.release()
    assert(got("a") == ((1500000L, 0.75)), s"got $got")
    assert(got("b") == ((500000L, 0.25)), s"got $got")
    // efficiency: credits sum to v(full) - v(empty) = 1
    assert(got.values.map(_._2).sum == 1.0)
    intercept[IllegalArgumentException] {
      Streams.shapleyAttribution(ev, Seq("a", "z"), "z")
    }
  }

  test("msprt: balanced variants keep p_always at 1; complete " +
      "separation drives it below 1%; trajectory is non-increasing") {
    import graft.ops.Experiment
    val bal = (1L to 400L).map(i =>
      (i % 10, i % 2, i % 4 < 2)).toDF("per", "v", "s")
    val pb = Experiment.msprt(bal, col("per"), col("v"), col("s"))
      .collect().map(_.getDouble(6))
    assert(pb.forall(_ == 1.0), s"balanced p: ${pb.toSeq}")
    val sep = (1L to 1000L).map(i =>
      (i % 5, i % 2, i % 2 == 1)).toDF("per", "v", "s")
    val ps = Experiment.msprt(sep, col("per"), col("v"), col("s"))
      .orderBy(col("per"))
      .collect().map(_.getDouble(6))
    assert(ps.last < 0.01, s"separated p: ${ps.toSeq}")
    assert(ps.sliding(2).forall(w =>
      w.length < 2 || w(1) <= w(0)), s"not monotone: ${ps.toSeq}")
  }

  test("event-time TTL replay determinism: two different micro-batch " +
      "slicings of the same stream produce identical hits") {
    import graft.streaming.StreamingDedup
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest tonight"
    val fresh = "modern columnar engines vectorize their scan and " +
      "aggregate operators for throughput on wide analytic tables"
    def ts(min: Int) = java.sql.Timestamp.valueOf(
      f"2024-01-01 10:$min%02d:00")
    val docs = Seq(
      (1L, base, ts(0)), (2L, fresh, ts(0)),
      (3L, fresh + " extra", ts(4)), // in-window near-dup of 2
      (4L, "totally different text about nothing else at all in " +
        "particular today", ts(30)), // advances the watermark
      (5L, base + " extra", ts(31))) // doc 1 expired by then
    // two slicings; both keep the expiry-relevant boundary (the
    // watermark must pass doc 1's expiry BEFORE doc 5 arrives — the
    // one ordering constraint event-time semantics promise). The
    // watermark DELAY must cover the stream's out-of-orderness: with
    // 0s, a record whose event time EQUALS the watermark is dropped
    // as late when it lands in a later micro-batch but processed when
    // it shares the batch — the exact slicing-dependence this spec
    // exists to rule out.
    def run(name: String, slices: Seq[Seq[Int]]): Set[(Long, Long, Double)] = {
      val in = MemoryStream[(Long, String, java.sql.Timestamp)]
      val q = StreamingDedup.dedupStream(
          in.toDF().toDF("doc_id", "text", "ts"), "doc_id", "text",
          shingleN = 3, bands = 8, rows = 4, threshold = 0.5,
          stateTtlMs = 5L * 60L * 1000L, eventTimeCol = "ts",
          watermarkDelay = "2 minutes")
        .writeStream.outputMode("update").format("memory")
        .queryName(name).start()
      slices.foreach { s =>
        in.addData(s.map(i => docs(i)))
        q.processAllAvailable()
      }
      q.stop()
      spark.sql(s"SELECT DISTINCT doc_a, doc_b, round(est_jaccard, 9) " +
        s"FROM $name").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }
    val a = run("t_replay_a", Seq(Seq(0), Seq(1), Seq(2), Seq(3), Seq(4)))
    val b = run("t_replay_b", Seq(Seq(0, 1, 2), Seq(3), Seq(4)))
    assert(a == b, s"slicing-dependent hits: a=$a b=$b")
    assert(a.exists(p => p._1 == 2L && p._2 == 3L), s"missed pair: $a")
    assert(!a.exists(p => p._1 == 1L && p._2 == 5L),
      s"expired signature matched: $a")
  }

  test("streaming session windows produce sessions per user") {
    val dir = TestSpark.sfDir
    val q = Streams.runStreaming(spark, s"$dir/events.parquet",
      df => Streams.sessionized(df, "30 minutes"), "t_sessions")
    q.processAllAvailable(); q.stop()
    val sessions = spark.sql(
      "SELECT count(*), sum(n_events) FROM t_sessions").head()
    assert(sessions.getLong(0) > 0)
    assert(sessions.getLong(1) == QH.read(spark, dir, "events").count())
  }

  test("profile: one-pass nulls/distincts/typed min-max per column") {
    import spark.implicits._
    val d = Seq((1L, Some(2.5), "b"), (2L, None, "a"), (3L, Some(2.5), "c"))
      .toDF("id", "x", "s")
    val p = Stats.profile(d).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("id").getLong(1) == 3 && p("id").getLong(2) == 0 &&
      p("id").getLong(3) == 3)
    assert(p("x").getLong(2) == 1 && p("x").getLong(3) == 1 &&
      p("x").getDouble(4) == 2.5 && p("x").getDouble(5) == 2.5)
    assert(p("s").getString(6) == "a" && p("s").getString(7) == "c")
    // approx form runs the HLL path and stays within its error bound
    val a = Stats.profile(d, Seq("id"), approxDistinct = true).head()
    assert(math.abs(a.getLong(3) - 3L) <= 1)
  }

  test("batch sessionize equals streaming session_window on closed " +
      "sessions (same gap, same boundary semantics)") {
    val dir = TestSpark.sfDir
    val q = Streams.runStreaming(spark, s"$dir/events.parquet",
      df => Streams.sessionized(df, "30 minutes"), "t_sessions_parity")
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("t_sessions_parity")
      .select("user_id", "session_start", "n_events").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2)))
      .sorted.toSeq
    val batch = Stats.sessionize(QH.read(spark, dir, "events"),
        "user_id", "ts", 1800L, "event_id")
      .select("user_id", "t_start", "n_events").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2)))
      .sorted.toSeq
    assert(streamed == batch)
  }

  test("sessionize: gap splits sessions per key with exact durations") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00"), 1L),
      (2L, t("2024-01-01 10:10:00"), 1L),
      (3L, t("2024-01-01 11:30:00"), 1L), // > 30 min gap -> new session
      (4L, t("2024-01-01 09:00:00"), 2L))
      .toDF("event_id", "ts", "user_id")
    val got = Stats.sessionize(ev, "user_id", "ts", 1800L, "event_id")
      .orderBy("user_id", "session_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 1L, 2L, 600L * 1000000L), // 10:00-10:10
      (1L, 2L, 1L, 0L),
      (2L, 1L, 1L, 0L)))
  }

  test("funnel: chained-min order semantics — strictly-after steps, " +
      "out-of-order and same-timestamp events handled") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      // u1 completes all three in order
      (1L, t("2024-01-01 10:00:00"), "view"),
      (1L, t("2024-01-01 10:01:00"), "click"),
      (1L, t("2024-01-01 10:02:00"), "purchase"),
      // u2: click BEFORE the first view doesn't count; no click after
      (2L, t("2024-01-01 09:00:00"), "click"),
      (2L, t("2024-01-01 10:00:00"), "view"),
      // u3: click at the SAME instant as view is not strictly after
      (3L, t("2024-01-01 10:00:00"), "view"),
      (3L, t("2024-01-01 10:00:00"), "click"),
      // u4: purchase before click doesn't count toward step 3
      (4L, t("2024-01-01 10:00:00"), "view"),
      (4L, t("2024-01-01 10:01:00"), "purchase"),
      (4L, t("2024-01-01 10:02:00"), "click"),
      // u5: only noise event types
      (5L, t("2024-01-01 10:00:00"), "error"))
      .toDF("user_id", "ts", "event_type")
    val got = Stats.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, "view", 4L),      // u1 u2 u3 u4
      (2L, "click", 2L),     // u1, u4
      (3L, "purchase", 1L))) // u1
  }

  test("funnel: empty input still yields a zero row per step") {
    import spark.implicits._
    val ev = Seq.empty[(Long, java.sql.Timestamp, String)]
      .toDF("user_id", "ts", "event_type")
    val got = Stats.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click")).orderBy("step").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 0L), (2L, 0L)))
  }

  test("streaming funnel: out-of-order micro-batches converge to the " +
      "batch answer under two different slicings") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    // u1 completes all 3 but the view arrives LAST (out of order);
    // u2's click precedes its view in event time
    val evs = Seq(
      (1L, t("2024-01-01 10:01:00"), "click"),
      (1L, t("2024-01-01 10:02:00"), "purchase"),
      (2L, t("2024-01-01 09:00:00"), "click"),
      (2L, t("2024-01-01 10:00:00"), "view"),
      (1L, t("2024-01-01 10:00:00"), "view"))
    val steps = Seq("view", "click", "purchase")
    def run(slices: Seq[Seq[(Long, Timestamp, String)]],
        name: String): Map[Long, Int] = {
      val in = MemoryStream[(Long, Timestamp, String)]
      val q = graft.streaming.Streams.funnelReach(
          in.toDF().toDF("user_id", "ts", "event_type"), steps)
        .toDF().writeStream.outputMode("update").format("memory")
        .queryName(name).start()
      slices.foreach { s => in.addData(s: _*); q.processAllAvailable() }
      q.stop()
      // final answer per user = the emission with max n_seen
      spark.sql(s"""SELECT user_id, max_by(reached, n_seen)
          FROM $name GROUP BY user_id""").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    }
    val a = run(Seq(evs.take(2), evs.slice(2, 4), evs.drop(4)), "t_fa")
    val b = run(Seq(evs), "t_fb")
    val batch = graft.streaming.Streams.funnelReach(
        evs.toDF("user_id", "ts", "event_type"), steps)
      .collect().map(r => r.user_id -> r.reached).toMap
    assert(a == Map(1L -> 3, 2L -> 1))
    assert(b == a, s"slicing changed the result: $b vs $a")
    assert(batch == a, s"batch/stream divergence: $batch vs $a")
    // and the batch operator agrees with Stats.funnel's column fold
    val counts = Stats.funnel(evs.toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", steps)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val fromReach = (1 to 3).map(i =>
      i.toLong -> batch.values.count(_ >= i).toLong).toMap
    assert(counts == fromReach, s"$counts vs $fromReach")
  }

  test("stream-static enrichment: streaming run equals the batch " +
      "form (broadcast dim, no state)") {
    val dir = TestSpark.sfDir
    val dim = QH.read(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    def agg(df: org.apache.spark.sql.DataFrame) =
      graft.streaming.Streams.enrich(df, dim, "user_id", "c_custkey")
        .groupBy(coalesce(col("c_mktsegment"), lit("(unknown)"))
            .as("segment"), col("event_type"))
        .agg(count(lit(1)).as("n"))
    val q = graft.streaming.Streams.runStreaming(spark,
      s"$dir/events.parquet", agg, "t_enrich", outputMode = "complete")
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("t_enrich")
      .orderBy("segment", "event_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val batch = agg(QH.read(spark, dir, "events"))
      .orderBy("segment", "event_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(streamed == batch && batch.nonEmpty)
  }

  test("groupQuantilesDisc matches quantile_disc's ceil(p*n) " +
      "rank; robustAnomalies flags integer-exactly") {
    import spark.implicits._
    // group g1: sorted [10,20,30,40] -> q25=10, med=20, q75=30
    // (probed DuckDB convention: rank = max(1, ceil(p*n)));
    // g2: [5,5,5,500]
    val df = (Seq(40, 10, 30, 20).map(("g1", _)) ++
      Seq(5, 500, 5, 5).map(("g2", _))).toDF("g", "v")
    val qs = Stats.groupQuantilesDisc(df, "g", "v",
        Seq(("q25", 0.25), ("med", 0.5), ("q75", 0.75)))
      .collect().map(r => r.getString(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(qs("g1") == ((10, 20, 30)))
    assert(qs("g2") == ((5, 5, 5))) // IQR 0
    val flags = Stats.robustAnomalies(df, "g", "v")
      .select(col("g"), col("v"), col("is_anomaly"))
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        r.getInt(2)).toMap
    // g1: IQR 20, 3*IQR=60, |40-20|=20 -> none anomalous
    assert(Seq(10, 20, 30, 40).forall(v => flags(("g1", v)) == 0))
    // g2: IQR 0 -> any deviation from med flags
    assert(flags(("g2", 500)) == 1 && flags(("g2", 5)) == 0)
  }

  test("topPaths: consecutive n-grams per key, incomplete tails " +
      "dropped, no cross-key sequences") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val ev = Seq(
      (1L, t(0), 1L, "a"), (1L, t(1), 2L, "b"), (1L, t(2), 3L, "c"),
      (1L, t(3), 4L, "b"), (1L, t(4), 5L, "c"),
      (2L, t(0), 6L, "b"), (2L, t(1), 7L, "c"), // only 2 events: no 3-gram
      (3L, t(0), 8L, "a"), (3L, t(1), 9L, "b"), (3L, t(2), 10L, "c"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Stats.topPaths(ev, "user_id", "ts", "event_id",
        "event_type", n = 3, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // u1: a->b->c, b->c->b, c->b->c; u3: a->b->c; u2 contributes none
    assert(got == Map("a -> b -> c" -> 2L, "b -> c -> b" -> 1L,
      "c -> b -> c" -> 1L))
  }

  test("cohort: users counted once per active week, offsets in whole " +
      "weeks from Monday-truncated cohort start") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    // 2024-01-01 is a Monday
    val ev = Seq(
      (1L, t("2024-01-03 10:00:00")), // cohort wk of Jan 1
      (1L, t("2024-01-05 10:00:00")), // same week -> one row
      (1L, t("2024-01-10 10:00:00")), // week_no 1
      (2L, t("2024-01-04 10:00:00")), // cohort wk of Jan 1, only wk 0
      (3L, t("2024-01-09 10:00:00"))) // cohort wk of Jan 8
      .toDF("user_id", "ts")
    val got = Stats.cohort(ev, "user_id", "ts")
      .orderBy("cohort_week", "week_no").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 0L, 2L),
      ("2024-01-01", 1L, 1L),
      ("2024-01-08", 0L, 1L)))
  }

  test("thresholdCounter over a MemoryStream: final per-token counts " +
      "and crossed set identical under two slicings and one-shot") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    val toks: Seq[String] =
      Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(1)("c")
    def run(name: String, slices: Seq[Seq[String]]): Map[String,
        (Long, Boolean)] = {
      val in = MemoryStream[String]
      val q = graft.streaming.Streams.thresholdCounter(
          in.toDF().withColumnRenamed("value", "tok"), "tok", 4L)
        .toDF()
        .writeStream.outputMode("update").format("memory")
        .queryName(name).start()
      slices.foreach { s => in.addData(s); q.processAllAvailable() }
      q.stop()
      // final state per token = the max running count emitted
      spark.table(name).groupBy("token")
        .agg(max(col("n")).as("n"), max(col("crossed")).as("crossed"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getBoolean(2)))).toMap
    }
    val shuffled = scala.util.Random.shuffle(toks)
    val oneShot = run("thr_s1", Seq(toks))
    val sliced = run("thr_s2", Seq(toks.take(2), toks.slice(2, 6),
      toks.drop(6)))
    val arb = run("thr_s3", Seq(shuffled.take(4), shuffled.drop(4)))
    val want = Map("a" -> ((5L, true)), "b" -> ((3L, false)),
      "c" -> ((1L, false)))
    assert(oneShot == want && sliced == want && arb == want,
      s"$oneShot / $sliced / $arb")
  }

  test("intervalJoinLeftOuter: streaming emits null-extended rows " +
      "once the watermark closes the bound; equals batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    // view 1 converts in-bound; view 2 never converts; view 3's
    // purchase is OUT of the 1-hour bound
    val views = Seq((1L, 10L, t("2024-01-01 10:00:00")),
      (2L, 20L, t("2024-01-01 10:00:00")),
      (3L, 30L, t("2024-01-01 10:00:00")))
    val buys = Seq((101L, 10L, t("2024-01-01 10:30:00")),
      (103L, 30L, t("2024-01-01 12:30:00")),
      // watermark mover far past every bound
      (199L, 99L, t("2024-01-01 15:00:00")))
    val inV = MemoryStream[(Long, Long, Timestamp)]
    val inB = MemoryStream[(Long, Long, Timestamp)]
    val q = graft.streaming.Streams.intervalJoinLeftOuter(
        inV.toDF().toDF("event_id", "user_id", "ts")
          .withWatermark("ts", "10 minutes"),
        inB.toDF().toDF("event_id", "user_id", "ts")
          .withWatermark("ts", "10 minutes"),
        "user_id", "ts", "1 HOUR")
      .writeStream.outputMode("append").format("memory")
      .queryName("ilo").start()
    inV.addData(views: _*); inB.addData(buys.take(2): _*)
    q.processAllAvailable()
    // the GLOBAL watermark is the min over both inputs — advance
    // BOTH sides past every bound, then one more batch so the
    // outer-join state flushes its null-extended rows
    inV.addData((91L, 97L, t("2024-01-01 15:00:00")))
    inB.addData(buys.drop(2): _*)
    q.processAllAvailable()
    inV.addData((92L, 96L, t("2024-01-01 16:00:00")))
    inB.addData((198L, 98L, t("2024-01-01 16:00:00")))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql(
      """SELECT l_event_id, r_event_id FROM ilo
         WHERE l_event_id IS NOT NULL AND l_event_id < 90""").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(got == Set(1L -> 101L, 2L -> -1L, 3L -> -1L), s"got $got")
    // batch form agrees
    val batch = graft.streaming.Streams.intervalJoinLeftOuter(
        views.toDF("event_id", "user_id", "ts"),
        buys.toDF("event_id", "user_id", "ts"),
        "user_id", "ts", "1 HOUR")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(batch == got, s"batch $batch vs stream $got")
  }

  test("sessionFunnelReach: streaming == relational batch under two " +
      "slicings + out-of-order arrival; TTL closes and finalizes " +
      "idle users") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val steps = Seq("view", "click", "purchase")
    // u1: session A (view 10:00, click 10:01 — reach 2) then after a
    // >30min gap session B (view 11:00, purchase 11:01 — reach 1,
    // purchase without click doesn't advance); u2: one full session
    // (reach 3). u1's session-A view arrives OUT OF ORDER (after its
    // click) in the sliced run — the open-session key supersession
    // case. u99 is the watermark mover.
    val evs = Seq(
      (2L, t("2024-01-01 09:00:00"), "view"),
      (2L, t("2024-01-01 09:10:00"), "click"),
      (2L, t("2024-01-01 09:20:00"), "purchase"),
      (1L, t("2024-01-01 10:01:00"), "click"),
      (1L, t("2024-01-01 10:00:00"), "view"),
      (1L, t("2024-01-01 11:00:00"), "view"),
      (1L, t("2024-01-01 11:01:00"), "purchase"))
    val expect = Map(
      (1L, t("2024-01-01 10:00:00")) -> ((2, 2)),
      (1L, t("2024-01-01 11:00:00")) -> ((1, 2)),
      (2L, t("2024-01-01 09:00:00")) -> ((3, 3)))
    def run(slices: Seq[Seq[(Long, Timestamp, String)]], name: String,
        withMover: Boolean): (Map[(Long, Timestamp), (Int, Int)],
          Map[(Long, Timestamp), (Int, Int)]) = {
      val in = MemoryStream[(Long, Timestamp, String)]
      val q = graft.streaming.Streams.sessionFunnelReach(
          in.toDF().toDF("user_id", "ts", "event_type")
            .withWatermark("ts", "1 hour"),
          steps, gapSec = 1800L, ttlSec = 3600L)
        .toDF().writeStream.outputMode("update").format("memory")
        .queryName(name).start()
      slices.foreach { s => in.addData(s: _*); q.processAllAvailable() }
      if (withMover) {
        // push the watermark past last event + ttl, then one more
        // batch so the pending event-time timeouts actually fire
        in.addData((99L, t("2024-01-01 14:00:00"), "view"))
        q.processAllAvailable()
        in.addData((99L, t("2024-01-01 14:00:30"), "view"))
        q.processAllAvailable()
      }
      q.stop()
      // latest emission per (user, session_start) = max n_events
      // (state only grows while a key is live)
      def agg(extra: String) = spark.sql(
        s"""SELECT user_id, session_start,
            max_by(n_reached, n_events), max(n_events)
            FROM $name WHERE user_id < 99 $extra
            GROUP BY user_id, session_start""").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1)) ->
          ((r.getInt(2), r.getInt(3)))).toMap
      (agg(""), agg("AND closed"))
    }
    val (a, _) = run(Seq(evs), "sfr_a", withMover = false)
    val (b, bClosed) = run(
      Seq(evs.take(3), evs.slice(3, 4), evs.slice(4, 5), evs.drop(5)),
      "sfr_b", withMover = true)
    // all-emissions view may carry superseded open keys (u1's
    // out-of-order view moves session A's start 10:01 -> 10:00);
    // every TRUE key must hold the exact batch value
    expect.foreach { case (k, v) =>
      assert(a.get(k).contains(v), s"a: $k -> ${a.get(k)}, want $v")
      assert(b.get(k).contains(v), s"b: $k -> ${b.get(k)}, want $v")
    }
    // TTL: after the watermark passes last event + ttl, every true
    // session has been emitted CLOSED with final values (state freed)
    assert(bClosed == expect, s"closed: $bClosed")
    // relational twin: exact same rows
    val rel = graft.functions.Stats.sessionFunnel(
        evs.toDF("user_id", "ts", "event_type"), "user_id", "ts",
        "event_type", "event_type", 1800L, steps)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1)) ->
        ((r.getInt(2), r.getLong(3).toInt))).toMap
    assert(rel == expect, s"relational: $rel")
    // streaming operator in BATCH mode (the q252 oracle path): all
    // open, same rows
    val batch = graft.streaming.Streams.sessionFunnelReach(
        evs.toDF("user_id", "ts", "event_type"), steps, 1800L, 3600L)
      .collect()
    assert(batch.forall(!_.closed))
    assert(batch.map(r => (r.user_id, r.session_start) ->
      ((r.n_reached, r.n_events))).toMap == expect)
  }
}
