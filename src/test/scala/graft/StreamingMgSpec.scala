package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** Streaming Misra-Gries: the hand-computable fold, the superset
  * guarantee, and the slicing-invariance of the exact downstream
  * composition (the arrival-order contract mgSketch documents).
  */
class StreamingMgSpec extends SparkSuite {
  import spark.implicits._

  test("mgSketch batch fold matches the hand-run MG(2) summary") {
    // one bucket so the fold is the textbook single summary;
    // stream: a a b c a  ->  after: a:2 (a3 decremented by c), then
    // hand-run: a(1) a(2) b(1) | c arrives, map full -> all -1 ->
    // {a:1}; a -> {a:2}
    val toks = Seq("a", "a", "b", "c", "a").toDF("tok")
    val got = Streams.mgSketch(toks, "tok", k = 2, buckets = 1)
      .collect().map(c => (c.token, c.lower)).toMap
    assert(got == Map("a" -> 2L), s"got $got")
  }

  test("mgHeavyHittersBatch is exact at the global bar") {
    // 100 x "hot", 40 x "warm", 60 singletons; k=4 -> bar n/(k+1)=40
    val toks = (Seq.fill(100)("hot") ++ Seq.fill(40)("warm") ++
      (1 to 60).map(i => s"cold$i")).toDF("tok")
    val got = Streams.mgHeavyHittersBatch(toks, "tok", k = 4,
        buckets = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    Caches.release()
    // exact filter: cnt*5 > 200 -> hot (500>200) yes, warm (200>200) no
    assert(got == Map("hot" -> 100L), s"got $got")
  }

  test("readStream: two slicings both satisfy the superset " +
      "guarantee and the exact composition is slicing-invariant") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    val stream = (Seq.fill(30)("x") ++ Seq.fill(12)("y") ++
      (1 to 20).map(i => s"z$i")).toVector
    val k = 3 // per-bucket bar: n_b/4

    def candidates(name: String,
        slices: Seq[Seq[String]]): Set[String] = {
      val in = MemoryStream[String]
      val run = Streams.mgSketch(in.toDF()
            .select(col("value").as("tok")), "tok", k, buckets = 2)
        .toDF()
        .writeStream.outputMode("update").format("memory")
        .queryName(name).start()
      slices.foreach { s => in.addData(s); run.processAllAvailable() }
      run.stop()
      // final state per bucket = the emissions at its max n
      val t = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      val mx = t.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      t.filter { case (b, n, _) => n == mx(b) }.map(_._3).toSet
    }

    val s1 = candidates("mg_s1",
      Seq(stream.take(20), stream.slice(20, 45), stream.drop(45)))
    val shuffled = new scala.util.Random(7).shuffle(stream)
    val s2 = candidates("mg_s2",
      Seq(shuffled.take(31), shuffled.drop(31)))

    // true counts: x=30, y=12, z*=1 each; n=62 across 2 buckets.
    // Guarantee: any token over n_b/(k+1) in its bucket survives; x
    // dominates any bucket split (30 > 62/4), so x must be present
    // in BOTH runs whatever the arrival order.
    assert(s1.contains("x") && s2.contains("x"))

    // exact composition: recount candidates, global bar cnt*4 > 62
    def exact(c: Set[String]): Set[(String, Long)] = {
      val counts = stream.groupBy(identity)
        .map { case (t, v) => t -> v.size.toLong }
      c.toSeq.map(t => t -> counts(t))
        .filter { case (_, n) => n * (k + 1) > stream.size }
        .toSet
    }
    assert(exact(s1) == exact(s2))
    assert(exact(s1) == Set("x" -> 30L))
  }
}
