package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** Hand-chain cases for Markov removal-effect attribution: a
  * three-user journey set whose absorbing-chain probabilities and
  * removal effects compute by pencil, pinning the integer value
  * iteration independently of the oracle's unrolled replay.
  */
class MarkovAttrSpec extends SparkSuite {
  import spark.implicits._

  private def ev(rows: Seq[(Long, String, Long, Long)]) =
    rows.toDF("user_id", "event_type", "__tl", "event_id")
      .withColumn("ts", timestamp_seconds(col("__tl"))).drop("__tl")

  test("hand chain: p(start) and removal effects match the pencil " +
      "absorbing-chain solution") {
    // u1: view -> conv; u2: view -> (no conv); u3: click -> conv
    // census: start->view 2, start->click 1, view->conv 1,
    //         view->null 1, click->conv 1
    // p(view)=5e8, p(click)=1e9, p(start)=floor(2e9/3)=666666666
    // removing either channel leaves p(start)=333333333 -> 500000ppm
    val df = ev(Seq(
      (1L, "view", 10L, 1L), (1L, "purchase", 20L, 2L),
      (2L, "view", 10L, 3L),
      (3L, "click", 10L, 4L), (3L, "purchase", 20L, 5L)))
    val out = Streams.markovRemovalEffects(df, Seq("click", "view"),
      "purchase").collect()
    assert(out.map(_.getAs[String]("channel")).toSeq ==
      Seq("click", "view"))
    out.foreach { r =>
      assert(r.getAs[Long]("p_conv_q") == 666666666L)
      assert(r.getAs[Long]("p_removed_q") == 333333333L)
      assert(r.getAs[Long]("removal_ppm") == 500000L)
    }
  }

  test("a touchless converter adds start->conv mass that no " +
      "removal can take away") {
    // u1: view -> conv; u2 converts with no touches
    // census: start->view 1, view->conv 1, start->conv 1
    // p(start) = (1e9 + 1e9)/2 = 1e9; removing view:
    // (0 + 1e9)/2 = 5e8 -> removal 500000 ppm, not 1e6
    val df = ev(Seq(
      (1L, "view", 10L, 1L), (1L, "purchase", 20L, 2L),
      (2L, "purchase", 20L, 3L)))
    val out = Streams.markovRemovalEffects(df, Seq("view"),
      "purchase").collect()(0)
    assert(out.getAs[Long]("p_conv_q") == 1000000000L)
    assert(out.getAs[Long]("p_removed_q") == 500000000L)
    assert(out.getAs[Long]("removal_ppm") == 500000L)
  }

  test("touches after the first conversion are not part of the " +
      "journey; null-ts events are ignored") {
    // u1's click happens AFTER the purchase -> journey is view->conv
    val df = ev(Seq(
      (1L, "view", 10L, 1L), (1L, "purchase", 20L, 2L),
      (1L, "click", 30L, 3L)))
    val out = Streams.markovRemovalEffects(df, Seq("click", "view"),
      "purchase").collect()
    val byCh = out.map(r =>
      r.getAs[String]("channel") -> r.getAs[Long]("removal_ppm"))
      .toMap
    assert(byCh("view") == 1000000L) // the whole journey dies
    assert(byCh("click") == 0L)      // never in the pre-conv chain
  }
}
