package graft

import graft.ops.Experiment
import org.apache.spark.sql.functions._

/** Hand case for multi-arm pairwise contrasts under BH. */
class PairwiseArmsSpec extends SparkSuite {
  import spark.implicits._

  override protected def withFixture(test: NoArgTest) =
    try super.withFixture(test) finally graft.Caches.release()

  test("three arms: the extreme pair ranks first, step-up " +
      "rejections are a prefix of the rank order") {
    def arm(a: String, succ: Int, fail: Int) =
      Seq.fill(succ)((a, 1L)) ++ Seq.fill(fail)((a, 0L))
    val df = (arm("A", 2, 8) ++ arm("B", 5, 5) ++ arm("C", 8, 2))
      .toDF("arm", "y")
    val out = Experiment.pairwiseArms(df, col("arm"), col("y"))
      .collect()
    assert(out.length == 3)
    val first = out(0)
    assert(first.getAs[String]("arm_a") == "A" &&
      first.getAs[String]("arm_b") == "C")
    // z(A,C) = (0.2 - 0.8) / sqrt(0.5*0.5*(0.2)) by hand
    val zAC = -0.6 / math.sqrt(0.5 * 0.5 * 0.2)
    assert(first.getAs[Double]("z") == math.rint(zAC * 1e6) / 1e6)
    // rejections form a prefix of the rank order (step-up rule)
    val rej = out.sortBy(_.getAs[Long]("rank"))
      .map(_.getAs[Long]("rejected"))
    assert(!rej.sliding(2).exists(p => p(0) == 0L && p(1) == 1L))
  }

  test("two arms are refused (abTest's venue); symmetric arms " +
      "yield z = 0 and no rejections") {
    def arm(a: String, succ: Int, fail: Int) =
      Seq.fill(succ)((a, 1L)) ++ Seq.fill(fail)((a, 0L))
    val two = (arm("A", 2, 8) ++ arm("B", 5, 5)).toDF("arm", "y")
    val e = intercept[IllegalArgumentException] {
      Experiment.pairwiseArms(two, col("arm"), col("y"))
    }
    assert(e.getMessage.contains("arms"))

    val sym = (arm("A", 5, 5) ++ arm("B", 5, 5) ++ arm("C", 5, 5))
      .toDF("arm", "y")
    val out = Experiment.pairwiseArms(sym, col("arm"), col("y"))
      .collect()
    assert(out.forall(_.getAs[Double]("z") == 0.0))
    assert(out.forall(_.getAs[Long]("rejected") == 0L))
  }
}
