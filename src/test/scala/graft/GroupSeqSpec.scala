package graft

import graft.ops.Experiment
import org.apache.spark.sql.functions._

/** Hand case for group-sequential OBF monitoring: a two-look design
  * whose cumulative z values and boundary crossings compute by
  * pencil.
  */
class GroupSeqSpec extends SparkSuite {
  import spark.implicits._

  // the A&S 26.2.23 inverse upper-tail quantile, mirrored exactly
  private def invPhi(p: Double): Double = {
    val t = math.sqrt(-2.0 * math.log(p))
    t - (2.515517 + t * (0.802853 + t * 0.010328)) /
      (1.0 + t * (1.432788 + t * (0.189269 + t * 0.001308)))
  }

  test("two looks: a null first look stays inside the inflated " +
      "boundary; a strong second look crosses at the final one") {
    // look 1: both arms 5/10 -> z = 0
    // look 2 cumulative: A 15/20, B 5/20 -> z = 0.5/sqrt(0.025)
    def rows(look: Long, arm: Int, succ: Int, fail: Int) =
      Seq.fill(succ)((look, arm, 1L)) ++ Seq.fill(fail)((look, arm, 0L))
    val df = (rows(1L, 0, 5, 5) ++ rows(1L, 1, 5, 5) ++
      rows(2L, 0, 10, 0) ++ rows(2L, 1, 0, 10))
      .toDF("look", "arm", "y")
    val out = Experiment.groupSequentialObf(df, col("look"),
      col("arm") === 1, col("y"), totalLooks = 2)
      .collect().sortBy(_.getAs[Long]("k"))

    val za = invPhi(0.025)
    val l1 = out(0)
    assert(l1.getAs[Double]("z") == 0.0)
    assert(l1.getAs[Double]("boundary") ==
      math.rint(za * math.sqrt(2.0) * 1e6) / 1e6)
    assert(l1.getAs[Int]("crossed") == 0)
    assert(l1.getAs[Int]("is_first_crossing") == 0)

    val l2 = out(1)
    val z2 = 0.5 / math.sqrt(0.5 * 0.5 * (1.0 / 20 + 1.0 / 20))
    assert(l2.getAs[Double]("z") == math.rint(z2 * 1e6) / 1e6)
    assert(l2.getAs[Double]("boundary") ==
      math.rint(za * 1e6) / 1e6)
    assert(l2.getAs[Int]("crossed") == 1)
    assert(l2.getAs[Int]("is_first_crossing") == 1)
  }

  test("a degenerate look reports NULL z and cannot cross; the " +
      "look-count contract is enforced") {
    val df = (Seq.fill(4)((1L, 0, 0L)) ++ Seq.fill(4)((1L, 1, 0L)) ++
      Seq.fill(4)((2L, 0, 1L)) ++ Seq.fill(4)((2L, 1, 0L)))
      .toDF("look", "arm", "y")
    val out = Experiment.groupSequentialObf(df, col("look"),
      col("arm") === 1, col("y"), totalLooks = 2)
      .collect().sortBy(_.getAs[Long]("k"))
    assert(out(0).isNullAt(out(0).fieldIndex("z")))
    assert(out(0).getAs[Int]("crossed") == 0)
    val e = intercept[IllegalArgumentException] {
      Experiment.groupSequentialObf(df, col("look"),
        col("arm") === 1, col("y"), totalLooks = 5)
    }
    assert(e.getMessage.contains("looks"))
  }
}
