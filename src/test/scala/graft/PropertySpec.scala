package graft

import graft.encode.Encode
import graft.exprlang.{Formula, Expr, Parser}
import graft.ops.Joins
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based tests (SURVEY §5 strategy): the formula compiler
  * agrees with a local interpreter on random expression trees; encode
  * round-trips are lossless; join cardinalities follow the m:n law.
  */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  /** Deterministic scalacheck sampling (the scalatest bridge artifact
    * is not on the offline classpath; explicit seeds keep runs
    * reproducible).
    */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  // ---- random arithmetic formulas vs a local evaluator --------------

  private sealed trait T
  private case class Leaf(s: String) extends T
  private case class Node(op: String, l: T, r: T) extends T

  private def genTree(depth: Int): Gen[T] =
    if (depth == 0)
      Gen.oneOf(Gen.const(Leaf("c")), Gen.const(Leaf("D")),
        Gen.choose(1, 9).map(n => Leaf(n.toString)))
    else Gen.oneOf(
      genTree(0),
      for {
        op <- Gen.oneOf("+", "-", "*")
        l <- genTree(depth - 1)
        r <- genTree(depth - 1)
      } yield Node(op, l, r))

  private def render(t: T): String = t match {
    case Leaf(s) => s
    case Node(op, l, r) => s"(${render(l)} $op ${render(r)})"
  }

  private def local(t: T, c: Double, d: Double): Double = t match {
    case Leaf("c") => c
    case Leaf("D") => d
    case Leaf(n) => n.toDouble
    case Node("+", l, r) => local(l, c, d) + local(r, c, d)
    case Node("-", l, r) => local(l, c, d) - local(r, c, d)
    case Node("*", l, r) => local(l, c, d) * local(r, c, d)
    case _ => throw new MatchError(t)
  }

  test("compiler agrees with a local evaluator on random arithmetic " +
      "trees (parser.go precedence + eval semantics)") {
    val trees = Gen.listOfN(30, genTree(3)).sample.get
    val df = corpusPipe
    trees.foreach { t =>
      val f = render(t)
      val got = col1(Formula.addToPipe(df, "out", f, Some("__seq")), "out")
        .map(_.asInstanceOf[Double])
      val want = Seq(local(t, 1.0, 3.0), local(t, 2.0, 10.0))
      got.zip(want).foreach { case (g, w) =>
        assert(math.abs(g - w) < 1e-9, s"formula $f: got $got want $want")
      }
    }
  }

  test("parser precedence: flat renders match parenthesized evaluation") {
    // a + b * c ^ d style flat strings, evaluated by precedence
    val cases = Seq(
      ("2 + 3 * 4", 14.0), ("2 * 3 + 4", 10.0), ("2 + 3 ^ 2", 11.0),
      ("2 * 3 ^ 2", 18.0), ("-2 ^ 2", 4.0), ("2 - 3 - 4", -5.0),
      ("24 / 4 / 3", 2.0))
    cases.foreach { case (f, want) =>
      val got = col1(Formula.addToPipe(corpusPipe, "out", f, Some("__seq")),
        "out").head.asInstanceOf[Double]
      assert(math.abs(got - want) < 1e-12, s"$f: got $got want $want")
    }
  }

  // ---- encode round-trips ------------------------------------------

  test("label encode/decode round-trips arbitrary string sets") {
    samples(Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty)), 10)
      .filter(_.nonEmpty).foreach { values =>
        val df = values.toDF("x")
        val (enc, meta) = Encode.appendD(df, "x", "xe")
        val back = enc.select(col("x"),
          Encode.decodeD(col("xe"), meta).as("back"))
          .where(col("x") =!= col("back"))
        assert(back.count() == 0)
      }
  }

  test("z-score round-trip is within double tolerance for random data") {
    samples(Gen.listOfN(20, Gen.choose(-1e6, 1e6)), 10)
      .filter(_.distinct.length > 1).foreach { values =>
        val df = values.toDF("x")
        val (enc, meta) = Encode.appendC(df, "x", "xz", normalize = true)
        val bad = enc.select(col("x"),
          Encode.unNormalize(col("xz"), meta).as("back"))
          .where(abs(col("x") - col("back")) > lit(1e-6))
        assert(bad.count() == 0)
      }
  }

  // ---- join cardinality law ----------------------------------------

  test("inner join count = sum over keys of |L_k| * |R_k| " +
      "(m:n cross product, gdata_test.go:474-490)") {
    samples(Gen.zip(Gen.listOfN(20, Gen.choose(0, 5)),
      Gen.listOfN(20, Gen.choose(0, 5))), 8).foreach { case (lk, rk) =>
        val l = lk.zipWithIndex.map { case (k, i) => (k, i) }.toDF("k", "lv")
        val r = rk.zipWithIndex.map { case (k, i) => (k, i) }.toDF("k", "rv")
        val expected = (0 to 5).map(k =>
          lk.count(_ == k).toLong * rk.count(_ == k)).sum
        assert(Joins.join(l, r, "k", "inner").count() == expected)
      }
  }

  test("left join with defaults never yields nulls") {
    samples(Gen.zip(Gen.listOfN(10, Gen.choose(0, 8)),
      Gen.listOfN(5, Gen.choose(0, 8))), 8).foreach { case (lk, rk) =>
        val l = lk.zipWithIndex.map { case (k, i) => (k, i) }.toDF("k", "lv")
        val r = rk.distinct.map(k => (k, k * 1.5)).toDF("k", "rv")
        val j = Joins.join(l, r, "k", "left")
        assert(j.where(col("rv").isNull).count() == 0)
      }
  }

  test("spanDedup with minDocs above the corpus size is the identity " +
      "on token streams (random docs)") {
    import graft.llmdata.Dedup
    val words = Gen.listOfN(12,
      Gen.oneOf("a", "b", "c", "d", "e")).map(_.mkString(" "))
    val docs = samples(words, 6).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Dedup.spanDedup(docs, "doc_id", "text", spanTokens = 4,
        minDocs = 100)
      .orderBy("doc_id").collect()
    val orig = docs.orderBy("doc_id").collect().map(_.getString(1))
    got.zip(orig).foreach { case (r, t) =>
      assert(r.getLong(2) == 0L) // n_removed
      assert(r.getString(3) == t) // kept_text reassembles exactly
    }
  }

  test("sessionize conserves events and never exceeds the gap inside " +
      "a session (random timestamps)") {
    import graft.functions.Stats
    val ts = Gen.listOfN(40, Gen.choose(0L, 100000L))
    samples(ts, 4).zipWithIndex.foreach { case (offsets, s) =>
      val ev = offsets.zipWithIndex.map { case (off, i) =>
        (i.toLong, new java.sql.Timestamp(1700000000000L + off * 1000L),
          (i % 3).toLong)
      }.toDF("event_id", "ts", "user_id")
      val sess = Stats.sessionize(ev, "user_id", "ts", 1800L, "event_id")
      assert(sess.agg(sum(col("n_events"))).head().getLong(0) == 40L,
        s"seed $s lost events")
      // a session's span is bounded by (n_events - 1) * gap
      val bad = sess.where(col("duration_us") >
        (col("n_events") - 1) * 1800L * 1000000L).count()
      assert(bad == 0L, s"seed $s has a session wider than its gaps allow")
    }
  }

  test("profile agrees with direct per-column aggregates (random " +
      "nullable data)") {
    import graft.functions.Stats
    val rows = Gen.listOfN(30, for {
      v <- Gen.option(Gen.choose(-50, 50))
      s <- Gen.oneOf("x", "y", "z")
    } yield (v.map(_.toDouble), s))
    samples(rows, 3).foreach { data =>
      val df = data.zipWithIndex
        .map { case ((v, s), i) => (i.toLong, v, s) }.toDF("id", "v", "s")
      val p = Stats.profile(df).collect()
        .map(r => r.getString(0) -> r).toMap
      assert(p("v").getLong(2) == df.where(col("v").isNull).count())
      assert(p("v").getLong(3) ==
        df.where(col("v").isNotNull).select("v").distinct().count())
      assert(p("s").getString(6) ==
        df.agg(min(col("s"))).head().getString(0))
    }
  }

  test("semanticDedup survivors are monotone in eps and always keep " +
      "the lowest id (exact config, random vectors)") {
    import graft.llmdata.Similarity
    val vecs = Gen.listOfN(12, Gen.listOfN(4,
      Gen.choose(-5, 5).map(_.toFloat)))
    samples(vecs, 3).foreach { vs =>
      val df = vs.zipWithIndex
        .map { case (v, i) => (i.toLong, v.toArray) }
        .toDF("vec_id", "embedding")
      def surv(eps: Double) = Similarity
        .semanticDedup(df, "vec_id", "embedding", eps, nCells = 1)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val tight = surv(0.99); val loose = surv(0.6)
      assert(loose.subsetOf(tight),
        s"lower eps must drop at least as much: $loose vs $tight")
      assert(tight.contains(0L) && loose.contains(0L),
        "the lowest id has no earlier neighbor and must survive")
    }
  }
}
