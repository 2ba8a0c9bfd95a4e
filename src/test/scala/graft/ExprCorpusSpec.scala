package graft

import graft.exprlang.Formula

/** The reference's expression corpus (seafan parser_test.go:861-969):
  * formula strings over the 2-row pipe c=[1,2], D=[3,10], asserted
  * against the reference's evaluation semantics (arithmetic in
  * float64, 0/1 logicals, broadcasting scalars).
  */
class ExprCorpusSpec extends SparkSuite {

  private def eval(formula: String): Seq[Double] = {
    val df = Formula.addToPipe(corpusPipe, "out", formula, Some("__seq"))
    col1(df, "out").map(_.asInstanceOf[Double])
  }

  private val cases: Seq[(String, Seq[Double])] = Seq(
    // arithmetic + precedence (parser_test.go:905 "c+3*D" expects ^ to
    // bind tighter than * / then +/-)
    "c+3*D" -> Seq(10.0, 32.0),
    "c-3*D" -> Seq(-8.0, -28.0),
    "c*D" -> Seq(3.0, 20.0),
    "D/c" -> Seq(3.0, 5.0),
    "c^2" -> Seq(1.0, 4.0),
    "2^c" -> Seq(2.0, 4.0),
    "-c+D" -> Seq(2.0, 8.0),
    "-(c-D)" -> Seq(2.0, 8.0),
    "(c+D)*2" -> Seq(8.0, 24.0),
    "c+D*c^2" -> Seq(4.0, 42.0),
    // comparisons: float64 0/1 (parser.go:1502-1578)
    "c==1" -> Seq(1.0, 0.0),
    "c!=1" -> Seq(0.0, 1.0),
    "D>3" -> Seq(0.0, 1.0),
    "D>=3" -> Seq(1.0, 1.0),
    "c<2 && D<4" -> Seq(1.0, 0.0),
    "c<2 || D>4" -> Seq(1.0, 1.0),
    // if(): cond > 0 selects (parser.go:506-523)
    "if(c>1 && D>2, 1, 0)" -> Seq(0.0, 1.0),
    "if(c==1, D, c)" -> Seq(3.0, 2.0),
    // math functions
    "exp(log(c))" -> Seq(1.0, 2.0),
    "abs(0-D)" -> Seq(3.0, 10.0),
    "pow(c, 3)" -> Seq(1.0, 8.0),
    "sqrt(c*c)" -> Seq(1.0, 2.0),
    "maxE(c, 1.5)" -> Seq(1.5, 2.0),
    "minE(D, 5)" -> Seq(3.0, 5.0),
    // order-dependent (data.go:458-550)
    "row(c)" -> Seq(0.0, 1.0),
    "countBefore(c)" -> Seq(1.0, 2.0),
    "countAfter(c)" -> Seq(2.0, 1.0),
    "cumeBefore(c)" -> Seq(1.0, 3.0),
    "cumeAfter(D)" -> Seq(13.0, 10.0),
    "prodBefore(D)" -> Seq(3.0, 30.0),
    "prodAfter(c)" -> Seq(2.0, 2.0),
    // summary functions broadcast the scalar (parser.go:1721-1728)
    "sum(c)" -> Seq(3.0, 3.0),
    "mean(D)" -> Seq(6.5, 6.5),
    "max(D)" -> Seq(10.0, 10.0),
    "min(c)" -> Seq(1.0, 1.0),
    "median(c)" -> Seq(1.5, 1.5),
    "sum(c) - npv(0.0, D)" -> Seq(-10.0, -10.0),
    // mixed summary + row level (parser_test.go:868 pattern)
    "c + sum(c)" -> Seq(4.0, 5.0),
    "sse(D, c)" -> Seq(68.0, 68.0),
    "mad(D, c)" -> Seq(10.0, 10.0),
    // nested calls + composed summary/row mixes
    "if(c == max(c), 1, 0)" -> Seq(0.0, 1.0),
    "exp(log(D)) - D" -> Seq(0.0, 0.0),
    "maxE(minE(c, D), 1.5)" -> Seq(1.5, 2.0),
    "(c > mean(c)) + (D > mean(D))" -> Seq(0.0, 2.0),
    "abs(c - D) ^ 2" -> Seq(4.0, 64.0),
    "pow(2, row(c))" -> Seq(1.0, 2.0),
    "cumeBefore(c) / countBefore(c)" -> Seq(1.0, 1.5),
    "std(c) * std(c)" -> Seq(0.5, 0.5),
    "r2(D, D)" -> Seq(1.0, 1.0),
    "sum(c * D) - npv(0.0, c * D)" -> Seq(0.0, 0.0),
    // regressions: an S-function nested in an effect/eager function
    // must register on the probe pass (print) or evaluate eagerly
    // (npv/irr args), and must not shift the batched-aggregate
    // substitution order of S-terms that follow it
    "print(sum(c), 1) + mean(D)" -> Seq(7.5, 7.5),
    "sum(c) + npv(mean(c) - 1.5, D)" -> Seq(16.0, 16.0),
    "npv(mean(c) - 1.5, D) + std(c)*std(c)" -> Seq(13.5, 13.5),
    "irr(mean(c) * 0, D) + sum(c)" -> Seq(3.0, 3.0))

  cases.foreach { case (formula, expected) =>
    test(s"corpus: $formula") {
      val got = eval(formula)
      expected.zip(got).foreach { case (e, g) =>
        assert(math.abs(e - g) < 1e-9,
          s"$formula: expected $expected got $got")
      }
    }
  }

  test("string comparison routes through native types (evalOpsCat)") {
    import spark.implicits._
    val df = Seq(("a", 0L), ("b", 1L)).toDF("s", "__seq")
    val out = Formula.addToPipe(df, "eq", "s == 'a'", Some("__seq"))
    assert(col1(out, "eq") == Seq(1.0, 0.0))
  }

  test("division by zero errors (parser.go:1537), not null") {
    val ex = intercept[Exception] {
      Formula.addToPipe(corpusPipe, "bad", "c / (c - 1)", Some("__seq"))
        .collect()
    }
    assert(ex.getMessage.toLowerCase.contains("division by zero"))
  }

  test("strCount with an empty search string errors cleanly (the " +
      "reference's skip=0 scan never terminates, parser.go:1006-1018)") {
    import spark.implicits._
    val df = Seq(("hello", 0L)).toDF("s", "__seq")
    val ex = intercept[Exception] {
      Formula.addToPipe(df, "n", "strCount(s, '')", Some("__seq"))
        .collect()
    }
    assert(ex.getMessage.toLowerCase.contains("empty search string"))
  }

  test("log of non-positive errors (data.go:566)") {
    val ex = intercept[Exception] {
      Formula.addToPipe(corpusPipe, "bad", "log(c - 1)", Some("__seq"))
        .collect()
    }
    assert(ex.getMessage.toLowerCase.contains("log"))
  }

  test("lag shifts one row, first row takes the coerced missing value " +
      "(data.go:531-550)") {
    // reference semantics: lag(x, missing) fills the first element
    // with `missing`, not null
    assert(eval("lag(c, 0)") == Seq(0.0, 1.0))
    assert(eval("lag(c, 0) + 1") == Seq(1.0, 2.0))
    assert(eval("lag(c, -9.5)") == Seq(-9.5, 1.0))
  }

  test("exist() resolves field else fallback (parser.go:1595-1601)") {
    assert(eval("exist(c, 99)") == Seq(1.0, 2.0))
    assert(eval("exist(zzz, 99)") == Seq(99.0, 99.0))
  }

  test("Loop re-evaluates with substituted loop variable") {
    import spark.implicits._
    val df = Seq((1.0, 0L)).toDF("x", "__seq")
    // x := x + i for i in 0..3  =>  1 + 0 + 1 + 2 = 4
    val out = Formula.loop(df, "i", 0, 3, Seq("x" -> "x + i"), Some("__seq"))
    assert(col1(out, "x") == Seq(4.0))
  }

  test("date literals parse CCYYMMDD and MM/DD/CCYY (parser.go:71)") {
    import spark.implicits._
    val df = Seq((java.sql.Date.valueOf("2023-03-01"), 0L))
      .toDF("d", "__seq")
    val out = Formula.addToPipe(df, "same", "if(d == '20230301', 1, 0)",
      Some("__seq"))
    assert(col1(out, "same") == Seq(1.0))
    val out2 = Formula.addToPipe(df, "same2", "if(d == '3/1/2023', 1, 0)",
      Some("__seq"))
    assert(col1(out2, "same2") == Seq(1.0))
  }

  test("dateDiff calendar month semantics (parser.go:904-915)") {
    import spark.implicits._
    val df = Seq((java.sql.Date.valueOf("2023-03-31"),
      java.sql.Date.valueOf("2023-02-01"), 0L)).toDF("d1", "d2", "__seq")
    // month diff = 12*(y1-y2) + (m1-m2) = 1, regardless of days
    val out = Formula.addToPipe(df, "md", "dateDiff(d1, d2, 'month')",
      Some("__seq"))
    assert(col1(out, "md") == Seq(1.0))
    val out2 = Formula.addToPipe(df, "yd", "dateDiff(d1, d2, 'year')",
      Some("__seq"))
    assert(col1(out2, "yd") == Seq(0.0))
  }

  test("strPos returns -1 when absent, 1-based else (parser.go:1090)") {
    import spark.implicits._
    val df = Seq(("hello", 0L)).toDF("s", "__seq")
    assert(col1(Formula.addToPipe(df, "p", "strPos(s, 'll')", Some("__seq")),
      "p") == Seq(3.0))
    assert(col1(Formula.addToPipe(df, "p", "strPos(s, 'z')", Some("__seq")),
      "p") == Seq(-1.0))
  }

  test("substr is 1-based (parser.go:928-976)") {
    import spark.implicits._
    val df = Seq(("hello", 0L)).toDF("s", "__seq")
    assert(col1(Formula.addToPipe(df, "x", "substr(s, 2, 3)", Some("__seq")),
      "x") == Seq("ell"))
  }

  test("index(x, i) gathers by position from the formula surface " +
      "(parser.go:1379, data.go:641-660); out-of-bounds errors") {
    // corpus pipe: c=[1,2] at seq 0,1; positions c-1 = [0,1] -> c
    // itself; positions 1-(c-1) = [1,0] -> c reversed
    assert(eval("index(c, c-1)") == Seq(1.0, 2.0))
    assert(eval("index(c, 1-(c-1))") == Seq(2.0, 1.0))
    val ex = intercept[Exception] {
      eval("index(c, D)") // positions [3,10] past the 2-row frame
    }
    assert(ex.getMessage.contains("out of bounds") ||
      ex.getCause != null)
  }

  test("a formula with several S-terms runs ONE aggregate query " +
      "(batched scalar fan-out), values unchanged") {
    // count SQL EXECUTIONS, not Spark jobs — AQE legitimately splits
    // one query into a job per materialized stage
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          ns: Long): Unit = counter.incrementAndGet()
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val pipe = corpusPipe
    val c = try {
      // compile-time: the batched agg runs here (head() blocks; only
      // listener delivery lag remains — poll briefly for stragglers)
      val out = exprlang.Formula.column(pipe,
        "(c - mean(c)) / std(c) + sum(D) + count(c)")
      val deadline = System.nanoTime() + 2_000_000_000L
      while (counter.get() < 1 && System.nanoTime() < deadline)
        Thread.sleep(20)
      Thread.sleep(300) // catch any extra (unexpected) executions
      out
    } finally spark.listenerManager.unregister(listener)
    assert(counter.get() == 1,
      s"expected 1 aggregate query for 4 S-terms, saw ${counter.get()}")
    // values match the sequential semantics: mean(c)=1.5, std(c)=
    // 0.7071..., sum(D)=13, count=2
    val got = col1(pipe.select(c.as("out")), "out")
      .map(_.asInstanceOf[Double])
    val sd = math.sqrt(0.5)
    val want = Seq((1.0 - 1.5) / sd + 15.0, (2.0 - 1.5) / sd + 15.0)
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12) }
  }

  test("nested S-functions evaluate correctly (inner eager, outer " +
      "batched): sum(c - mean(c)) = 0") {
    assert(eval("c + sum(c - mean(c))") == Seq(1.0, 2.0))
  }
}
