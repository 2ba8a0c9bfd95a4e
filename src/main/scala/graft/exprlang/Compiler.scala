package graft.exprlang

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Compiles a formula AST to a Catalyst Column tree, preserving the
  * reference's semantics (seafan parser.go:1277-1578):
  *
  *   - arithmetic coerces operands to double;
  *   - comparisons and logicals return double 0/1; `&&`/`||` treat
  *     values > 0 as true;
  *   - division by zero and log(<=0) are ERRORS, not null/NaN
  *     (guarded with raise_error — parser.go:1520-1573, data.go:566);
  *   - summary ('S') functions aggregate the WHOLE frame and broadcast
  *     the scalar back into the row expression (the reference's
  *     scalar fan-out, parser.go:1721-1728) — computed eagerly as one
  *     driver-side agg, embedded as a literal;
  *   - order-dependent functions (lag, row, cumeBefore/After,
  *     prodBefore/After, countBefore/After) window over the frame's
  *     explicit sequence column (SURVEY 7.4).
  *
  * Everything compiles to built-in codegen'd functions — no UDFs in
  * the row path.
  */
class Compiler(df: DataFrame, seqCol: Option[String]) {
  import Expr._

  private def w: WindowSpec = {
    val s = seqCol.getOrElse(throw new IllegalStateException(
      "order-dependent function needs an explicit row order (seq column)"))
    Window.orderBy(col(s).asc)
  }
  private def before = w.rowsBetween(Window.unboundedPreceding, 0)
  private def after = w.rowsBetween(0, Window.unboundedFollowing)

  /** Date literal formats CCYYMMDD and MM/DD/CCYY (parser.go:71). */
  private def parseDateLit(s: String): Option[java.sql.Date] = {
    val ymd = "(\\d{4})(\\d{2})(\\d{2})".r
    val mdy = "(\\d{1,2})/(\\d{1,2})/(\\d{4})".r
    s match {
      case ymd(y, m, d) => Some(java.sql.Date.valueOf(f"$y-$m-$d"))
      case mdy(m, d, y) =>
        Some(java.sql.Date.valueOf(f"$y-${m.toInt}%02d-${d.toInt}%02d"))
      case _ => None
    }
  }

  private def bool2d(c: Column): Column = when(c, 1.0).otherwise(0.0)
  private def truthy(c: Column): Column = c.cast("double") > 0.0

  def compile(e: Expr): Column = e match {
    case Num(v) => lit(v)
    case Quoted(s) => parseDateLit(s).map(d => lit(d)).getOrElse(lit(s))
    case Ident(name) =>
      require(df.columns.contains(name), s"unknown field '$name'")
      df(name)
    case Neg(x) => -compile(x)
    case Bin(op, l, r) => binOp(op, compile(l), compile(r), l, r)
    case Call(fn, args) => call(fn, args)
  }

  private def isStringy(e: Expr): Boolean = e match {
    case Quoted(s) => parseDateLit(s).isEmpty
    case Ident(n) => df.columns.contains(n) &&
      Set("string", "date", "timestamp")(df.schema(n).dataType.typeName)
    case _ => false
  }

  private def binOp(op: String, lc: Column, rc: Column,
      le: Expr, re: Expr): Column = {
    // string/date comparisons keep native types (evalOpsCat
    // parser.go:1450-1472); numeric paths coerce to double
    val catCompare = isStringy(le) || isStringy(re)
    def l = if (catCompare) lc else lc.cast("double")
    def r = if (catCompare) rc else rc.cast("double")
    op match {
      case "+" => l + r
      case "-" => l - r
      case "*" => l * r
      case "/" =>
        when(r === 0.0, raise_error(lit("division by zero")).cast("double"))
          .otherwise(l / r)
      case "^" => pow(l, r)
      case "==" => bool2d(l === r)
      case "!=" => bool2d(l =!= r)
      case ">" => bool2d(l > r)
      case "<" => bool2d(l < r)
      case ">=" => bool2d(l >= r)
      case "<=" => bool2d(l <= r)
      case "&&" => bool2d(truthy(lc) && truthy(rc))
      case "||" => bool2d(truthy(lc) || truthy(rc))
    }
  }

  /** Eagerly evaluate a whole-frame aggregate to a scalar literal
    * (the reference's summary-level functions, parser.go:749-786).
    */
  private def scalarAgg(agg: Column): Column = {
    val v = df.agg(agg.as("v")).head().get(0)
    lit(v)
  }

  private def call(fn: String, args: List[Expr]): Column = {
    def a(i: Int): Column = compile(args(i))
    def d(i: Int): Column = compile(args(i)).cast("double")
    fn match {
      // ---- row-level math (data.go:553-638, parser.go:1061-1087)
      case "exp" => exp(d(0))
      case "log" => when(d(0) <= 0.0,
        raise_error(lit("log of non-positive value")).cast("double"))
        .otherwise(log(d(0)))
      case "sqrt" => sqrt(d(0))
      case "abs" => abs(d(0))
      case "pow" => pow(d(0), d(1))
      case "if" => when(truthy(a(0)), a(1)).otherwise(a(2))
      case "maxE" => greatest(a(0), a(1))
      case "minE" => least(a(0), a(1))

      // ---- conversions (parser.go:1317-1334)
      case "cat" | "toInt" => a(0).cast("int")
      case "toFloatDP" => a(0).cast("double")
      case "toFloatSP" => a(0).cast("float")
      case "toString" => a(0).cast("string")
      case "toDate" => args.head match {
        case Quoted(s) => lit(parseDateLit(s).getOrElse(
          throw new IllegalArgumentException(s"bad date literal '$s'")))
        case _ =>
          // ANSI mode: to_date throws on a format mismatch, so the
          // format-fallback chain must use try_to_date; a value
          // matching NO format is an error like the reference
          val parsed = coalesce(try_to_date(a(0), "yyyyMMdd"),
            try_to_date(a(0), "M/d/yyyy"))
          when(a(0).isNotNull && parsed.isNull,
            raise_error(concat(lit("toDate: unparseable date '"),
              a(0).cast("string"), lit("'"))).cast("date"))
            .otherwise(parsed)
      }

      // ---- dates (parser.go:795-925, 1134-1274)
      case "dateAdd" => add_months(a(0), a(1).cast("int"))
      case "dateDiff" => dateDiff(a(0), a(1), args(2))
      case "toLastDayOfMonth" => last_day(a(0))
      case "toFirstDayOfMonth" => trunc(a(0), "MM")
      case "day" => dayofmonth(a(0)).cast("int")
      case "month" => month(a(0)).cast("int")
      case "year" => year(a(0)).cast("int")
      case "nowDate" => current_date()
      case "nowTime" => date_format(current_timestamp(), "H:m:s")

      // ---- strings; 1-based like the reference (parser.go:928-1131)
      case "substr" => // 1-based start, clamped end (parser.go:928-976)
        a(0).substr(a(1).cast("int"), a(2).cast("int"))
      case "strLen" => length(a(0)).cast("double")
      case "strPos" => // 1-based; -1 when absent (not 0 — parser.go:1090)
        when(instr(a(0), singleString(args(1))) === 0, -1.0)
          .otherwise(instr(a(0), singleString(args(1))).cast("double"))
      case "strCount" => // non-overlapping count, float64 return
        ((length(a(0)) - length(replace(a(0), singleString(args(1)), lit("")))) /
          length(singleString(args(1)))).cast("double")

      // ---- order-dependent (data.go:458-550, parser.go:1357-1372)
      case "lag" => lag(a(0), 1).over(w) // missing handled by caller default
      case "row" => row_number().over(w).cast("double") - 1.0
      case "countBefore" => count(lit(1)).over(before).cast("double")
      case "countAfter" => count(lit(1)).over(after).cast("double")
      case "cumeBefore" => sum(d(0)).over(before)
      case "cumeAfter" => sum(d(0)).over(after)
      case "prodBefore" => windowProduct(d(0), before)
      case "prodAfter" => windowProduct(d(0), after)

      // ---- summary level: whole-frame scalar (parser.go:749-786)
      case "sum" => scalarAgg(sum(d(0)))
      case "mean" | "avg" => scalarAgg(avg(d(0)))
      case "count" => scalarAgg(count(d(0)).cast("int"))
      case "max" => scalarAgg(max(a(0)))
      case "min" => scalarAgg(min(a(0)))
      case "std" => scalarAgg(stddev_samp(d(0)))
      // median/corr: declared-but-unimplemented in the reference
      // (functions.txt:12,27; parser.go:779-782) — implemented correctly
      // here, divergence documented in SURVEY §7.4.
      case "median" => scalarAgg(median(d(0)))
      case "corr" => scalarAgg(corr(d(0), d(1)))
      // sse/mad/r2 (parser.go:661-679,766-778; reference's mad computes
      // sse — a documented bug; we implement mad correctly)
      case "sse" => scalarAgg(sum(pow(d(0) - d(1), 2.0)))
      case "mad" => scalarAgg(sum(abs(d(0) - d(1))))
      case "r2" => r2(d(0), d(1))
      case "npv" => npvCol(args)
      case "irr" => irrCol(args)

      // ---- misc
      case "exist" => // field-or-fallback at resolution time (parser.go:1595)
        args.head match {
          case Ident(n) if df.columns.contains(n) => df(n)
          case _ => a(1)
        }
      case "print" | "printIf" =>
        // side-effect: show the first n rows of the evaluated
        // argument (eager, like the reference parser.go:572-613);
        // the expression's value is 1
        val n = if (args.length > 1) args(1) match {
          case Num(v) => v.toInt
          case _ => 10
        } else 10
        val sel = df.select(a(0).as("print"))
        (if (fn == "printIf") sel.where(col("print").cast("double") > 0)
         else sel).show(n, truncate = false)
        lit(1.0)
      case other => throw new IllegalArgumentException(
        s"unknown function '$other'")
    }
  }

  private def singleString(e: Expr): Column = e match {
    case Expr.Quoted(s) => lit(s)
    case other => compile(other).cast("string")
  }

  /** dateDiff with the reference's CALENDAR month/year arithmetic
    * (parser.go:871-925): month = 12*(y1-y2)+(m1-m2), year = y1-y2,
    * day = date difference, hour = elapsed hours.
    */
  private def dateDiff(d1: Column, d2: Column, unit: Expr): Column = {
    val u = unit match {
      case Expr.Quoted(s) => s
      case Expr.Ident(s) => s
      case _ => throw new IllegalArgumentException("dateDiff unit")
    }
    u match {
      case "day" => datediff(d1, d2).cast("double")
      case "month" =>
        ((year(d1) - year(d2)) * 12 + (month(d1) - month(d2))).cast("double")
      case "year" => (year(d1) - year(d2)).cast("double")
      case "hour" =>
        ((unix_timestamp(d1) - unix_timestamp(d2)) / 3600.0)
      case other => throw new IllegalArgumentException(
        s"dateDiff unit '$other'")
    }
  }

  /** Windowed running product from built-ins only: zero if the frame
    * contains a zero, else sign via (-1)^negatives times
    * exp(sum(log|x|)) — handles zeros and negatives that the naive
    * log-sum trick cannot (SURVEY §4.2).
    */
  def windowProduct(x: Column, frame: WindowSpec): Column = {
    val zeros = sum(when(x === 0.0, 1L).otherwise(0L)).over(frame)
    val negs = sum(when(x < 0.0, 1L).otherwise(0L)).over(frame)
    val mag = exp(sum(when(x =!= 0.0, log(abs(x)))).over(frame))
    when(zeros > 0, 0.0)
      .otherwise(when(pmod(negs, lit(2L)) === 1L, -mag).otherwise(mag))
  }

  /** r2 = 1 - sse/((n-1)*var(y)) (parser.go:768-778). */
  private def r2(y: Column, yhat: Column): Column = {
    val row = df.agg(
      sum(pow(y - yhat, 2.0)).as("sse"),
      var_samp(y).as("vy"),
      count(lit(1)).as("n")).head()
    lit(1.0 - row.getDouble(0) / ((row.getLong(2) - 1) * row.getDouble(1)))
  }

  /** npv(rate, cashflow): PV with the FIRST cashflow undiscounted
    * (parser.go:553-569), ordered by the frame's sequence.
    */
  private def npvCol(args: List[Expr]): Column = {
    val rate = compile(args(0)).cast("double")
    val cf = compile(args(1)).cast("double")
    val t = row_number().over(w).cast("double") - 1.0
    // materialize the discounted terms first — a window expression
    // cannot live inside an aggregate directly
    val terms = df.select((cf / pow(lit(1.0) + rate, t)).as("__npv"))
    lit(terms.agg(sum(col("__npv"))).head().getDouble(0))
  }

  /** irr(cashflow) or irr(cost, cashflow): collect the ordered
    * cashflows (bounded — one vector) and bisection-solve npv(r)=cost
    * on the driver, mirroring the reference's driver-side Nelder-Mead
    * (parser.go:617-658; returns 0 on failure).
    */
  private def irrCol(args: List[Expr]): Column = {
    val (cost, cfExpr) =
      if (args.length == 2) (compileScalar(args(0)), args(1))
      else (0.0, args.head)
    val s = seqCol.getOrElse(throw new IllegalStateException(
      "irr needs an explicit row order"))
    val cfs = df.select(compile(cfExpr).cast("double").as("cf"), col(s))
      .orderBy(col(s)).collect().map(_.getDouble(0))
    lit(Financial.irr(cfs, cost))
  }

  private def compileScalar(e: Expr): Double = e match {
    case Expr.Num(v) => v
    case other =>
      df.agg(first(compile(other)).cast("double")).head().getDouble(0)
  }
}

/** Driver-side financial solvers (reference parser.go:617-658). */
object Financial {
  def npv(rate: Double, cfs: Array[Double]): Double =
    cfs.zipWithIndex.map { case (cf, t) => cf / math.pow(1.0 + rate, t) }.sum

  /** Bisection solve of npv(r) - cost = 0 on [-0.99, 10]; 0 on failure
    * like the reference (parser.go:647-657).
    */
  def irr(cfs: Array[Double], cost: Double = 0.0): Double = {
    def f(r: Double) = npv(r, cfs) - cost
    var lo = -0.99; var hi = 10.0
    if (f(lo) * f(hi) > 0) return 0.0
    var i = 0
    while (hi - lo > 1e-10 && i < 200) {
      val mid = (lo + hi) / 2
      if (f(lo) * f(mid) <= 0) hi = mid else lo = mid
      i += 1
    }
    (lo + hi) / 2
  }
}

/** Public facade: parse + compile + materialize — the analog of
  * Expr2Tree / Evaluate / AddToPipe (parser.go:200-268, 1589-1758).
  */
object Formula {
  def column(df: DataFrame, formula: String,
      seqCol: Option[String] = None): Column =
    new Compiler(df, seqCol).compile(Parser.parse(formula))

  /** addToPipe: materialize the formula as a new column. */
  def addToPipe(df: DataFrame, name: String, formula: String,
      seqCol: Option[String] = None): DataFrame =
    df.withColumn(name, column(df, formula, seqCol))

  /** Loop(var, start, end): iterative re-evaluation with an integer
    * loop variable substituted each pass, results assigned back into
    * the frame (parser.go:1761-1804) — a driver-side fold.
    */
  def loop(df: DataFrame, varName: String, start: Int, end: Int,
      assigns: Seq[(String, String)], seqCol: Option[String] = None)
      : DataFrame = {
    require(!df.columns.contains(varName),
      s"loop: variable '$varName' collides with an existing column")
    var cur = df
    (start until end).foreach { i =>
      cur = cur.withColumn(varName, lit(i))
      assigns.foreach { case (name, f) =>
        cur = addToPipe(cur, name, f, seqCol)
      }
    }
    cur.drop(varName)
  }
}
