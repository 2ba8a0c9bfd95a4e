package graft

import graft.QH._
import graft.exprlang.Formula
import org.apache.spark.sql.functions._

/** SURVEY §2.8 — the expression language, exercised through the real
  * parse -> compile -> addToPipe path (not hand-built Columns), with
  * SQL oracles mirroring each formula's semantics.
  */
object QueriesExpr {

  /** Arithmetic + precedence (parser.go:39-55): fixed multiplication
    * order means bit-identical doubles across engines.
    */
  private val q32_expr_arith: Q = (
    (s, dir) => {
      val li = read(s, dir, "lineitem")
      Formula.addToPipe(li, "net_revenue",
        "l_extendedprice * (1 - l_discount) * (1 + l_tax)")
        .select(col("l_orderkey"), col("l_linenumber"), col("net_revenue"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("net_revenue"))
    },
    Some("""SELECT l_orderkey, l_linenumber,
                   l_extendedprice * (1 - l_discount) * (1 + l_tax)
                     AS net_revenue
            FROM lineitem
            ORDER BY l_orderkey, l_linenumber, net_revenue"""))

  /** if() + logicals returning 0/1 doubles (parser.go:506-523,
    * 1502-1578).
    */
  private val q33_expr_if_logic: Q = (
    (s, dir) => {
      val li = read(s, dir, "lineitem")
      Formula.addToPipe(li, "flag",
        "if(l_quantity > 25 && l_discount < 0.05, 1, 0)")
        .select(col("l_orderkey"), col("l_linenumber"), col("flag"),
          Formula.column(li, "l_returnflag == 'R'").as("is_return"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("flag"),
          col("is_return"))
    },
    Some("""SELECT l_orderkey, l_linenumber,
                   CASE WHEN l_quantity > 25 AND l_discount < 0.05
                        THEN 1.0 ELSE 0.0 END AS flag,
                   CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END
                     AS is_return
            FROM lineitem
            ORDER BY l_orderkey, l_linenumber, flag, is_return"""))

  /** Date functions: dateDiff calendar units, dateAdd months,
    * day/month/year extracts, month snapping (parser.go:795-925,
    * 1134-1171).
    */
  private val q34_expr_dates: Q = (
    (s, dir) => {
      val o = read(s, dir, "orders")
      val withCols = Formula.addToPipe(
        Formula.addToPipe(o, "days_to_cutoff",
          "dateDiff(toDate('19980801'), o_orderdate, 'day')"),
        "months_to_cutoff",
        "dateDiff(toDate('19980801'), o_orderdate, 'month')")
      withCols.select(col("o_orderkey"),
          col("days_to_cutoff"), col("months_to_cutoff"),
          Formula.column(withCols, "year(o_orderdate)").cast("long")
            .as("order_year"),
          Formula.column(withCols, "month(o_orderdate)").cast("long")
            .as("order_month"),
          Formula.column(withCols, "day(o_orderdate)").cast("long")
            .as("order_day"),
          Formula.column(withCols, "dateAdd(o_orderdate, 3)").cast("date")
            .as("plus3m"),
          last_day(col("o_orderdate")).as("month_end"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey,
                   CAST(datediff('day', o_orderdate, DATE '1998-08-01')
                     AS DOUBLE) AS days_to_cutoff,
                   CAST((1998 - year(o_orderdate)) * 12
                        + (8 - month(o_orderdate)) AS DOUBLE)
                     AS months_to_cutoff,
                   year(o_orderdate) AS order_year,
                   month(o_orderdate) AS order_month,
                   day(o_orderdate) AS order_day,
                   -- Go AddDate normalization (not clamping): month-add
                   -- on the 1st, then carry the (day-1) offset forward
                   CAST(date_trunc('month', o_orderdate)
                        + INTERVAL '3 months'
                        + (day(o_orderdate) - 1) * INTERVAL '1 day'
                     AS DATE) AS plus3m,
                   CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE)
                     AS month_end
            FROM orders ORDER BY o_orderkey"""))

  /** String functions with reference semantics: 1-based substr,
    * strPos with -1 sentinel, strCount float return, strLen
    * (parser.go:928-1131).
    */
  private val q35_expr_strings: Q = (
    (s, dir) => {
      val p = read(s, dir, "part")
      Formula.addToPipe(
        Formula.addToPipe(
          Formula.addToPipe(
            Formula.addToPipe(p, "name5", "substr(p_name, 1, 5)"),
            "pos_a", "strPos(p_name, 'a')"),
          "count_a", "strCount(p_name, 'a')"),
        "name_len", "strLen(p_name)")
        .select(col("p_partkey"), col("name5"), col("pos_a"),
          col("count_a"), col("name_len"))
        .orderBy(col("p_partkey"))
    },
    Some("""SELECT p_partkey, substring(p_name, 1, 5) AS name5,
                   CASE WHEN strpos(p_name, 'a') = 0 THEN -1.0
                        ELSE CAST(strpos(p_name, 'a') AS DOUBLE) END
                     AS pos_a,
                   CAST((length(p_name)
                         - length(replace(p_name, 'a', ''))) AS DOUBLE)
                     AS count_a,
                   CAST(length(p_name) AS DOUBLE) AS name_len
            FROM part ORDER BY p_partkey"""))

  /** maxE/minE element-wise pair max/min (parser.go:1174-1234) plus
    * guarded log and power.
    */
  private val q36_expr_maxmin: Q = (
    (s, dir) => {
      val c = read(s, dir, "customer")
      Formula.addToPipe(
        Formula.addToPipe(
          Formula.addToPipe(c, "bal_floor", "maxE(c_acctbal, 0)"),
          "bal_cap", "minE(c_acctbal, 5000)"),
        "log_shift", "log(c_acctbal + 20000)")
        .select(col("c_custkey"), col("bal_floor"), col("bal_cap"),
          round(col("log_shift"), 6).as("log_shift"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey,
                   greatest(c_acctbal, 0.0) AS bal_floor,
                   least(c_acctbal, 5000.0) AS bal_cap,
                   round(ln(c_acctbal + 20000), 6) AS log_shift
            FROM customer ORDER BY c_custkey"""))

  /** index(x, idx): distributed positional gather — an equi-join of
    * the index column against the sequence (data.go:641-660), oracled
    * by the same join over row_number positions.
    */
  private val q67_gather_index: Q = (
    (s, dir) => {
      val f = frame.SeaFrame.withSequence(
        read(s, dir, "orders").select("o_orderkey", "o_totalprice"),
        Seq(col("o_orderkey").asc))
      val withIdx = f.copy(df =
        f.df.withColumn("gidx", col("o_orderkey") % 50))
      // gidx ranges over 50 positions: declare the bounded index set
      // so the values side prunes to 50 rows and both joins broadcast
      ops.Gather.index(withIdx, "o_totalprice", "gidx",
        smallIdxSet = true)
        .select(col("o_orderkey"),
          col("o_totalprice_at_gidx").as("gathered"))
        .orderBy(col("o_orderkey"))
    },
    Some("""WITH f AS (SELECT o_orderkey, o_totalprice,
                   row_number() OVER (ORDER BY o_orderkey) - 1 AS pos
                 FROM orders)
            SELECT a.o_orderkey, b.o_totalprice AS gathered
            FROM f a JOIN f b ON (a.o_orderkey % 50) = b.pos
            ORDER BY a.o_orderkey"""))

  /** one2Many: broadcast a scalar 1-row pipe to n rows
    * (parser.go:1661-1691) — cross join against spark.range.
    */
  private val q68_one2many: Q = (
    (s, dir) => {
      val scalar = frame.SeaFrame(
        read(s, dir, "orders").agg(davg(col("o_totalprice"))
          .as("avg_price")))
      ops.Gather.one2Many(scalar, 5).df
        .select(col(frame.SeaFrame.SEQ).as("pos"), col("avg_price"))
        .orderBy(col("pos"))
    },
    Some(s"""SELECT CAST(g.pos AS BIGINT) AS pos, a.avg_price
             FROM (SELECT unnest(generate_series(0, 4)) AS pos) g
             CROSS JOIN (SELECT ${sqlDavg("o_totalprice")} AS avg_price
                         FROM orders) a
             ORDER BY pos"""))

  /** Formula-surface range() (parser.go:682-723): a 1-row pipe is
    * replaced by the range (reference parser_test.go:836-858), plain
    * expressions then combine with it, and index(x, range(n-1, -1))
    * reverses closed-form — the gather positions are arithmetic in the
    * sequence, so no slab of positions is ever materialized.
    */
  private val q88_range_formula: Q = (
    (s, dir) => {
      val one = read(s, dir, "orders")
        .agg(davg(col("o_totalprice")).as("avg_price"))
        .withColumn("__seq", lit(0L))
      val grown = Formula.addToPipe(one, "pos", "range(0, 50)",
        Some("__seq"))
      val att = Formula.addToPipe(grown, "dbl", "pos * 2", Some("__seq"))
      Formula.addToPipe(att, "rpos", "index(pos, range(49, -1))",
        Some("__seq"))
        .select(col("pos"), col("rpos"), col("dbl"), col("avg_price"))
        .orderBy(col("pos"))
    },
    Some(s"""SELECT CAST(g.pos AS BIGINT) AS pos,
                    CAST(49 - g.pos AS BIGINT) AS rpos,
                    CAST(g.pos * 2 AS DOUBLE) AS dbl,
                    a.avg_price
             FROM (SELECT unnest(generate_series(0, 49)) AS pos) g
             CROSS JOIN (SELECT ${sqlDavg("o_totalprice")} AS avg_price
                         FROM orders) a
             ORDER BY pos"""))

  val all: Map[String, Q] = Map(
    "q32_expr_arith" -> q32_expr_arith,
    "q33_expr_if_logic" -> q33_expr_if_logic,
    "q34_expr_dates" -> q34_expr_dates,
    "q35_expr_strings" -> q35_expr_strings,
    "q36_expr_maxmin" -> q36_expr_maxmin,
    "q67_gather_index" -> q67_gather_index,
    "q68_one2many" -> q68_one2many,
    "q88_range_formula" -> q88_range_formula)
}
