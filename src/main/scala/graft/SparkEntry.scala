package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2 gets a `queries` entry; where the
  * semantics are ANSI-SQL-expressible, `oracleSql` carries the DuckDB
  * equivalent the driver hash-matches against. Non-SQL ops (irr solver,
  * MinHash-LSH, …) are rows-only checked.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. A cross-section of the engine in one pipeline: parquet
    * scan -> reference-semantics join (broadcast dimension,
    * default-fill) -> formula-DSL column (parse/compile/addToPipe) ->
    * grouped aggregate.
    */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val o = QH.read(spark, dir, "orders")
      .withColumnRenamed("o_custkey", "custkey")
    val c = QH.read(spark, dir, "customer")
      .withColumnRenamed("c_custkey", "custkey")
    val joined = ops.Joins.join(o, c, "custkey", "inner")
    val flagged = exprlang.Formula.addToPipe(joined, "high_value",
      "if(o_totalprice > 100000, 1, 0)")
    flagged.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("high_value").cast("long")).as("n_high_value"),
        avg(col("o_totalprice")).as("avg_price"))
      .orderBy(col("c_mktsegment"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map { case (k, (fn, _)) => k -> fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Queries.all.collect { case (k, (_, Some(sql))) => k -> sql }
}
