package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association mining (Agrawal & Srikant 1994's
  * support/confidence frame plus lift) expressed relationally.
  */
object Association {

  /** Pairwise association rules over (basket, item) rows:
    * support(a,b) = baskets containing both, confidence(a→b) =
    * support(a,b)/support(a), lift = N*support(a,b)/
    * (support(a)*support(b)) — counts exact integers, the two ratios
    * in fixed-order double arithmetic rounded 6dp. Pairs are emitted
    * once in canonical (a < b) order; read the reverse rule's
    * confidence from (support, count_b).
    *
    * Shape: presence table (basket, item) DISTINCT first (duplicate
    * line items never inflate support), then a co-partitioned
    * per-basket self-join — quadratic ONLY in per-basket distinct
    * items, which `maxPerBasket > 0` guards with a bounded census
    * action before the join can run (the fuzzyMatch rule). The
    * `minSupport` cut applies straight after the pair count, so the
    * item-margin joins run on the surviving head; item counts and
    * the basket census broadcast.
    */
  def basketRules(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long, maxPerBasket: Int = 10000): DataFrame = {
    require(minSupport >= 1, s"basketRules: minSupport $minSupport")
    // r14 reshape (the itemNeighbors/brandEdges discipline): the
    // DISTINCT presence table + per-basket self-join collapse into
    // ONE basket-keyed collect_set exchange, pairs generated in-row
    // from the sorted set (same item_a < item_b ordering the join
    // used). The quadratic fan-out stays bounded by basket width —
    // the same census guard runs first, now a max over set sizes.
    // pinned (r15): the census guard below is its own action, so an
    // unpinned basket table paid the lineitem-sized exchange TWICE
    // (once for the guard's max, once for the main query — the
    // counts/census/pairs branches inside the main query already
    // share one exchange via ReuseExchange, but a separate action
    // cannot). The guard's .first() materializes the pin; everything
    // downstream reads cache. Basket arrays are ≪ input by
    // construction, so the pin scales with the basket table.
    val grouped = graft.Caches.pin(df
      .where(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .groupBy(col("__b"))
      .agg(array_sort(collect_set(col("__i"))).as("__is")))
    if (maxPerBasket > 0) {
      val worst = grouped
        .agg(coalesce(max(size(col("__is"))), lit(0)))
        .first().getInt(0)
      require(worst <= maxPerBasket,
        s"basketRules: largest basket has $worst distinct items " +
          s"(> $maxPerBasket) — coarsen the item key")
    }
    val counts = grouped.select(explode(col("__is")).as("__i"))
      .groupBy(col("__i")).agg(count(lit(1)).as("__c"))
    val census = grouped.agg(count(lit(1)).as("__nb"))
    grouped.select(explode(flatten(transform(col("__is"),
        (x, i) => transform(
          slice(col("__is"), i + lit(2),
            size(col("__is")) - i - lit(1)),
          y => struct(x.as("a"), y.as("b")))))).as("__p"))
      .select(col("__p.a").as("item_a"), col("__p.b").as("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= minSupport)
      .join(broadcast(counts.select(col("__i").as("item_a"),
        col("__c").as("count_a"))), Seq("item_a"))
      .join(broadcast(counts.select(col("__i").as("item_b"),
        col("__c").as("count_b"))), Seq("item_b"))
      .crossJoin(broadcast(census))
      .withColumn("confidence", round(
        col("support").cast("double") / col("count_a").cast("double"),
        6))
      .withColumn("lift", round(
        col("support").cast("double") * col("__nb").cast("double") /
          (col("count_a").cast("double") *
            col("count_b").cast("double")), 6))
      .select(col("item_a"), col("item_b"), col("support"),
        col("count_a"), col("count_b"), col("confidence"), col("lift"))
  }
}
