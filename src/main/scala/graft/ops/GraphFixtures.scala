package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Session-memoized shared graph constructions for the catalog's
  * graph entries (the r10 verdict's ask 5): q169 / q322 / q328 each
  * rebuilt the same customer–part purchase edge list, and q227 /
  * q283 / q287 the same support-filtered brand co-purchase edge
  * list — the r10 pin experiment showed the CONSTRUCTION join
  * dominating every one of those entries' measured time. Hoisting it
  * here means the catalog measures the graph OPERATORS (PageRank,
  * PPR, LPA, triangles, clustering coefficient, assortativity), not
  * the same lineitem join five times.
  *
  * Deliberately NOT registered with [[graft.Caches]]: entries call
  * `Caches.release()` after materializing, which would evict a
  * cross-entry fixture. The memo is keyed by (session, sfDir) and
  * the build materializes EAGERLY (count()) so the first caller pays
  * construction once and every later caller — including later
  * bench reps — measures only its operator. [[clear]] unpersists
  * everything (tests; long-lived sessions switching datasets).
  *
  * Scale note: both fixtures are output-bounded — the purchase edge
  * list is the DISTINCT (customer, part) pair set (≪ lineitem), the
  * brand edge list is support-filtered to a dictionary-sized graph —
  * so pinning them holds at any corpus scale where the graph itself
  * is workable.
  */
object GraphFixtures {

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[
      (String, String, String), (SparkSession, DataFrame)]()

  /** Stable UNIQUE session id via [[org.apache.spark.sql.GraftBridge
    * .sessionUid]] (sessionUUID): an identity hash can collide across
    * session restarts in a long-lived JVM and would hand a later
    * session a DataFrame bound to a stopped context — the UUID
    * cannot.
    */
  private def sid(s: SparkSession): String =
    org.apache.spark.sql.GraftBridge.sessionUid(s)

  /** Drop every entry whose owning session's context has stopped:
    * its persisted blocks died with the context, and handing the
    * frame to anyone is a runtime failure. Called on every access so
    * a long-lived JVM restarting sessions cannot accumulate dead
    * entries.
    */
  private def sweep(): Unit =
    memo.entrySet().removeIf(e => e.getValue._1.sparkContext.isStopped)

  private def cached(s: SparkSession, dir: String, name: String)(
      build: => DataFrame): DataFrame = {
    sweep()
    val df = memo.computeIfAbsent((sid(s), dir, name), _ => {
      val df = build.persist(StorageLevel.MEMORY_AND_DISK)
      df.count() // eager: construction cost lands on the builder
      (s, df)
    })._2
    // A session-wide `catalog.clearCache()` (Bench runs one after
    // EVERY rep) silently unpersists the memoized frame; without
    // this re-pin, every later caller recomputes the construction
    // join once per plan reference — measured 4.5s vs 3.3s per q287
    // bench rep. The re-persist + eager count happens INSIDE the
    // caller's timed section, so reps still pay construction exactly
    // once from parquet (the bench's no-cross-rep-caching contract).
    // The re-pin is guarded by the memo's own monitor: without it two
    // concurrent callers racing past the storageLevel check would
    // both re-persist and double-run the eager count (harmless for
    // the single-threaded bench harness, wrong for shared fixtures).
    if (df.storageLevel == StorageLevel.NONE) memo.synchronized {
      if (df.storageLevel == StorageLevel.NONE) {
        df.persist(StorageLevel.MEMORY_AND_DISK)
        df.count()
      }
    }
    df
  }

  /** Canonical bipartite purchase graph (q169 / q322 / q328): one
    * shared id space by parity (customer·2, part·2+1), DISTINCT
    * pairs from orders⋈lineitem, symmetrized. PageRank / PPR
    * consume it as-is; labelPropagation re-canonicalizes internally
    * (least/greatest + distinct), which is an identity on this form.
    */
  def purchaseEdges(s: SparkSession, dir: String): DataFrame =
    cached(s, dir, "purchaseEdges") {
      val o = graft.QH.read(s, dir, "orders")
      val l = graft.QH.read(s, dir, "lineitem")
      val half = o.join(l, o("o_orderkey") === l("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_partkey") * 2 + 1).as("dst"))
        .distinct()
      half.unionByName(
        half.select(col("dst").as("src"), col("src").as("dst")))
    }

  /** Brand co-purchase graph at RELATIVE support ≥ 2% of orders
    * (q227 / q283 / q287): DISTINCT (order, brand) presence, per-
    * order self-join (quadratic only in the ~25-brand order width),
    * support cut cross-multiplied against the broadcast order count,
    * brands mapped to stable long ids. The presence `items` set is
    * deliberately NOT cached separately — the r10 pin experiment
    * measured AQE's exchange reuse beating a 600k-row
    * materialization (5.9s vs 4.0s); only this final dictionary-
    * sized edge list is worth holding.
    */
  def brandEdges(s: SparkSession, dir: String): DataFrame =
    cached(s, dir, "brandEdges") {
      // r14 reshape: the brand id is computed on the 20k-row part
      // DIMENSION (regexp runs dictionary-many times, not row-many),
      // and the distinct + per-order self-join collapse into ONE
      // order-keyed collect_set exchange with pairs generated IN-ROW
      // from the sorted set — 1 data-sized exchange where the join
      // shape had 3 (distinct, then both self-join sides). Scratch287
      // A/B: 2.35s -> 1.58s warm; normalized edge set bit-identical
      // (consumers q227/q283/q287 all least/greatest-normalize, and
      // their oracles replay the DEFINITION, which is orientation-
      // free after the und CTE). Pair SUPPORT is per-order distinct
      // co-presence either way.
      val dim = graft.QH.read(s, dir, "part")
        .select(col("p_partkey"),
          regexp_replace(col("p_brand"), "[^0-9]", "").cast("long")
            .as("bid"))
      val grouped = graft.QH.read(s, dir, "lineitem")
        .join(dim, col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("o"), col("bid"))
        .groupBy(col("o"))
        .agg(array_sort(collect_set(col("bid"))).as("ps"))
      val nOrders = grouped.agg(count(lit(1)).as("__no"))
      grouped.select(explode(flatten(transform(col("ps"),
          (x, i) => transform(
            slice(col("ps"), i + lit(2), size(col("ps")) - i - lit(1)),
            y => struct(x.as("pa"), y.as("pb")))))).as("pr"))
        .select(col("pr.pa").as("pa"), col("pr.pb").as("pb"))
        .groupBy(col("pa"), col("pb"))
        .agg(count(lit(1)).as("s"))
        .crossJoin(broadcast(nOrders))
        .where(col("s") * 50 >= col("__no"))
        .select(col("pa").as("src"), col("pb").as("dst"))
    }

  /** Unpersist and forget every fixture (all sessions). */
  def clear(): Unit = {
    memo.values.forEach { case (_, df) =>
      try df.unpersist(blocking = false)
      catch { case _: Throwable => }
    }
    memo.clear()
  }
}
