package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One leaderboard row: the item's rating/record as of the last
  * game the trigger processed (`asof_ord`) — the full board is
  * re-emitted each trigger (items-bounded by contract), so "latest
  * board" = the rows carrying the global max asof_ord.
  */
case class EloRank(item: String, games: Long, wins: Long,
    rating_ppm: Long, asof_ord: Long)

private[streaming] case class EloState(lastOrd: Long,
    ratings: Map[String, Long], games: Map[String, Long],
    wins: Map[String, Long])

/** STREAMING ELO — the ingest-time leaderboard twin of
  * [[graft.ops.Preference.elo]] (the q388 batch path): games arrive
  * in event order and the rating table updates game by game with
  * the SAME pure-integer rule (shared [[graft.ops.Preference
  * .EloTable]] lookup, zero-sum K-update on the ppm lattice), so
  * stream == batch bit-for-bit under any order-respecting
  * micro-batch slicing and the oracle is simply
  * [[graft.ops.Preference.eloSql]] (the q351/q378 convention).
  *
  * Elo's update is GLOBALLY sequential — every game reads the two
  * CURRENT ratings, so the state is one group holding the whole
  * rating table (bounded by `maxItems`, enforced as the fold runs).
  * That single-group shape is the SEMANTICS, not a shortcut: a
  * per-item key could not see its opponent's rating. For
  * unbounded-scale rating use the batch census path
  * ([[graft.ops.Preference.bradleyTerry]]); this operator is the
  * leaderboard surface, same contract as the batch elo's maxGames
  * guard.
  *
  * Ordering contract (the [[Streams.pageHinkleyStream]] convention):
  * within a trigger the batch is sorted by (ord, winner, loser) —
  * the batch elo's exact tiebreak; ACROSS triggers ord must be
  * strictly greater than everything already folded (equal ord
  * values must arrive in one trigger, else the cross-batch tiebreak
  * could not see them) — violations fail fast. Null fields and
  * self-games are hygiene-dropped exactly like the batch operator.
  *
  * Ord type contract: `ordCol` is cast to LONG at ingest, so the
  * bit-for-bit guarantee holds for integer ords only — a timestamp
  * ord truncates to epoch seconds, which can collide across
  * triggers and trip the strict cross-trigger ordering require
  * (use an integer sequence or epoch-micros column instead). The
  * within-trigger (winner, loser) tiebreak compares UTF-8 bytes
  * unsigned — the same binary ordering Spark's sort gives the
  * batch operator's raw string columns — so item keys of ANY
  * unicode content tiebreak identically in both paths.
  */
object EloStream {

  /** Unsigned UTF-8 byte compare — Spark's UTF8String.binaryCompare
    * semantics, so the stream tiebreak matches the batch sort for
    * non-ASCII keys too (JVM String ordering diverges from byte
    * ordering in U+E000..U+FFFF vs supplementary planes).
    */
  private def binCmp(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  private val gameOrdering: Ordering[(Long, String, String)] =
    new Ordering[(Long, String, String)] {
      def compare(a: (Long, String, String),
          b: (Long, String, String)): Int = {
        val c1 = java.lang.Long.compare(a._1, b._1)
        if (c1 != 0) return c1
        val c2 = binCmp(a._2, b._2)
        if (c2 != 0) c2 else binCmp(a._3, b._3)
      }
    }

  def eloStream(games: DataFrame, ordCol: String, wCol: String,
      lCol: String, kFactor: Long = 32L,
      initPpm: Long = 1500000000L, maxItems: Int = 4096)
      : Dataset[EloRank] = {
    require(kFactor >= 1 && kFactor <= 1000,
      s"eloStream: kFactor $kFactor")
    val ss = games.sparkSession
    import ss.implicits._
    val table = graft.ops.Preference.EloTable
    games.select(col(ordCol).cast("long").as("ord"),
        col(wCol).cast("string").as("w"),
        col(lCol).cast("string").as("l"))
      .where(col("ord").isNotNull && col("w").isNotNull &&
        col("l").isNotNull && col("w") =!= col("l"))
      .as[(Long, String, String)]
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[EloState, EloRank](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: Int, it: Iterator[(Long, String, String)],
         state: GroupState[EloState]) =>
          val batch = it.toArray.sorted(gameOrdering)
          var st = state.getOption.getOrElse(
            EloState(Long.MinValue, Map.empty, Map.empty, Map.empty))
          if (batch.nonEmpty) {
            require(batch.head._1 > st.lastOrd,
              s"eloStream: out-of-order arrival (ord ${batch.head._1}" +
                s" after ${st.lastOrd}) — equal ords must share a " +
                "trigger")
            var ratings = st.ratings
            var gp = st.games
            var wp = st.wins
            batch.foreach { case (ord, w, l) =>
              val rw = ratings.getOrElse(w, initPpm)
              val rl = ratings.getOrElse(l, initPpm)
              val b = math.min(31L, math.max(0L,
                Math.floorDiv(rw - rl + 400000000L, 25000000L)))
              val delta = kFactor * (1000000L - table(b.toInt))
              ratings = ratings.updated(w, rw + delta)
                .updated(l, rl - delta)
              gp = gp.updated(w, gp.getOrElse(w, 0L) + 1L)
              gp = gp.updated(l, gp.getOrElse(l, 0L) + 1L)
              wp = wp.updated(w, wp.getOrElse(w, 0L) + 1L)
              require(ratings.size <= maxItems,
                s"eloStream: ${ratings.size} items > maxItems " +
                  s"$maxItems — use the batch census path")
              st = EloState(ord, ratings, gp, wp)
            }
            state.update(st)
          }
          val asof = st.lastOrd
          st.ratings.keys.toSeq.sorted.map { item =>
            EloRank(item, st.games(item),
              st.wins.getOrElse(item, 0L), st.ratings(item), asof)
          }.iterator
      }
  }
}
