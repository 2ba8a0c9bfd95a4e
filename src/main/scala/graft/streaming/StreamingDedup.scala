package graft.streaming

import graft.llmdata.Dedup
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Dedup-at-ingest: incremental MinHash-LSH over a document stream
  * (a Spark-native extension — the reference's dedup family is batch
  * only). Each arriving document computes its k minhashes once, fans
  * out to its `bands` (band, bucket) keys, and
  * flatMapGroupsWithState keeps the bucket's previously-seen
  * signatures as operator state: a near-duplicate arriving in a LATER
  * micro-batch still collides with the original's bucket entry.
  *
  * Scale shape: state is per (band, bucket) — the natural LSH shard
  * key — holding at most `maxPerBucket` (id, signature) entries, so
  * hot buckets are bounded (overflow documents still DETECT against
  * the retained set, they just stop enrolling). The emitted
  * `est_jaccard` is the matching-minhash fraction — the standard
  * unbiased Jaccard estimate — so downstream can exact-verify only
  * flagged pairs.
  *
  * The same code runs over a bounded batch (one pass, state within
  * the pass) and a stream (state carried across micro-batches).
  */
object StreamingDedup {

  case class DocSig(doc_id: Long, mins: Seq[Long],
      eventMs: Long = 0L, eventTs: java.sql.Timestamp = null)
  case class KeyedSig(band: Int, bucket: Long, doc_id: Long,
      mins: Seq[Long], eventMs: Long = 0L,
      eventTs: java.sql.Timestamp = null)
  case class DupHit(doc_a: Long, doc_b: Long, est_jaccard: Double,
      band: Int)

  /** Flag near-duplicate pairs (estimated Jaccard >= threshold) as
    * they arrive. `docs` may be a batch or a streaming DataFrame with
    * columns (`id`: long, `text`: string).
    *
    * `stateTtlMs` > 0 drops a bucket's retained signatures after that
    * long without new arrivals (processing-time timeout) — the state
    * hygiene an unbounded ingest needs: dedup-against-recent rather
    * than dedup-against-forever, with memory bounded by active
    * buckets x maxPerBucket instead of growing with history. Meant
    * for continuously-triggered queries; under Trigger.AvailableNow
    * the query waits for pending timers before finishing, so leave
    * the TTL off for drain-the-directory runs.
    *
    * `eventTimeCol` non-empty switches the TTL to EVENT time (VERDICT
    * r2 task 7 — at 100 TB ingest, eviction must follow watermarks,
    * not wall clock): each retained signature remembers its event
    * timestamp and stops matching once `its eventTime + stateTtlMs`
    * falls behind the stream's watermark — retention is then
    * replay-deterministic, and a backfill at full speed evicts
    * exactly what real-time ingest would have. The caller sets
    * `withWatermark(eventTimeCol, ...)` on `docs`; state cleanup
    * rides the same watermark via EventTimeTimeout timers.
    *
    * Replay determinism holds when `watermarkDelay` covers the
    * stream's out-of-orderness — INCLUDING equal timestamps split
    * across micro-batch boundaries: at delay 0 a record whose event
    * time equals the watermark is late-dropped in a later batch but
    * processed in the same one, so hits would depend on the slicing.
    * The replay-parity spec pins this with two slicings of one
    * stream.
    */
  def dedupStream(docs: DataFrame, id: String, text: String,
      shingleN: Int = 3, bands: Int = 8, rows: Int = 4,
      threshold: Double = 0.7, maxPerBucket: Int = 1000,
      stateTtlMs: Long = 0L, eventTimeCol: String = "",
      watermarkDelay: String = "0 seconds",
      portable: Boolean = false): Dataset[DupHit] = {
    import docs.sparkSession.implicits._
    val k = bands * rows
    val eventTtl = stateTtlMs > 0 && eventTimeCol.nonEmpty
    val evTs: org.apache.spark.sql.Column =
      if (eventTimeCol.nonEmpty) col(eventTimeCol).cast("timestamp")
      else lit(null).cast("timestamp")
    // portable = cross-engine-reproducible signatures
    // (Dedup.portableMinhashes) so an external oracle can recompute
    // the emitted est_jaccard exactly; default keeps the production
    // murmur3+splitmix hash
    val minsCol =
      if (portable) Dedup.portableMinhashes(
        Dedup.shingles(col(text), shingleN), k)
      else Dedup.minhashes(Dedup.shingles(col(text), shingleN), k)
    val sigs = docs.select(col(id).cast("long").as("doc_id"),
        minsCol.as("mins"),
        coalesce(unix_millis(evTs), lit(0L)).as("eventMs"),
        evTs.as("eventTs"))
      .as[DocSig]
    val fanned = sigs.flatMap { d =>
      (0 until bands).map(b =>
        KeyedSig(b, Dedup.bandHash(d.mins, b, rows), d.doc_id, d.mins,
          d.eventMs, d.eventTs))
    }
    // the stateful operator needs the watermark ON ITS INPUT — the
    // caller's watermark dies at the projection above, so re-declare
    // it on the fanned-out timestamp column
    val keyed =
      if (eventTtl) fanned.withWatermark("eventTs", watermarkDelay)
      else fanned
    val timeout =
      if (eventTtl) GroupStateTimeout.EventTimeTimeout
      else if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    keyed.groupByKey(s => (s.band, s.bucket))
      .flatMapGroupsWithState[List[DocSig], DupHit](
        OutputMode.Update, timeout) {
        (key: (Int, Long), incoming: Iterator[KeyedSig],
         state: GroupState[List[DocSig]]) =>
          if (state.hasTimedOut) {
            // bucket idle past the TTL: drop its signatures
            state.remove()
            Iterator.empty
          } else {
            // event-time TTL: a signature stops matching once its own
            // event time + TTL falls behind the watermark (watermark
            // is 0 in batch mode -> nothing expires)
            val wm = if (eventTtl) state.getCurrentWatermarkMs() else 0L
            var seen = state.getOption.getOrElse(Nil)
            if (eventTtl && wm > 0)
              seen = seen.filter(_.eventMs + stateTtlMs > wm)
            val out = scala.collection.mutable.ArrayBuffer[DupHit]()
            incoming.foreach { s =>
              seen.foreach { p =>
                if (p.doc_id != s.doc_id) {
                  var eq = 0; var i = 0
                  val n = math.min(p.mins.length, s.mins.length)
                  while (i < n) {
                    if (p.mins(i) == s.mins(i)) eq += 1
                    i += 1
                  }
                  val est = eq.toDouble / n
                  if (est >= threshold)
                    out += DupHit(math.min(p.doc_id, s.doc_id),
                      math.max(p.doc_id, s.doc_id), est, key._1)
                }
              }
              if (seen.length < maxPerBucket &&
                  !seen.exists(_.doc_id == s.doc_id))
                seen = DocSig(s.doc_id, s.mins, s.eventMs) :: seen // eventTs not retained in state
            }
            if (eventTtl) {
              if (seen.isEmpty) state.remove()
              else {
                state.update(seen)
                // full-state cleanup when the watermark passes the
                // youngest retained signature's expiry
                val expiry = seen.map(_.eventMs).max + stateTtlMs
                if (expiry > wm) state.setTimeoutTimestamp(expiry)
              }
            } else {
              state.update(seen)
              if (stateTtlMs > 0)
                state.setTimeoutDuration(stateTtlMs)
            }
            out.iterator
          }
      }
  }

  /** Distinct flagged pairs (a pair can collide in several bands). */
  def distinctPairs(hits: Dataset[DupHit]): DataFrame =
    hits.groupBy(col("doc_a"), col("doc_b"))
      .agg(max(col("est_jaccard")).as("est_jaccard"))
}
