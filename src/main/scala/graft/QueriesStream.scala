package graft

import graft.QH._
import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** SURVEY §2.11 — streaming-shaped transforms over the events table.
  * Each runs here in batch mode (identical semantics, oracle-checked);
  * the ScalaTest suite drives the same transforms through a real
  * Structured Streaming query with watermarks.
  */
object QueriesStream {

  private val q53_stream_tumbling: Q = (
    (s, dir) => Streams.tumbling(read(s, dir, "events"), "1 hour")
      .select(col("window_start"), col("event_type"), col("n_events"),
        round(col("sum_value"), 4).as("sum_value"))
      .orderBy(col("window_start"), col("event_type")),
    Some("""SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
                   event_type, count(*) AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts)
                  FROM events) events
            GROUP BY 1, 2
            ORDER BY window_start, event_type"""))

  private val q54_stream_sliding: Q = (
    (s, dir) => Streams.sliding(read(s, dir, "events"), "1 hour",
      "30 minutes")
      .orderBy(col("window_start"), col("event_type")),
    Some("""WITH b AS (SELECT time_bucket(INTERVAL '30 minutes',
                                CAST(ts AS TIMESTAMP)) AS b30,
                              event_type
                       FROM events),
                 expanded AS (
                   SELECT b30 AS window_start, event_type FROM b
                   UNION ALL
                   SELECT b30 - INTERVAL '30 minutes' AS window_start,
                          event_type FROM b)
            SELECT window_start, event_type, count(*) AS n_events
            FROM expanded GROUP BY 1, 2
            ORDER BY window_start, event_type"""))

  /** Session windows (30-minute inactivity gap) per user: Spark
    * session_window vs the gaps-and-islands formulation — identical
    * session boundaries.
    */
  private val q55_stream_session: Q = (
    (s, dir) => Streams.sessionized(read(s, dir, "events"), "30 minutes")
      .select(col("session_start"), col("user_id"), col("n_events"),
        round(col("sum_value"), 4).as("sum_value"))
      .orderBy(col("user_id"), col("session_start")),
    Some("""WITH src AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts)
                         FROM events),
                 marked AS (
              SELECT user_id, ts, value,
                     CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                            ORDER BY ts) > INTERVAL '30 minutes'
                          OR lag(ts) OVER (PARTITION BY user_id
                            ORDER BY ts) IS NULL
                          THEN 1 ELSE 0 END AS new_session
              FROM src),
                 sess AS (
              SELECT user_id, ts, value,
                     sum(new_session) OVER (PARTITION BY user_id
                       ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
              FROM marked)
            SELECT min(ts) AS session_start, user_id,
                   count(*) AS n_events, round(sum(value), 4) AS sum_value
            FROM sess GROUP BY user_id, sid
            ORDER BY user_id, session_start"""))

  /** Semi-structured extraction from the props JSON column —
    * regexp-based so both engines agree byte-for-byte.
    */
  private val q56_events_json: Q = (
    (s, dir) => read(s, dir, "events")
      .select(col("event_id"),
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long")
          .as("k"))
      .orderBy(col("event_id")),
    Some("""SELECT event_id,
                   CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)
                     AS k
            FROM events ORDER BY event_id"""))

  /** As-of join (Spark-native extension): each event matched to the
    * latest order of the same key at-or-before its timestamp —
    * oracle-checked against DuckDB's native ASOF JOIN.
    */
  private val q61_asof_join: Q = (
    (s, dir) => {
      val e = read(s, dir, "events")
        .withColumnRenamed("user_id", "k")
      val o = read(s, dir, "orders")
        .withColumnRenamed("o_custkey", "k")
        .select(col("k"), col("o_orderdate"))
      graft.ops.Joins.asofJoin(e, o, "k", "ts", "o_orderdate")
        .select(col("event_id"), col("k").as("user_id"),
          col("asof_o_orderdate"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT e.event_id, e.user_id,
                   o.o_orderdate AS asof_o_orderdate
            FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts)
                  FROM events) e
            ASOF JOIN orders o
              ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
            ORDER BY e.event_id"""))

  /** Stream-stream interval join in batch mode: view -> purchase by
    * the same user within 1 hour (the attribution shape; in streaming
    * both sides are watermarked and state is evicted by the bound).
    * Delay reported in exact microseconds — second-rounding would
    * diverge between engines.
    */
  private val q80_interval_join: Q = (
    (s, dir) => {
      val ev = read(s, dir, "events")
      val views = ev.where(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"))
      val buys = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      Streams.intervalJoin(views, buys, "user_id", "ts", "1 HOUR")
        .select(col("l_user_id").as("user_id"),
          col("l_event_id").as("view_id"),
          col("r_event_id").as("purchase_id"),
          (unix_micros(col("r_ts")) - unix_micros(col("l_ts")))
            .as("delay_us"))
        .orderBy(col("user_id"), col("view_id"), col("purchase_id"))
    },
    Some("""WITH src AS (SELECT event_id, user_id,
                                CAST(ts AS TIMESTAMP) AS ts, event_type
                         FROM events)
            SELECT v.user_id AS user_id, v.event_id AS view_id,
                   p.event_id AS purchase_id,
                   epoch_us(p.ts) - epoch_us(v.ts) AS delay_us
            FROM src v JOIN src p
              ON v.user_id = p.user_id
             AND v.event_type = 'view' AND p.event_type = 'purchase'
             AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL '1 hour'
            ORDER BY user_id, view_id, purchase_id"""))

  /** LEFT-OUTER stream-stream interval join
    * ([[Streams.intervalJoinLeftOuter]]) in batch form: every view
    * with its conversions within 1 hour — INCLUDING the views that
    * never converted (null-extended), the rows q80's inner form
    * drops and the ones a funnel actually wants to count. Grouped to
    * one row per view (conversion count + first purchase id). In
    * streaming both sides are watermarked and the null row emits
    * once the watermark proves no match can arrive (spec-driven
    * through MemoryStream).
    */
  private val q268_interval_left: Q = (
    (s, dir) => {
      val ev = read(s, dir, "events")
      val views = ev.where(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"))
      val buys = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      Streams.intervalJoinLeftOuter(views, buys, "user_id", "ts",
          "1 HOUR")
        .groupBy(col("l_event_id").as("view_id"),
          col("l_user_id").as("user_id"))
        .agg(count(col("r_event_id")).as("n_conversions"),
          min(col("r_event_id")).as("first_purchase_id"))
        .orderBy(col("view_id"))
    },
    Some("""WITH src AS (SELECT event_id, user_id,
                 CAST(ts AS TIMESTAMP) AS ts, event_type
               FROM events)
        SELECT v.event_id AS view_id, v.user_id AS user_id,
               count(p.event_id) AS n_conversions,
               min(p.event_id) AS first_purchase_id
        FROM src v LEFT JOIN src p
          ON v.user_id = p.user_id AND p.event_type = 'purchase'
         AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL '1 hour'
        WHERE v.event_type = 'view'
        GROUP BY 1, 2 ORDER BY view_id"""))

  /** Dedup-at-ingest ORACLE-CHECKED end-to-end: plant a
    * near-duplicate of every 10th document (id + 1000000, one token
    * appended) and run the streaming dedup operator in BATCH mode —
    * same code path the real-stream specs drive through
    * micro-batches. Two choices make DuckDB able to recompute the
    * answer exactly (the q81 portable-simhash trick applied to
    * minhash banding):
    *
    *   - `portable = true`: signatures are the char-polynomial
    *     minhashes ([[graft.llmdata.Dedup.portableMinhashes]]) the
    *     oracle rebuilds bit-for-bit;
    *   - pigeonhole parameterization (bands=16, rows=2, k=32,
    *     threshold=0.6): a pair with est >= 0.6 has <= 12 unequal
    *     signature positions, which can spoil at most 12 of the 16
    *     bands — >= 4 bands collide WITH CERTAINTY, so the LSH
    *     candidate stage misses nothing and the emitted set is
    *     EXACTLY {pairs: est_jaccard >= threshold}, an all-pairs
    *     expression DuckDB evaluates directly (no bucket keys cross
    *     engines).
    *
    * Docs with < 3 tokens (empty shingle set) are gated out on both
    * sides; maxPerBucket is lifted so enrollment caps can't perturb
    * the exact set.
    */
  private val q104_stream_dedup: Q = (
    (s, dir) => {
      val d = read(s, dir, "documents")
      val planted = d.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" extra")).as("text"))
      val docs = d.select(col("doc_id"), col("text"))
        .unionByName(planted)
        .where(size(graft.llmdata.Dedup.normalizeTokens(col("text"))) >= 3)
      graft.streaming.StreamingDedup.distinctPairs(
          graft.streaming.StreamingDedup.dedupStream(
            docs, "doc_id", "text", shingleN = 3, bands = 16, rows = 2,
            threshold = 0.6, maxPerBucket = 1 << 20, portable = true))
        .select(col("doc_a"), col("doc_b"),
          round(col("est_jaccard"), 6).as("est_jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some("""WITH d AS (SELECT doc_id, text FROM documents
                   UNION ALL
                   SELECT doc_id + 1000000, text || ' extra'
                   FROM documents WHERE doc_id % 10 = 0),
             n AS (SELECT doc_id,
                     list_filter(string_split(trim(regexp_replace(
                       regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                       ' +', ' ', 'g')), ' '), t -> t <> '') AS w
                   FROM d),
             sh AS (SELECT doc_id,
                      list_distinct(list_transform(
                        range(1, greatest(len(w) - 1, 1)),
                        i -> array_to_string(w[i:i+2], ' '))) AS sh
                    FROM n WHERE len(w) >= 3),
             hs AS (SELECT doc_id,
                      list_transform(sh, s ->
                        list_reduce(list_prepend(CAST(0 AS BIGINT),
                          list_transform(string_split_regex(s, ''),
                            c -> CAST(ascii(c) AS BIGINT))),
                          (a, b) -> (a * 31 + b) % 1000000007)) AS hs
                    FROM sh),
             sig AS (SELECT doc_id,
                       list_transform(range(1, 33), i ->
                         list_min(list_transform(hs, h ->
                           ((h * ((i * 2654435761) % 1000000007))
                            + ((i * 97531) % 1000000007))
                           % 1000000007))) AS sig
                     FROM hs)
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   round(CAST(len(list_filter(range(1, 33),
                       i -> a.sig[i] = b.sig[i])) AS DOUBLE) / 32,
                     6) AS est_jaccard
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id
            WHERE CAST(len(list_filter(range(1, 33),
                    i -> a.sig[i] = b.sig[i])) AS DOUBLE) / 32 >= 0.6
            ORDER BY doc_a, doc_b"""))

  /** Tokenizer-fertility DRIFT MONITOR (batch twin of the streaming
    * form, the q104 pattern): documents fold into ingest buckets of
    * 100 (`doc_id div 100`), every 5th bucket gets three planted long
    * tokens per document (the drift — ~+16% chars-per-word against
    * ~54-word docs), and [[graft.streaming.DriftMonitor.report]]
    * compares each bucket's fertility against the cumulative prior
    * baseline at an 8% tolerance, chosen so the alert DISCRIMINATES:
    * at sf0.01 every planted bucket fires and no clean one does; at
    * sf0.1 190/200 planted fire with 2/800 false alarms (the
    * cumulative baseline absorbs ~1/5 of the plant, which is the
    * monitor's documented detection floor). The alert decision is a
    * cross-multiplied INTEGER inequality (no floating point), so
    * DuckDB recomputes every `drifted` bit exactly; DriftSpec drives
    * the identical observations through flatMapGroupsWithState over a
    * real MemoryStream under two micro-batch slicings.
    */
  /** Stateful streaming funnel ([[Streams.funnelReach]]) in its batch
    * form under the driver's eye (the q104 convention): per-user
    * ordered-step progress (view -> click -> purchase) from the SAME
    * flatMapGroupsWithState operator that runs incrementally over
    * micro-batches — state re-walks the chained-min per batch, so the
    * final answer is identical under any slicing (replay-determinism
    * spec) and equals this batch run, which DuckDB replays with the
    * chained-CTE form per user.
    */
  private val q172_stream_funnel: Q = (
    (s, dir) => Streams.funnelReach(read(s, dir, "events"),
        Seq("view", "click", "purchase"))
      .toDF().select(col("user_id"), col("reached"))
      .orderBy(col("user_id")),
    Some("""WITH e AS (SELECT user_id, event_type,
                 CAST(ts AS TIMESTAMP) AS t
               FROM events WHERE ts IS NOT NULL
                 AND event_type IN ('view', 'click', 'purchase')),
             s1 AS (SELECT user_id, min(t) AS t1 FROM e
               WHERE event_type = 'view' GROUP BY 1),
             s2 AS (SELECT e.user_id, min(t) AS t2 FROM e
               JOIN s1 USING (user_id)
               WHERE event_type = 'click' AND t > t1 GROUP BY 1),
             s3 AS (SELECT e.user_id, min(t) AS t3 FROM e
               JOIN s2 USING (user_id)
               WHERE event_type = 'purchase' AND t > t2 GROUP BY 1),
             u AS (SELECT DISTINCT user_id FROM e)
        SELECT u.user_id,
               CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
                         WHEN s2.user_id IS NOT NULL THEN 2
                         WHEN s1.user_id IS NOT NULL THEN 1
                         ELSE 0 END AS INTEGER) AS reached
        FROM u LEFT JOIN s1 ON u.user_id = s1.user_id
               LEFT JOIN s2 ON u.user_id = s2.user_id
               LEFT JOIN s3 ON u.user_id = s3.user_id
        ORDER BY u.user_id"""))

  /** Stream-static enrichment ([[Streams.enrich]]) in its batch form
    * under the oracle: events attach the customer market segment by
    * broadcast join (no state, no shuffle of the stream), then
    * aggregate per (segment, type). The streaming run of the SAME
    * transform is spec-pinned equal (StatsAndStreamSpec).
    */
  /** LAST-TOUCH ATTRIBUTION ([[Streams.lastTouchAttribution]]):
    * purchases credited to the latest preceding view/click by the
    * same user within a 7-day lookback, aggregated per channel (with
    * an explicit '(none)' bucket). The as-of machinery is the q61
    * union+window fold — one shuffle on user_id, never a
    * conversions x touches join; the oracle replays it as a bounded
    * join + row_number latest (equivalent because "latest touch
    * within the window" == "latest touch overall, if within the
    * window" — earlier touches are only further outside).
    */
  /** POSITION-BASED (U-shaped) attribution ([[graft.streaming
    * .Streams.positionAttribution]]): 40/20/40 credit over every
    * in-window touch — the multi-touch read between q213 (last) and
    * q226 (first); integer-ppm credits, deterministic positions,
    * '(none)' bucket at full weight.
    */
  private val q302_position_attr: Q = (
    (s, dir) => Streams.positionAttribution(read(s, dir, "events"),
        "purchase", Seq("view", "click"), maxDelaySec = 7L * 86400L)
      .orderBy(col("channel")),
    Some("""WITH e AS (SELECT user_id, event_id,
                 CAST(ts AS TIMESTAMP) AS ts, event_type
               FROM events WHERE ts IS NOT NULL),
             conv AS (SELECT user_id, event_id AS conv_id,
                 ts AS conv_ts
               FROM e WHERE event_type = 'purchase'),
             t0 AS (SELECT user_id, ts AS touch_ts,
                 event_type AS channel, event_id AS touch_id,
                 row_number() OVER (PARTITION BY user_id, ts
                   ORDER BY event_id DESC) AS rn
               FROM e WHERE event_type IN ('view', 'click')),
             touches AS (SELECT user_id, touch_ts, channel, touch_id
               FROM t0 WHERE rn = 1),
             j AS (SELECT conv_id, channel, touch_ts, touch_id
               FROM conv JOIN touches USING (user_id)
               WHERE touch_ts <= conv_ts
                 AND touch_ts >= conv_ts - INTERVAL 7 DAY),
             sc AS (SELECT conv_id, channel,
                 count(*) OVER (PARTITION BY conv_id) AS k,
                 row_number() OVER (PARTITION BY conv_id
                   ORDER BY touch_ts, touch_id) AS pos
               FROM j),
             cr AS (SELECT conv_id, channel,
                 CASE WHEN k = 1 THEN 1000000
                      WHEN k = 2 THEN 500000
                      WHEN pos = 1 OR pos = k THEN 400000
                      ELSE 200000 // (k - 2) END AS credit_ppm
               FROM sc),
             agg AS (SELECT channel,
                 CAST(sum(credit_ppm) AS BIGINT) AS credit_ppm,
                 CAST(count(DISTINCT conv_id) AS BIGINT)
                   AS n_conversions
               FROM cr GROUP BY 1),
             nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM conv
               WHERE conv_id NOT IN (SELECT conv_id FROM cr))
        SELECT channel, credit_ppm, n_conversions FROM agg
        UNION ALL
        SELECT '(none)', n * 1000000, n FROM nn WHERE n > 0
        ORDER BY channel"""))

  private val q213_attribution: Q = (
    (s, dir) => Streams.lastTouchAttribution(read(s, dir, "events"),
        "purchase", Seq("view", "click"), maxDelaySec = 7L * 86400L)
      .groupBy(coalesce(col("channel"), lit("(none)")).as("channel"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy(col("channel")),
    Some(s"""WITH p AS (SELECT event_id, user_id, value,
                 CAST(ts AS TIMESTAMP) AS t
               FROM events
               WHERE event_type = 'purchase' AND ts IS NOT NULL),
             t0 AS (SELECT user_id, event_id, event_type,
                 CAST(ts AS TIMESTAMP) AS t
               FROM events
               WHERE event_type IN ('view', 'click')
                 AND ts IS NOT NULL),
             tch AS (SELECT user_id, t, event_type FROM (
                 SELECT t0.*, row_number() OVER (
                   PARTITION BY user_id, t
                   ORDER BY event_id DESC) AS rn FROM t0)
               WHERE rn = 1),
             j AS (SELECT p.event_id, tch.event_type AS channel,
                 row_number() OVER (PARTITION BY p.event_id
                   ORDER BY tch.t DESC) AS rn
               FROM p JOIN tch ON p.user_id = tch.user_id
                 AND tch.t <= p.t
                 AND tch.t >= p.t - INTERVAL 7 DAY),
             a AS (SELECT event_id, channel FROM j WHERE rn = 1)
        SELECT COALESCE(a.channel, '(none)') AS channel,
               count(*) AS n, ${sqlDsum("p.value")} AS sum_value
        FROM p LEFT JOIN a USING (event_id)
        GROUP BY 1 ORDER BY 1"""))

  /** STREAMING MISRA-GRIES heavy hitters ([[Streams.mgSketch]] +
    * [[Streams.mgHeavyHittersBatch]]): O(buckets·k) total state
    * however many distinct tokens flow past — the bounded-memory
    * sibling of q230's per-token counter (whose state grows with the
    * vocabulary). Batch form under the oracle: sketch candidates →
    * exact recount → global frequency bar cnt·(k+1) > total, which
    * the MG superset guarantee makes EXACT and slicing-invariant
    * (StreamingMgSpec drives the readStream slicings).
    */
  private val q311_stream_mg: Q = (
    (s, dir) => {
      import graft.llmdata.Dedup
      val toks = spread(read(s, dir, "documents"))
        .where(col("text").isNotNull)
        .select(explode(split(Dedup.normalize(col("text")), " "))
          .as("tok"))
        .where(col("tok") =!= "")
      Streams.mgHeavyHittersBatch(toks, "tok", k = 300, buckets = 8)
        .orderBy(col("tok"))
    },
    Some("""WITH toks AS (SELECT unnest(string_split(trim(
                 regexp_replace(regexp_replace(lower(text),
                   '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), ' '))
                 AS t
               FROM documents WHERE text IS NOT NULL),
             tok2 AS (SELECT t FROM toks WHERE t <> ''),
             tot AS (SELECT count(*) AS n FROM tok2)
        SELECT t AS tok, count(*) AS cnt
        FROM tok2 CROSS JOIN tot
        GROUP BY t, n HAVING count(*) * 301 > n
        ORDER BY tok"""))

  /** STREAMING KMV distinct sketch ([[Streams.kmvSketchStream]]) in
    * its batch form under the oracle: the per-segment k-minimum hash
    * set maintained through `flatMapGroupsWithState` (bounded
    * TreeSet fold, k longs of state per segment), then the same
    * [[graft.llmdata.Sketches.kmvEstimate]] close as q348 — and the
    * oracle IS q348's SQL, because the k-minimum set is arrival-
    * order and slicing INVARIANT (the property StreamingKmvSpec pins
    * by driving two different MemoryStream slicings to the identical
    * sketch). The streaming distinct counter whose answer equals its
    * batch twin bit-for-bit.
    */
  private val q351_stream_kmv: Q = (
    (s, dir) => graft.llmdata.Sketches.kmvEstimate(
        Streams.kmvSketchStream(
          read(s, dir, "orders")
            .select(col("o_orderpriority"), col("o_custkey")),
          "o_orderpriority", "o_custkey", k = 256).toDF(),
        k = 256)
      .orderBy(col("segment")),
    Some("""WITH h AS (SELECT DISTINCT o_orderpriority AS segment,
                 ((o_custkey % 1000000007) * 2654435761 + 42)
                   % 1000000007 AS h
               FROM orders),
             r AS (SELECT segment, h, row_number() OVER (
                 PARTITION BY segment ORDER BY h) AS rank FROM h),
             sk AS (SELECT segment, rank, h FROM r WHERE rank <= 256),
             ag AS (SELECT segment,
                 CAST(count(*) AS BIGINT) AS n_sketch,
                 max(h) AS hk FROM sk GROUP BY 1)
        SELECT segment, n_sketch,
               CASE WHEN n_sketch < 256 THEN n_sketch
                 ELSE CAST(floor(255.0 * 1000000007.0
                   / CAST(hk AS DOUBLE)) AS BIGINT) END
                 AS est_distinct
        FROM ag ORDER BY segment"""))

  /** Streaming threshold counter ([[Streams.thresholdCounter]]) in
    * its batch form under the oracle: exact per-token running counts
    * with a crossing flag, state = one long per token. Emitted
    * crossed set == the batch census with HAVING — slicing-invariant
    * because counts are exact sums (StatsAndStreamSpec drives the
    * MemoryStream slicings).
    */
  private val q230_stream_threshold: Q = (
    (s, dir) => {
      import graft.llmdata.Dedup
      val toks = spread(read(s, dir, "documents"))
        .where(col("text").isNotNull)
        .select(explode(split(Dedup.normalize(col("text")), " "))
          .as("tok"))
        .where(col("tok") =!= "")
      Streams.thresholdCounter(toks, "tok", threshold = 200L)
        .toDF().where(col("crossed"))
        .select(col("token"), col("n"))
        .orderBy(col("token"))
    },
    Some("""WITH toks AS (SELECT unnest(string_split(trim(
                 regexp_replace(regexp_replace(lower(text),
                   '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), ' '))
                 AS t
               FROM documents WHERE text IS NOT NULL)
        SELECT t AS token, count(*) AS n FROM toks
        WHERE t <> '' GROUP BY t HAVING count(*) >= 200
        ORDER BY token"""))

  /** Seasonal-naive forecast baseline
    * ([[graft.functions.Stats.seasonalNaiveMae]]): hourly event
    * counts, forecast = yesterday's count at the same hour (lag over
    * the (type, hour-of-day) partition), MAE per type. Integer
    * errors; the MAE ratio rounds 6dp.
    */
  /** SEASONAL DECOMPOSITION ([[graft.functions.Stats
    * .seasonalDecompose]] — one median-polish sweep): hourly event
    * counts split into value = seasonal(hour) + trend(date) +
    * residual per event type, every component an exact integer
    * (discrete-quantile medians — quantile_disc rank both engines),
    * the robust additive model a float moving-average decomposition
    * could never hash-match. Windows are bounded by (type x 24 hours)
    * and (type x days) — time resolution, not row count.
    */
  private val q256_seasonal_decompose: Q = (
    (s, dir) => {
      val c = read(s, dir, "events").where(col("ts").isNotNull)
        .groupBy(col("event_type"), to_date(col("ts")).as("per"),
          hour(col("ts")).as("pos"))
        .agg(count(lit(1)).as("n"))
      graft.functions.Stats.seasonalDecompose(c, "event_type", "per",
          "pos", "n")
        .orderBy(col("event_type"), col("per"), col("pos"))
    },
    Some("""WITH c AS (SELECT event_type,
                 CAST(CAST(ts AS TIMESTAMP) AS DATE) AS per,
                 CAST(hour(CAST(ts AS TIMESTAMP)) AS INTEGER) AS pos,
                 count(*) AS n
               FROM events WHERE ts IS NOT NULL GROUP BY 1, 2, 3),
             seas AS (SELECT event_type, pos,
                 quantile_disc(n, 0.5) AS seasonal
               FROM c GROUP BY 1, 2),
             d AS (SELECT c.event_type, c.per, c.pos, c.n, seasonal,
                 c.n - seasonal AS detr
               FROM c JOIN seas USING (event_type, pos)),
             tr AS (SELECT event_type, per,
                 quantile_disc(detr, 0.5) AS trend
               FROM d GROUP BY 1, 2)
        SELECT d.event_type, d.per, d.pos, d.n, seasonal, trend,
               d.n - seasonal - trend AS residual
        FROM d JOIN tr USING (event_type, per)
        ORDER BY event_type, per, pos"""))

  /** STREAMING BASELINE ALERT ([[graft.streaming.Streams
    * .baselineAlert]]): hourly windowed counts vs the hour-of-day
    * seasonal median (bounded broadcast baseline), alert on the
    * pure-integer rule n > 2·expected — the real-time sibling of
    * q291's batch read, written so the identical code runs under
    * readStream+watermark (windowed agg + stream-static join, both
    * append-supported). Oracle checks the batch form.
    */
  /** STREAMING SRM monitor ([[graft.streaming.Streams.srmMonitor]]):
    * per (day, event_type) exposure counts by parity arm, χ²₁ against
    * the 50/50 design, portable-CDF p, alarm at p < 0.001 — q317's
    * assignment audit as a continuously-running pager. One windowed
    * grouped aggregate (append-supported under a watermark;
    * StatsAndStreamSpec pins two-slicing readStream parity).
    */
  private val q324_stream_srm: Q = (
    (s, dir) => graft.streaming.Streams.srmMonitor(
        read(s, dir, "events").where(col("ts").isNotNull),
        inA = (col("user_id") % 2 === 0).cast("long"), width = "1 day")
      .orderBy(col("window_start"), col("event_type")),
    Some("""WITH e AS (SELECT event_type, user_id,
                 CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE ts IS NOT NULL),
             cells AS (SELECT date_trunc('day', ts) AS window_start,
                 event_type,
                 CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_a,
                 CAST(sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END)
                   AS BIGINT) AS n_b
               FROM e GROUP BY 1, 2),
             ch AS (SELECT *,
                 (CAST(n_a AS DOUBLE) -
                   CAST(n_a + n_b AS DOUBLE) * 0.5) *
                 (CAST(n_a AS DOUBLE) -
                   CAST(n_a + n_b AS DOUBLE) * 0.5) /
                   (CAST(n_a + n_b AS DOUBLE) * 0.5) +
                 (CAST(n_b AS DOUBLE) -
                   CAST(n_a + n_b AS DOUBLE) * 0.5) *
                 (CAST(n_b AS DOUBLE) -
                   CAST(n_a + n_b AS DOUBLE) * 0.5) /
                   (CAST(n_a + n_b AS DOUBLE) * 0.5) AS chi2
               FROM cells),
             zc AS (SELECT *, sqrt(chi2) AS z FROM ch),
             ph AS (SELECT *,
                 1.0 / (1.0 + 0.2316419 * abs(z)) AS t FROM zc),
             pv AS (SELECT *,
                 2.0 * (1.0 - (1.0 - exp(-(abs(z) * abs(z)) / 2.0)
                   / 2.5066282746310002 *
                   (t * (0.319381530 + t * (-0.356563782 +
                     t * (1.781477937 + t * (-1.821255978 +
                       t * 1.330274429))))))) AS p
               FROM ph)
        SELECT window_start, event_type, n_a, n_b,
               round(chi2, 6) AS chi2, round(p, 6) AS p_value,
               CAST(p < 0.001 AS INTEGER) AS srm_flag
        FROM pv ORDER BY window_start, event_type"""))

  /** SHAPLEY channel attribution
    * ([[graft.streaming.Streams.shapleyAttribution]]): conversion
    * credit as average marginal contribution over the touched-set
    * coalition lattice — the cooperative-game answer next to the
    * first/last/U-shaped heuristics. One grouped pass + 2^k-lattice
    * algebra, exact ppm/factorial integers.
    */
  /** MARKOV REMOVAL-EFFECT ATTRIBUTION ([[graft.streaming.Streams
    * .markovRemovalEffects]]): data-driven channel credit from the
    * first-order journey chain — conversion probability lost when
    * each channel's in-flows redirect to the null absorber. The
    * 24-round integer value iteration (1e9 scale, floor division)
    * replays bit-for-bit: the oracle unrolls every round as a CTE
    * over the (variant, src, dst) transition census — the q169
    * integer-PageRank discipline applied to absorption. Closes the
    * attribution family: heuristics (q213/q226/q302), coalition
    * (q336 Shapley), and now chain-removal.
    */
  private val q350_markov_attr: Q = {
    val rounds = 24
    val channels = Seq("click", "signup", "view")
    val chList = channels.map(c => s"'$c'").mkString(", ")
    val iter = (1 to rounds).map { r =>
      s"""p$r AS MATERIALIZED (SELECT t.variant, t.src AS state,
             CAST(sum(t.c * CASE WHEN t.dst = 'conv'
                 THEN 1000000000 WHEN t.dst = 'null' THEN 0
                 ELSE COALESCE(pp.p, 0) END) // ns.n AS BIGINT) AS p
           FROM vtrans t
           JOIN vouts ns ON ns.variant = t.variant
                        AND ns.src = t.src
           LEFT JOIN p${r - 1} pp ON pp.variant = t.variant
                        AND pp.state = t.dst
           GROUP BY 1, 2, ns.n)"""
    }.mkString(",\n           ")
    ((s: org.apache.spark.sql.SparkSession, dir: String) =>
      graft.streaming.Streams.markovRemovalEffects(
        read(s, dir, "events"), channels, "purchase",
        rounds = rounds),
      Some(s"""WITH fc AS (SELECT user_id,
                 min(CAST(ts AS TIMESTAMP)) AS ct FROM events
               WHERE event_type = 'purchase' AND ts IS NOT NULL
               GROUP BY 1),
             tch AS (SELECT e.user_id, e.event_type AS s,
                 CAST(e.ts AS TIMESTAMP) AS t, e.event_id,
                 CASE WHEN fc.ct IS NOT NULL THEN 1 ELSE 0 END
                   AS conv
               FROM events e LEFT JOIN fc USING (user_id)
               WHERE e.event_type IN ($chList)
                 AND e.ts IS NOT NULL
                 AND (fc.ct IS NULL
                      OR CAST(e.ts AS TIMESTAMP) < fc.ct)),
             sq AS (SELECT *, lead(s) OVER w AS nxt,
                 row_number() OVER w AS rn
               FROM tch
               WINDOW w AS (PARTITION BY user_id
                            ORDER BY t, event_id)),
             trans AS (
               SELECT s AS src, COALESCE(nxt,
                   CASE WHEN conv = 1 THEN 'conv' ELSE 'null' END)
                 AS dst FROM sq
               UNION ALL
               SELECT 'start', s FROM sq WHERE rn = 1
               UNION ALL
               SELECT 'start', 'conv' FROM fc
               WHERE user_id NOT IN (SELECT DISTINCT user_id
                                     FROM tch)),
             census AS (SELECT src, dst,
                 CAST(count(*) AS BIGINT) AS c
               FROM trans GROUP BY 1, 2),
             variants AS (SELECT unnest(['(full)', $chList])
               AS variant),
             vtrans AS (SELECT v.variant, census.src,
                 CASE WHEN census.dst = v.variant THEN 'null'
                   ELSE census.dst END AS dst,
                 CAST(sum(c) AS BIGINT) AS c
               FROM census CROSS JOIN variants v
               GROUP BY 1, 2, 3),
             vouts AS (SELECT variant, src,
                 CAST(sum(c) AS BIGINT) AS n FROM vtrans
               GROUP BY 1, 2),
             p0 AS (SELECT variant, src AS state,
                 CAST(0 AS BIGINT) AS p FROM vouts),
             $iter,
             ch AS (SELECT unnest([$chList]) AS channel)
        SELECT ch.channel, f.p AS p_conv_q, rm.p AS p_removed_q,
               CASE WHEN f.p = 0 THEN 0
                 ELSE CAST((f.p - rm.p) * 1000000 // f.p AS BIGINT)
                 END AS removal_ppm
        FROM ch
        JOIN p$rounds f ON f.variant = '(full)'
                       AND f.state = 'start'
        JOIN p$rounds rm ON rm.variant = ch.channel
                        AND rm.state = 'start'
        ORDER BY ch.channel"""))
  }

  private val q336_shapley: Q = {
    val channels = Seq("view", "click", "signup", "error")
    val weights = Seq(6L, 2L, 2L, 6L) // s!(3-s)! for s = 0..3
    val maskExpr = channels.zipWithIndex.map { case (c, i) =>
      s"${1L << i} * max(CASE WHEN event_type = '$c' THEN 1 ELSE 0 END)"
    }.mkString(" + ")
    val wCase = "CASE pop WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 " +
      "ELSE 6 END"
    val branches = channels.zipWithIndex.map { case (c, i) =>
      val bit = 1L << i
      s"""SELECT '$c' AS channel, ($wCase) * (b.v - a.v) AS term
          FROM (SELECT mask, v,
                ((mask // 1) % 2 + (mask // 2) % 2 +
                 (mask // 4) % 2 + (mask // 8) % 2) AS pop
              FROM lat WHERE (mask & $bit) = 0) a
          JOIN lat b ON b.mask = (a.mask | $bit)"""
    }.mkString(" UNION ALL ")
    ((s: org.apache.spark.sql.SparkSession, dir: String) =>
      graft.streaming.Streams.shapleyAttribution(
        read(s, dir, "events"), channels,
        conversionType = "purchase"),
      Some(s"""WITH pu AS (SELECT user_id,
                 CAST($maskExpr AS BIGINT) AS mask,
                 CAST(max(CASE WHEN event_type = 'purchase' THEN 1
                   ELSE 0 END) AS BIGINT) AS conv
               FROM events GROUP BY 1),
             census AS (SELECT mask, count(*) AS nu,
                 CAST(sum(conv) AS BIGINT) AS nc FROM pu GROUP BY 1),
             lat AS (SELECT i AS mask,
                 CASE WHEN COALESCE(nu, 0) > 0
                   THEN COALESCE(nc, 0) * 1000000 // nu
                   ELSE 0 END AS v
               FROM generate_series(0, 15) AS t(i)
               LEFT JOIN census ON i = census.mask),
             terms AS ($branches)
        SELECT channel, CAST(sum(term) AS BIGINT) AS shapley_num,
               round(CAST(sum(term) AS DOUBLE) / 24.0 / 1000000.0, 6)
                 AS shapley
        FROM terms GROUP BY 1 ORDER BY channel"""))
  }

  /** NEXT-EVENT PREDICTION eval ([[graft.ops.Eval
    * .nextEventAccuracy]]): majority-transition predictor trained on
    * a hash split of users, exact-match accuracy on held-out users'
    * transitions — q275's Markov matrix turned into a graded model.
    * Per-user lead windows; broadcast state-bounded predictor;
    * portable-hash split.
    */
  private val q340_next_event: Q = (
    (s, dir) => graft.ops.Eval.nextEventAccuracy(
      read(s, dir, "events").where(col("ts").isNotNull),
      key = col("user_id"),
      seqCols = Seq(col("ts"), col("event_id")),
      state = col("event_type")),
    Some("""WITH e AS (SELECT user_id, event_id,
                 CAST(ts AS TIMESTAMP) AS ts, event_type
               FROM events WHERE ts IS NOT NULL),
             pairs AS (SELECT user_id, event_type AS st,
                 lead(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS nxt
               FROM e),
             p2 AS (SELECT user_id, st, nxt,
                 CAST(((user_id * 2654435761 + 42) % 1000000007) % 2
                   = 0 AS INTEGER) AS train
               FROM pairs WHERE nxt IS NOT NULL),
             tc AS (SELECT st, nxt, count(*) AS c FROM p2
               WHERE train = 1 GROUP BY 1, 2),
             pr AS (SELECT st,
                 CAST(n_train_pairs AS BIGINT) AS n_train_pairs,
                 nxt AS predicted
               FROM (SELECT st, nxt,
                   sum(c) OVER (PARTITION BY st) AS n_train_pairs,
                   row_number() OVER (PARTITION BY st
                     ORDER BY c DESC, nxt ASC) AS rn
                 FROM tc) WHERE rn = 1),
             te AS (SELECT st, nxt FROM p2 WHERE train = 0)
        SELECT te.st AS state,
               COALESCE(n_train_pairs, 0) AS n_train_pairs,
               count(*) AS n_test_pairs, pr.predicted,
               CAST(sum(CASE WHEN te.nxt = pr.predicted THEN 1
                 ELSE 0 END) AS BIGINT) AS n_correct,
               round(CAST(sum(CASE WHEN te.nxt = pr.predicted THEN 1
                 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
                 AS accuracy
        FROM te LEFT JOIN pr ON te.st = pr.st
        GROUP BY 1, 2, 4 ORDER BY state"""))

  private val q297_stream_alert: Q = (
    (s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val ev = read(s, dir, "events").where(col("ts").isNotNull)
      val hourly = ev.groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("n"))
        .withColumn("pos", hour(col("h")))
      val wAll = W.partitionBy(col("event_type"), col("pos"))
      val base = hourly
        .withColumn("__r", row_number().over(
          wAll.orderBy(col("n"))))
        .withColumn("__c", count(lit(1)).over(wAll))
        .withColumn("__m", max(when(col("__r") ===
          greatest(ceil(lit(0.5) * col("__c")), lit(1L)), col("n")))
          .over(wAll))
        .groupBy(col("event_type"), col("pos"))
        .agg(max(col("__m")).as("expected"))
      graft.streaming.Streams.baselineAlert(ev, base, "1 hour",
          factorNum = 2L, factorDen = 1L)
        .select(col("window_start"), col("event_type"), col("n"),
          col("expected"), col("alert"))
        .orderBy(col("window_start"), col("event_type"))
    },
    Some("""WITH e AS (SELECT event_type,
                 CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE ts IS NOT NULL),
             hourly AS (SELECT event_type,
                 date_trunc('hour', ts) AS h, count(*) AS n
               FROM e GROUP BY 1, 2),
             base AS (SELECT event_type,
                 CAST(hour(h) AS INTEGER) AS pos,
                 quantile_disc(n, 0.5) AS expected
               FROM hourly GROUP BY 1, 2)
        SELECT h AS window_start, hourly.event_type, n, expected,
               CAST(n * 1 > expected * 2 AS BIGINT) AS alert
        FROM hourly JOIN base
          ON hourly.event_type = base.event_type
         AND CAST(hour(h) AS INTEGER) = base.pos
        ORDER BY window_start, hourly.event_type"""))

  /** SEASONAL-ADJUSTED ANOMALIES — q256's median-polish
    * decomposition composed with q186's robust flag, applied to the
    * RESIDUAL: a 2am spike that is normal at 2pm only becomes
    * visible after the hour-of-day seasonal is removed, which is
    * exactly what a raw-count threshold (q186) cannot express.
    * Integer residuals, exact discrete quantiles, integer-exact
    * flag comparison.
    */
  private val q291_seasonal_anomaly: Q = (
    (s, dir) => {
      val c = read(s, dir, "events").where(col("ts").isNotNull)
        .groupBy(col("event_type"), to_date(col("ts")).as("per"),
          hour(col("ts")).as("pos"))
        .agg(count(lit(1)).as("n"))
      val dec = graft.functions.Stats.seasonalDecompose(c,
          "event_type", "per", "pos", "n")
        .select(col("event_type"), col("per"), col("pos"), col("n"),
          col("residual"))
      graft.functions.Stats.robustAnomalies(dec, "event_type",
          "residual", k = 3.0)
        .where(col("is_anomaly") === 1)
        .select(col("event_type"), col("per"), col("pos"), col("n"),
          col("residual"), col("med"), col("iqr"))
        .orderBy(col("event_type"), col("per"), col("pos"))
    },
    Some("""WITH c AS (SELECT event_type,
                 CAST(CAST(ts AS TIMESTAMP) AS DATE) AS per,
                 CAST(hour(CAST(ts AS TIMESTAMP)) AS INTEGER) AS pos,
                 count(*) AS n
               FROM events WHERE ts IS NOT NULL GROUP BY 1, 2, 3),
             seas AS (SELECT event_type, pos,
                 quantile_disc(n, 0.5) AS seasonal
               FROM c GROUP BY 1, 2),
             d AS (SELECT c.event_type, c.per, c.pos, c.n, seasonal,
                 c.n - seasonal AS detr
               FROM c JOIN seas USING (event_type, pos)),
             tr AS (SELECT event_type, per,
                 quantile_disc(detr, 0.5) AS trend
               FROM d GROUP BY 1, 2),
             r AS (SELECT d.event_type, d.per, d.pos, d.n,
                 d.n - seasonal - trend AS residual
               FROM d JOIN tr USING (event_type, per)),
             q AS (SELECT event_type,
                 quantile_disc(residual, 0.25) AS q25,
                 quantile_disc(residual, 0.5) AS med,
                 quantile_disc(residual, 0.75) AS q75
               FROM r GROUP BY 1)
        SELECT r.event_type, r.per, r.pos, r.n, r.residual,
               med, q75 - q25 AS iqr
        FROM r JOIN q USING (event_type)
        WHERE abs(r.residual - med) > 3.0 * (q75 - q25)
        ORDER BY event_type, per, pos"""))

  /** INTEGER CUSUM change monitor ([[graft.functions.Stats.cusum]],
    * Page 1954): hourly event counts per type against the per-type
    * MEDIAN baseline (discrete quantile — integer), one-sided
    * cumulative sums via the running-sum-minus-running-min closed
    * form (two frames over one window per series, no sequential
    * state), integer slack and threshold so the alarm bit is
    * engine-invariant. The drift monitor q139 judges batch-shaped
    * ratios; CUSUM accumulates SMALL sustained shifts a per-batch
    * test never sees.
    */
  private val q258_cusum: Q = (
    (s, dir) => {
      val c = read(s, dir, "events").where(col("ts").isNotNull)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("n"))
      val med = graft.functions.Stats.groupQuantilesDisc(
        c, "event_type", "n", Seq(("m", 0.5)))
      graft.functions.Stats.cusum(
          c.join(broadcast(med), Seq("event_type")),
          "event_type", "h", "n", col("m"), slack = 2L,
          threshold = 30L)
        .orderBy(col("event_type"), col("h"))
    },
    Some("""WITH c AS (SELECT event_type,
                 date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
                 count(*) AS n
               FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
             med AS (SELECT event_type, quantile_disc(n, 0.5) AS m
               FROM c GROUP BY 1),
             d AS (SELECT c.event_type, c.h, c.n, m
               FROM c JOIN med USING (event_type)),
             p AS (SELECT event_type, h, n,
                 CAST(sum(n - m - 2) OVER w AS BIGINT) AS pp,
                 CAST(sum(-(n - m + 2)) OVER w AS BIGINT) AS pn
               FROM d WINDOW w AS (PARTITION BY event_type
                 ORDER BY h ROWS UNBOUNDED PRECEDING)),
             sc AS (SELECT event_type, h, n,
                 pp - least(min(pp) OVER w, 0) AS s_pos,
                 pn - least(min(pn) OVER w, 0) AS s_neg
               FROM p WINDOW w AS (PARTITION BY event_type
                 ORDER BY h ROWS UNBOUNDED PRECEDING))
        SELECT event_type, h, n, s_pos, s_neg,
               CAST(CASE WHEN s_pos > 30 OR s_neg > 30 THEN 1
                    ELSE 0 END AS INTEGER) AS alarm
        FROM sc ORDER BY event_type, h"""))

  /** TRUNCATED integer-weight EWMA ([[graft.functions.Stats
    * .ewmaTruncated]]): hourly counts smoothed by 16 exact
    * driver-computed halving weights — a fixed linear combination of
    * lags in pure long arithmetic, where a recursive float EWMA
    * could never hash-match (tail weight 2^-16 is below the 1e6
    * scale grain, so truncation is invisible). The oracle embeds the
    * IDENTICAL weight literals, generated from the same BigInt
    * formula.
    */
  private val q273_ewma: Q = {
    val W = 16
    val weights: Seq[Long] = {
      var d = BigInt(1)
      (0 until W).map { _ =>
        val x = (BigInt(1000000) / d).toLong; d *= 2; x }
    }
    val sTerms = weights.zipWithIndex.map { case (wk, k) =>
      if (k == 0) s"n * $wk"
      else s"COALESCE(lag(n, $k) OVER w * $wk, 0)" }.mkString(" + ")
    val nTerms = (0 until W).map(k =>
      if (k == 0) "1"
      else s"CASE WHEN lag(n, $k) OVER w IS NOT NULL THEN 1 " +
        "ELSE 0 END").mkString(" + ")
    val wTerms = weights.zipWithIndex.map { case (wk, k) =>
      if (k == 0) s"$wk"
      else s"CASE WHEN lag(n, $k) OVER w IS NOT NULL THEN $wk " +
        "ELSE 0 END" }.mkString(" + ")
    ((s: org.apache.spark.sql.SparkSession, dir: String) => {
      val c = read(s, dir, "events").where(col("ts").isNotNull)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("n"))
      graft.functions.Stats.ewmaTruncated(c, "event_type", "h", "n",
          num = 1L, den = 2L, window = W)
        .select(col("event_type"), col("h"), col("n"),
          col("smoothed_q"), col("n_terms"), col("weight_sum"))
        .orderBy(col("event_type"), col("h"))
    },
      Some(s"""WITH c AS (SELECT event_type,
                 date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
                 count(*) AS n
               FROM events WHERE ts IS NOT NULL GROUP BY 1, 2)
        SELECT event_type, h, n,
               CAST($sTerms AS BIGINT) AS smoothed_q,
               CAST($nTerms AS BIGINT) AS n_terms,
               CAST($wTerms AS BIGINT) AS weight_sum
        FROM c WINDOW w AS (PARTITION BY event_type ORDER BY h)
        ORDER BY event_type, h"""))
  }

  /** AUTOCORRELATION diagnostic ([[graft.functions.Stats
    * .autocorrelation]]): r_1..r_7 of the daily count series per
    * event type — the memory/seasonality read taken before picking
    * any forecaster. Exact-decimal centered cross-products, one
    * double divide per lag, 6dp; the oracle is generated per lag
    * from the same K.
    */
  private val q274_acf: Q = {
    val K = 7
    val lagCols = (1 to K).map(k =>
      s"lag(x, $k) OVER w AS l$k").mkString(", ")
    val aggCols = (1 to K).map(k =>
      s"""CAST(sum(CAST(CASE WHEN l$k IS NOT NULL
            THEN (x - m) * (l$k - m) END AS DECIMAL(38,10)))
            AS DOUBLE) AS num$k,
          CAST(sum(CASE WHEN l$k IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS np$k""").mkString(", ")
    val branches = (1 to K).map(k =>
      s"""SELECT event_type, CAST($k AS BIGINT) AS lag,
            np$k AS n_pairs,
            round(COALESCE(num$k, 0.0) / den, 6) AS acf
          FROM a""").mkString(" UNION ALL ")
    ((s: org.apache.spark.sql.SparkSession, dir: String) => {
      val c = read(s, dir, "events").where(col("ts").isNotNull)
        .groupBy(col("event_type"), to_date(col("ts")).as("per"))
        .agg(count(lit(1)).as("n"))
      graft.functions.Stats.autocorrelation(c, "event_type", "per",
          "n", maxLag = K)
        .orderBy(col("event_type"), col("lag"))
    },
      Some(s"""WITH c AS (SELECT event_type,
                 CAST(CAST(ts AS TIMESTAMP) AS DATE) AS per,
                 count(*) AS n
               FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
             mm AS (SELECT event_type,
                 CAST(sum(CAST(n AS DECIMAL(25,6))) AS DOUBLE)
                   / count(n) AS m
               FROM c GROUP BY 1),
             j AS (SELECT c.event_type, per, CAST(n AS DOUBLE) AS x,
                 m FROM c JOIN mm USING (event_type)),
             l AS (SELECT event_type, x, m, $lagCols FROM j
               WINDOW w AS (PARTITION BY event_type ORDER BY per)),
             a AS (SELECT event_type,
                 CAST(sum(CAST((x - m) * (x - m) AS DECIMAL(38,10)))
                   AS DOUBLE) AS den,
                 $aggCols
               FROM l GROUP BY 1)
        $branches ORDER BY event_type, lag"""))
  }

  /** MARKOV TRANSITION MATRIX ([[graft.functions.Stats
    * .transitionMatrix]]): what users do NEXT — per-user next-event
    * pairs (event_id tiebreak makes the sequence total-ordered),
    * counts, and row-conditional probability as integer ppm (floor
    * division, exact). The first-order behavioral model the funnel /
    * attribution entries condition on.
    */
  private val q275_transition: Q = (
    (s, dir) => graft.functions.Stats.transitionMatrix(
        read(s, dir, "events").where(col("ts").isNotNull),
        key = "user_id", ord = "ts", tiebreak = "event_id",
        state = "event_type")
      .orderBy(col("from_state"), col("to_state")),
    Some("""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                 event_id, event_type
               FROM events WHERE ts IS NOT NULL),
             p AS (SELECT event_type AS from_state,
                 lead(event_type, 1) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS to_state
               FROM e),
             c AS (SELECT from_state, to_state,
                 CAST(count(*) AS BIGINT) AS n
               FROM p WHERE to_state IS NOT NULL GROUP BY 1, 2),
             t AS (SELECT from_state, to_state, n,
                 CAST(sum(n) OVER (PARTITION BY from_state)
                   AS BIGINT) AS row_total
               FROM c)
        SELECT from_state, to_state, n, row_total,
               CAST((n * 1000000) // row_total AS BIGINT) AS prob_ppm
        FROM t ORDER BY from_state, to_state"""))

  /** PACF lags 1..3 ([[graft.functions.Stats.pacf]]): the
    * Durbin-Levinson recursion unrolled to closed form over the
    * 6dp-rounded ACF of the daily count series — the AR-order
    * diagnostic next to q274's MA read. Rounded r's are exact
    * decimals on both engines, so each pacf is a short fixed-order
    * double expression.
    */
  private val q276_pacf: Q = (
    (s, dir) => {
      val c = read(s, dir, "events").where(col("ts").isNotNull)
        .groupBy(col("event_type"), to_date(col("ts")).as("per"))
        .agg(count(lit(1)).as("n"))
      graft.functions.Stats.pacf(c, "event_type", "per", "n")
        .orderBy(col("event_type"))
    },
    Some("""WITH c AS (SELECT event_type,
                 CAST(CAST(ts AS TIMESTAMP) AS DATE) AS per,
                 count(*) AS n
               FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
             mm AS (SELECT event_type,
                 CAST(sum(CAST(n AS DECIMAL(25,6))) AS DOUBLE)
                   / count(n) AS m
               FROM c GROUP BY 1),
             j AS (SELECT c.event_type, per, CAST(n AS DOUBLE) AS x,
                 m FROM c JOIN mm USING (event_type)),
             l AS (SELECT event_type, x, m,
                 lag(x, 1) OVER w AS l1, lag(x, 2) OVER w AS l2,
                 lag(x, 3) OVER w AS l3
               FROM j
               WINDOW w AS (PARTITION BY event_type ORDER BY per)),
             a AS (SELECT event_type,
                 CAST(sum(CAST((x - m) * (x - m) AS DECIMAL(38,10)))
                   AS DOUBLE) AS den,
                 CAST(sum(CAST(CASE WHEN l1 IS NOT NULL
                     THEN (x - m) * (l1 - m) END AS DECIMAL(38,10)))
                   AS DOUBLE) AS num1,
                 CAST(sum(CAST(CASE WHEN l2 IS NOT NULL
                     THEN (x - m) * (l2 - m) END AS DECIMAL(38,10)))
                   AS DOUBLE) AS num2,
                 CAST(sum(CAST(CASE WHEN l3 IS NOT NULL
                     THEN (x - m) * (l3 - m) END AS DECIMAL(38,10)))
                   AS DOUBLE) AS num3
               FROM l GROUP BY 1),
             r AS (SELECT event_type,
                 round(COALESCE(num1, 0.0) / den, 6) AS r1,
                 round(COALESCE(num2, 0.0) / den, 6) AS r2,
                 round(COALESCE(num3, 0.0) / den, 6) AS r3
               FROM a),
             d AS (SELECT event_type, r1, r2, r3,
                 (r2 - r1 * r1) / nullif(1.0 - r1 * r1, 0.0) AS p2
               FROM r),
             d2 AS (SELECT *, r1 * (1.0 - p2) AS phi21 FROM d)
        SELECT event_type, round(r1, 6) AS pacf1,
               round(p2, 6) AS pacf2,
               round((r3 - phi21 * r2 - p2 * r1) /
                 nullif(1.0 - phi21 * r1 - p2 * r2, 0.0), 6) AS pacf3
        FROM d2 ORDER BY event_type"""))

  /** SPLIT-CONFORMAL prediction intervals ([[graft.functions.Stats
    * .splitConformal]]): the per-(type, hour) TRAIN-half median
    * forecasts hourly counts, calibration-half |residuals| yield the
    * finite-sample qhat at exact rank ceil((n+1)*0.9) — the
    * distribution-free 90% interval half-width, with the audit
    * coverage count. Day-parity split (engine-replayable), integer
    * residuals, discrete-quantile medians: every number exact.
    */
  private val q272_conformal: Q = (
    (s, dir) => {
      val c = read(s, dir, "events").where(col("ts").isNotNull)
        .groupBy(col("event_type"), to_date(col("ts")).as("per"),
          hour(col("ts")).as("pos"))
        .agg(count(lit(1)).as("n"))
        .withColumn("__day",
          datediff(col("per"), to_date(lit("1970-01-01"))))
      val train = c.where(col("__day") % 2 === 1)
        .withColumn("g", concat_ws("|", col("event_type"),
          col("pos")))
      val med = graft.functions.Stats.groupQuantilesDisc(
        train, "g", "n", Seq(("pred", 0.5)))
      val cal = c.where(col("__day") % 2 === 0)
        .withColumn("g", concat_ws("|", col("event_type"),
          col("pos")))
        .join(med, Seq("g"))
      graft.functions.Stats.splitConformal(cal, "event_type",
          col("n") - col("pred"), alphaNum = 1L, alphaDen = 10L)
        .orderBy(col("event_type"))
    },
    Some("""WITH c AS (SELECT event_type,
                 CAST(CAST(ts AS TIMESTAMP) AS DATE) AS per,
                 CAST(hour(CAST(ts AS TIMESTAMP)) AS INTEGER) AS pos,
                 count(*) AS n
               FROM events WHERE ts IS NOT NULL GROUP BY 1, 2, 3),
             d AS (SELECT *, CAST(per - DATE '1970-01-01' AS BIGINT)
                 AS dd FROM c),
             med AS (SELECT event_type, pos,
                 quantile_disc(n, 0.5) AS pred
               FROM d WHERE dd % 2 = 1 GROUP BY 1, 2),
             r AS (SELECT d.event_type, abs(d.n - pred) AS ar
               FROM d JOIN med USING (event_type, pos)
               WHERE dd % 2 = 0),
             rk AS (SELECT event_type, ar,
                 row_number() OVER (PARTITION BY event_type
                   ORDER BY ar) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS nn
               FROM r),
             q AS (SELECT event_type,
                 max(CASE WHEN rn = least(nn,
                   ((nn + 1) * 9 + 9) // 10) THEN ar END) AS qhat,
                 max(nn) AS n_cal
               FROM rk GROUP BY 1)
        SELECT q.event_type, n_cal, qhat,
               CAST(sum(CASE WHEN ar <= qhat THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_covered
        FROM rk JOIN q USING (event_type)
        GROUP BY q.event_type, n_cal, qhat
        ORDER BY q.event_type"""))

  /** THEIL-SEN robust trend ([[graft.functions.Stats.theilSen]]):
    * per event type, the median-of-pairwise-slopes trend over DAILY
    * counts — the estimator one anomalous day cannot wreck, where
    * OLS moves with every outlier. Slopes quantize at 1e6 the moment
    * they're computed (one IEEE divide + floor), both medians are
    * discrete quantiles over integer multisets, so the whole fit
    * hash-matches. Pairwise work is per-series quadratic in DAYS
    * (time-resolution bounded, census-guarded).
    */
  /** THEIL-SEN CONFIDENCE BAND ([[graft.functions.Stats
    * .theilSenCi]]): the rank-based slope interval over q260's daily
    * event-count trends — distribution-free, which is the point of
    * the estimator. Integer-quantized slope census + exact rank
    * picks; c_α from the tie-corrected MK variance.
    */
  private val q344_theil_sen_ci: Q = (
    (s, dir) => {
      val c = read(s, dir, "events").where(col("ts").isNotNull)
        .groupBy(col("event_type"), to_date(col("ts")).as("per"))
        .agg(count(lit(1)).as("n"))
        .withColumn("xd",
          datediff(col("per"), to_date(lit("1970-01-01"))))
      graft.functions.Stats.theilSenCi(c, "event_type", "xd", "n")
    },
    Some("""WITH c AS (SELECT event_type,
                 CAST(CAST(ts AS TIMESTAMP) AS DATE) AS per,
                 count(*) AS n
               FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
             p AS (SELECT event_type,
                 CAST(per - DATE '1970-01-01' AS BIGINT) AS x,
                 n AS y FROM c),
             sl AS (SELECT a.event_type,
                 CAST(floor(1000000.0 * (b.y - a.y) / (b.x - a.x))
                   AS BIGINT) AS sq
               FROM p a JOIN p b
                 ON a.event_type = b.event_type AND a.x < b.x),
             census AS (SELECT event_type, sq, count(*) AS c
               FROM sl GROUP BY 1, 2),
             np AS (SELECT event_type, count(*) AS npts
               FROM p GROUP BY 1),
             ti AS (SELECT event_type,
                 CAST(sum(tg * (tg - 1) * (2 * tg + 5)) AS BIGINT)
                   AS tie
               FROM (SELECT event_type, y, count(*) AS tg
                     FROM p GROUP BY 1, 2) GROUP BY 1),
             npair AS (SELECT event_type, CAST(sum(c) AS BIGINT)
                 AS npr FROM census GROUP BY 1),
             rk AS (SELECT np.event_type, npts, npr,
                 greatest(1, CAST(floor((CAST(npr AS DOUBLE)
                   - 1.959964 * sqrt(CAST(npts * (npts - 1) *
                     (2 * npts + 5) - tie AS DOUBLE) / 18.0)) / 2.0)
                   + 1.0 AS BIGINT)) AS rlo,
                 least(npr, CAST(ceil((CAST(npr AS DOUBLE)
                   + 1.959964 * sqrt(CAST(npts * (npts - 1) *
                     (2 * npts + 5) - tie AS DOUBLE) / 18.0)) / 2.0)
                   + 1.0 AS BIGINT)) AS rhi,
                 (npr + 1) // 2 AS rmed
               FROM np JOIN ti USING (event_type)
               JOIN npair ON np.event_type = npair.event_type),
             cm AS (SELECT event_type, sq,
                 sum(c) OVER (PARTITION BY event_type ORDER BY sq
                   ROWS UNBOUNDED PRECEDING) AS cum
               FROM census),
             pick AS (SELECT cm.event_type,
                 CAST(max(npts) AS BIGINT) AS n_points,
                 CAST(max(npr) AS BIGINT) AS n_pairs,
                 min(CASE WHEN cum >= rmed THEN sq END) AS smed,
                 min(CASE WHEN cum >= rlo THEN sq END) AS slo,
                 min(CASE WHEN cum >= rhi THEN sq END) AS shi
               FROM cm JOIN rk ON cm.event_type = rk.event_type
               GROUP BY 1)
        SELECT event_type, n_points, n_pairs,
               round(CAST(smed AS DOUBLE) / 1000000.0, 6) AS slope,
               round(CAST(slo AS DOUBLE) / 1000000.0, 6) AS slope_lo,
               round(CAST(shi AS DOUBLE) / 1000000.0, 6) AS slope_hi
        FROM pick ORDER BY event_type"""))

  private val q260_theil_sen: Q = (
    (s, dir) => {
      val c = read(s, dir, "events").where(col("ts").isNotNull)
        .groupBy(col("event_type"), to_date(col("ts")).as("per"))
        .agg(count(lit(1)).as("n"))
        .withColumn("xd",
          datediff(col("per"), to_date(lit("1970-01-01"))))
      graft.functions.Stats.theilSen(c, "event_type", "xd", "n")
        .orderBy(col("event_type"))
    },
    Some("""WITH c AS (SELECT event_type,
                 CAST(CAST(ts AS TIMESTAMP) AS DATE) AS per,
                 count(*) AS n
               FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
             p AS (SELECT event_type,
                 CAST(per - DATE '1970-01-01' AS BIGINT) AS x,
                 n AS y FROM c),
             sl AS (SELECT a.event_type,
                 CAST(floor(1000000.0 * (b.y - a.y) / (b.x - a.x))
                   AS BIGINT) AS sq
               FROM p a JOIN p b
                 ON a.event_type = b.event_type AND a.x < b.x),
             m AS (SELECT event_type, quantile_disc(sq, 0.5)
                 AS slope_q FROM sl GROUP BY 1),
             r AS (SELECT p.event_type, slope_q,
                 p.y * 1000000 - slope_q * p.x AS rr
               FROM p JOIN m USING (event_type)),
             ic AS (SELECT event_type, quantile_disc(rr, 0.5)
                 AS intercept_q FROM r GROUP BY 1),
             np AS (SELECT event_type, count(*) AS n_points
               FROM p GROUP BY 1)
        SELECT event_type, n_points, slope_q, intercept_q
        FROM np JOIN m USING (event_type) JOIN ic USING (event_type)
        ORDER BY event_type"""))

  private val q225_seasonal_naive: Q = (
    (s, dir) => graft.functions.Stats.seasonalNaiveMae(
        read(s, dir, "events").where(col("ts").isNotNull),
        "event_type", hour(col("ts")), to_date(col("ts")))
      .orderBy(col("event_type")),
    Some("""WITH c AS (SELECT event_type,
                 hour(CAST(ts AS TIMESTAMP)) AS pos,
                 CAST(CAST(ts AS TIMESTAMP) AS DATE) AS per,
                 count(*) AS c
               FROM events WHERE ts IS NOT NULL GROUP BY 1, 2, 3),
             l AS (SELECT event_type, c, lag(c) OVER (
                 PARTITION BY event_type, pos ORDER BY per) AS prev
               FROM c)
        SELECT event_type, count(*) AS n_scored,
               CAST(sum(abs(c - prev)) AS BIGINT) AS abs_err_sum,
               round(CAST(sum(abs(c - prev)) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS mae
        FROM l WHERE prev IS NOT NULL
        GROUP BY 1 ORDER BY 1"""))

  /** FIRST-touch attribution ([[Streams.firstTouchAttribution]]):
    * earliest touch within the 7-day lookback via a RANGE-frame
    * window on the per-user event-time axis (earliest-overall may
    * predate the window, so the as-of fold can't express this one) —
    * still a single user_id shuffle. Same report shape as q213; the
    * oracle flips the latest rank to earliest inside the bounded
    * join window.
    */
  private val q226_first_touch: Q = (
    (s, dir) => Streams.firstTouchAttribution(read(s, dir, "events"),
        "purchase", Seq("view", "click"), maxDelaySec = 7L * 86400L)
      .groupBy(coalesce(col("channel"), lit("(none)")).as("channel"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy(col("channel")),
    Some(s"""WITH p AS (SELECT event_id, user_id, value,
                 CAST(ts AS TIMESTAMP) AS t
               FROM events
               WHERE event_type = 'purchase' AND ts IS NOT NULL),
             t0 AS (SELECT user_id, event_id, event_type,
                 CAST(ts AS TIMESTAMP) AS t
               FROM events
               WHERE event_type IN ('view', 'click')
                 AND ts IS NOT NULL),
             tch AS (SELECT user_id, t, event_type FROM (
                 SELECT t0.*, row_number() OVER (
                   PARTITION BY user_id, t
                   ORDER BY event_id DESC) AS rn FROM t0)
               WHERE rn = 1),
             j AS (SELECT p.event_id, tch.event_type AS channel,
                 row_number() OVER (PARTITION BY p.event_id
                   ORDER BY tch.t ASC) AS rn
               FROM p JOIN tch ON p.user_id = tch.user_id
                 AND tch.t <= p.t
                 AND tch.t >= p.t - INTERVAL 7 DAY),
             a AS (SELECT event_id, channel FROM j WHERE rn = 1)
        SELECT COALESCE(a.channel, '(none)') AS channel,
               count(*) AS n, ${sqlDsum("p.value")} AS sum_value
        FROM p LEFT JOIN a USING (event_id)
        GROUP BY 1 ORDER BY 1"""))

  /** STREAMING CDC apply ([[Streams.cdcApply]]) in its batch form
    * under the oracle (the q104/q172 convention): the SAME
    * mapGroupsWithState operator that maintains a keyed state table
    * incrementally — latest-change-wins per key, O(1) state, 'D'
    * tombstones — run over the [[QH.cdcChangeFeed]] as one batch.
    * Latest-wins is a max over a total order, so the final state is
    * identical under any micro-batch slicing (CdcSpec pins two
    * slicings + arrival-order shuffles == this batch run ==
    * applyChanges on an empty base). The JSON payload re-projects
    * through from_json; the oracle replays feed + fold as CTEs.
    */
  private val q208_cdc_stream: Q = (
    (s, dir) => {
      val feed = cdcChangeFeed(read(s, dir, "customer"))
      val sch = new org.apache.spark.sql.types.StructType()
        .add("c_name", "string").add("c_acctbal", "double")
      Streams.cdcApply(feed, "c_custkey", "seq", "tie", "op",
          Seq("c_name", "c_acctbal"))
        .toDF()
        .where(!col("deleted"))
        .select(col("key").as("c_custkey"),
          from_json(col("payload"), sch).as("v"))
        .select(col("c_custkey"), col("v.c_name").as("c_name"),
          col("v.c_acctbal").as("c_acctbal"))
        .orderBy(col("c_custkey"))
    },
    Some(s"""WITH $cdcChangeFeedSql
        SELECT c_custkey, c_name, c_acctbal FROM latest
        WHERE op <> 'D' ORDER BY c_custkey"""))

  private val q198_stream_enrich: Q = (
    (s, dir) => Streams.enrich(read(s, dir, "events"),
        read(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment")),
        "user_id", "c_custkey")
      .groupBy(coalesce(col("c_mktsegment"), lit("(unknown)"))
          .as("segment"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy(col("segment"), col("event_type")),
    Some(s"""SELECT COALESCE(c_mktsegment, '(unknown)') AS segment,
                    event_type, count(*) AS n,
                    ${sqlDsum("value")} AS sum_value
             FROM events LEFT JOIN customer ON user_id = c_custkey
             GROUP BY 1, 2 ORDER BY 1, 2"""))

  private val q139_drift_monitor: Q = (
    (s, dir) => {
      import graft.llmdata.Dedup.normalizeTokens
      val d = QH.spread(read(s, dir, "documents"))
        // null-text docs carry no fertility signal; an all-null bucket
        // would otherwise NULL batch_words and the drift bit (ADVICE r7)
        .where(col("text").isNotNull)
        .withColumn("batch_id", expr("doc_id div 100"))
        .withColumn("t",
          when(col("batch_id") % 5 === 4,
            concat(col("text"),
              lit(" hyperagglutinative hyperagglutinative" +
                " hyperagglutinative")))
            .otherwise(col("text")))
        .withColumn("w", normalizeTokens(col("t")))
      val obs = d.select(col("source"), col("batch_id"),
        size(col("w")).cast("long").as("n_words"),
        length(array_join(col("w"), "")).cast("long").as("n_units"))
      graft.streaming.DriftMonitor.report(obs, tolNum = 8, tolDen = 100)
        .select(col("source"), col("batch_id"), col("batch_words"),
          col("batch_units"), col("prior_words"), col("prior_units"),
          round(col("fertility"), 6).as("fertility"),
          round(col("baseline"), 6).as("baseline"),
          col("drifted").cast("long").as("drifted"))
        .orderBy(col("source"), col("batch_id"))
    },
    Some("""WITH d AS (SELECT source, doc_id // 100 AS batch_id,
                   CASE WHEN (doc_id // 100) % 5 = 4
                        THEN text || repeat(' hyperagglutinative', 3)
                        ELSE text END AS t
                 FROM documents WHERE text IS NOT NULL),
             n AS (SELECT source, batch_id,
                     list_filter(string_split(trim(regexp_replace(
                       regexp_replace(lower(t), '[^a-z0-9 ]', '', 'g'),
                       ' +', ' ', 'g')), ' '), x -> x <> '') AS w
                   FROM d),
             o AS (SELECT source, batch_id,
                     CAST(len(w) AS BIGINT) AS n_words,
                     CAST(len(array_to_string(w, '')) AS BIGINT)
                       AS n_units
                   FROM n),
             g AS (SELECT source, batch_id,
                     CAST(sum(n_words) AS BIGINT) AS batch_words,
                     CAST(sum(n_units) AS BIGINT) AS batch_units
                   FROM o GROUP BY 1, 2),
             p AS (SELECT *,
                     CAST(coalesce(sum(batch_words) OVER (
                       PARTITION BY source ORDER BY batch_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS BIGINT) AS prior_words,
                     CAST(coalesce(sum(batch_units) OVER (
                       PARTITION BY source ORDER BY batch_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS BIGINT) AS prior_units
                   FROM g)
            SELECT source, batch_id, batch_words, batch_units,
                   prior_words, prior_units,
                   round(CAST(batch_units AS DOUBLE) / batch_words, 6)
                     AS fertility,
                   CASE WHEN prior_words = 0 THEN NULL
                        ELSE round(CAST(prior_units AS DOUBLE)
                               / prior_words, 6) END AS baseline,
                   CAST(CASE WHEN prior_words = 0 OR batch_words = 0
                          THEN 0
                        WHEN batch_units * prior_words * 100 >
                             batch_words * prior_units * 108
                          OR batch_units * prior_words * 100 <
                             batch_words * prior_units * 92
                          THEN 1 ELSE 0 END AS BIGINT) AS drifted
            FROM p ORDER BY source, batch_id"""))

  /** SESSIONIZED funnel with TTL ([[Streams.sessionFunnelReach]]) in
    * its batch form under the oracle (the q172 convention): per-user
    * step progress RESETS at every 30-minute inactivity gap — one row
    * per (user, session) instead of q172's one per user. The same
    * stateful operator runs incrementally with watermark-closed
    * sessions and event-time state TTL (state holds open sessions of
    * recently-active users only — the 100 TB key-cardinality story);
    * StatsAndStreamSpec pins streaming emissions == this batch run ==
    * the relational [[graft.functions.Stats.sessionFunnel]] under two
    * slicings and shuffled arrival, plus TTL expiry. The oracle
    * replays gaps-and-islands sessionization + the per-session
    * chained-min CTE ladder.
    */
  private val q252_session_funnel: Q = (
    (s, dir) => Streams.sessionFunnelReach(read(s, dir, "events"),
        Seq("view", "click", "purchase"), gapSec = 1800L,
        ttlSec = 7200L)
      .toDF()
      .select(col("user_id"), col("session_start"), col("n_reached"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start")),
    Some("""WITH e AS (SELECT user_id, event_type, event_id,
                 CAST(ts AS TIMESTAMP) AS t
               FROM events WHERE ts IS NOT NULL
                 AND event_type IN ('view', 'click', 'purchase')),
             s AS (SELECT user_id, event_type, event_id, t,
                 CASE WHEN lag(t) OVER w IS NULL
                        OR epoch_us(t) - epoch_us(lag(t) OVER w)
                           >= 1800000000
                      THEN 1 ELSE 0 END AS nf
               FROM e
               WINDOW w AS (PARTITION BY user_id
                            ORDER BY t, event_id)),
             x AS (SELECT user_id, event_type, t,
                 CAST(sum(nf) OVER (PARTITION BY user_id
                   ORDER BY t, event_id) AS BIGINT) AS sid
               FROM s),
             base AS (SELECT user_id, sid, min(t) AS session_start,
                 count(*) AS n_events FROM x GROUP BY 1, 2),
             s1 AS (SELECT user_id, sid, min(t) AS t1 FROM x
               WHERE event_type = 'view' GROUP BY 1, 2),
             s2 AS (SELECT x.user_id, x.sid, min(t) AS t2 FROM x
               JOIN s1 USING (user_id, sid)
               WHERE event_type = 'click' AND t > t1 GROUP BY 1, 2),
             s3 AS (SELECT x.user_id, x.sid, min(t) AS t3 FROM x
               JOIN s2 USING (user_id, sid)
               WHERE event_type = 'purchase' AND t > t2 GROUP BY 1, 2)
        SELECT base.user_id, base.session_start,
               CAST(CASE WHEN s3.sid IS NOT NULL THEN 3
                         WHEN s2.sid IS NOT NULL THEN 2
                         WHEN s1.sid IS NOT NULL THEN 1
                         ELSE 0 END AS INTEGER) AS n_reached,
               CAST(base.n_events AS INTEGER) AS n_events
        FROM base LEFT JOIN s1 USING (user_id, sid)
             LEFT JOIN s2 USING (user_id, sid)
             LEFT JOIN s3 USING (user_id, sid)
        ORDER BY user_id, session_start"""))

  /** PAGE–HINKLEY drift monitor ([[graft.functions.Stats
    * .pageHinkley]]): hourly event counts per type, deviation from
    * the RUNNING mean on the 1e-6 integer lattice — the
    * baseline-free sibling of q258's CUSUM (which needs the median
    * target joined in). δ = 0.5 counts, λ = 50 counts.
    */
  private def phHourlyCounts(s: org.apache.spark.sql.SparkSession,
      dir: String) =
    read(s, dir, "events").where(col("ts").isNotNull)
      .groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))

  private val q374_page_hinkley: Q = (
    (s, dir) => graft.functions.Stats.pageHinkley(
        phHourlyCounts(s, dir), "event_type", "h", "n",
        deltaQ = 500000L, lambdaQ = 50000000L)
      .orderBy(col("event_type"), col("h")),
    Some(phOracleSql))

  /** STREAMING Page–Hinkley ([[Streams.pageHinkleyStream]]): q374's
    * integer trajectory as six longs of per-series state — the
    * ingest-time drift alarm. Stream == batch bit-for-bit under
    * order-respecting slicings (StreamingPhSpec), so the oracle IS
    * q374's SQL (the q351 convention).
    */
  private val q378_ph_stream: Q = (
    (s, dir) => Streams.pageHinkleyStream(
        phHourlyCounts(s, dir), "event_type", "h", "n",
        deltaQ = 500000L, lambdaQ = 50000000L)
      .toDF("event_type", "h", "n", "ph_pos", "ph_neg", "alarm")
      .orderBy(col("event_type"), col("h")),
    Some(phOracleSql))

  // def, not val: referenced by the q374/q378 entry vals declared
  // ABOVE it — a val here would still be null at their init time
  private def phOracleSql: String =
    """WITH c AS (SELECT event_type,
                 date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
                 count(*) AS n
               FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
             p AS (SELECT event_type, h, n,
                 row_number() OVER w AS i,
                 CAST(sum(n) OVER w AS HUGEINT) AS pp
               FROM c WINDOW w AS (PARTITION BY event_type
                 ORDER BY h ROWS UNBOUNDED PRECEDING)),
             d AS (SELECT event_type, h, n,
                 CAST(n AS HUGEINT) * 1000000
                   - (pp * 1000000) // i - 500000 AS dev
               FROM p),
             m AS (SELECT event_type, h, n,
                 CAST(sum(dev) OVER w AS HUGEINT) AS m
               FROM d WINDOW w AS (PARTITION BY event_type
                 ORDER BY h ROWS UNBOUNDED PRECEDING)),
             sc AS (SELECT event_type, h, n,
                 m - least(min(m) OVER w, 0) AS php,
                 greatest(max(m) OVER w, 0) - m AS phn
               FROM m WINDOW w AS (PARTITION BY event_type
                 ORDER BY h ROWS UNBOUNDED PRECEDING))
        SELECT event_type, h, n, CAST(php AS BIGINT) AS ph_pos,
               CAST(phn AS BIGINT) AS ph_neg,
               CAST(CASE WHEN php > 50000000 OR phn > 50000000
                 THEN 1 ELSE 0 END AS INTEGER) AS alarm
        FROM sc ORDER BY event_type, h"""

  val all: Map[String, Q] = Map(
    "q374_page_hinkley" -> q374_page_hinkley,
    "q378_ph_stream" -> q378_ph_stream,
    "q61_asof_join" -> q61_asof_join,
    "q172_stream_funnel" -> q172_stream_funnel,
    "q252_session_funnel" -> q252_session_funnel,
    "q198_stream_enrich" -> q198_stream_enrich,
    "q208_cdc_stream" -> q208_cdc_stream,
    "q213_attribution" -> q213_attribution,
    "q302_position_attr" -> q302_position_attr,
    "q225_seasonal_naive" -> q225_seasonal_naive,
    "q256_seasonal_decompose" -> q256_seasonal_decompose,
    "q291_seasonal_anomaly" -> q291_seasonal_anomaly,
    "q297_stream_alert" -> q297_stream_alert,
    "q324_stream_srm" -> q324_stream_srm,
    "q336_shapley" -> q336_shapley,
    "q350_markov_attr" -> q350_markov_attr,
    "q351_stream_kmv" -> q351_stream_kmv,
    "q340_next_event" -> q340_next_event,
    "q258_cusum" -> q258_cusum,
    "q260_theil_sen" -> q260_theil_sen,
    "q344_theil_sen_ci" -> q344_theil_sen_ci,
    "q268_interval_left" -> q268_interval_left,
    "q272_conformal" -> q272_conformal,
    "q273_ewma" -> q273_ewma,
    "q274_acf" -> q274_acf,
    "q275_transition" -> q275_transition,
    "q276_pacf" -> q276_pacf,
    "q226_first_touch" -> q226_first_touch,
    "q230_stream_threshold" -> q230_stream_threshold,
    "q311_stream_mg" -> q311_stream_mg,
    "q104_stream_dedup" -> q104_stream_dedup,
    "q139_drift_monitor" -> q139_drift_monitor,
    "q80_interval_join" -> q80_interval_join,
    "q53_stream_tumbling" -> q53_stream_tumbling,
    "q54_stream_sliding" -> q54_stream_sliding,
    "q55_stream_session" -> q55_stream_session,
    "q56_events_json" -> q56_events_json)
}
