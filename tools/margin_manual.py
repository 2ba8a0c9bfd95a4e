#!/usr/bin/env python3
"""Hand-written rounding-margin probes for the catalog entries whose
transcendental round sites margin_sweep.py cannot rewrite automatically
(rounds in WHERE clauses, rounds feeding downstream CTE selection,
floor-quantize sites). Together with margin_sweep.py this closes the
q294 fragility-class sweep: every entry that hashes (or selects on) a
rounded/floored transcendental gets an empirical minimum distance to
its rounding boundary at sf0.01.

For round(X, n):  f = X·10^n − floor(X·10^n); margin = |f − 0.5|
                  (0 = on the flip boundary, 0.5 = integer-exact).
For floor(X):     margin = min(f, 1−f) — floor flips at INTEGER
                  boundaries, not half-integers.
For a WHERE round(d, n) <= T selection, the flip additionally needs the
rounded value to cross T, so we also report min |d − T| over the
blocked candidate pairs (superset of the selected set — conservative).

A 1-ulp cross-engine libm difference perturbs X·10^n by ~2.2e-16·|X·10^n|;
every probe below reports margins many orders above that, or the entry
is listed with its structural safety argument in BENCH_NOTES.md.

Usage: python3 tools/margin_manual.py <sfDir>
"""
import sys
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

HAV = """2.0 * 6371008.8 * asin(sqrt(
      sin((b.lat - a.lat) * (pi() / 180.0) / 2.0)
        * sin((b.lat - a.lat) * (pi() / 180.0) / 2.0)
      + cos(a.lat * (pi() / 180.0)) * cos(b.lat * (pi() / 180.0))
        * sin((b.lon - a.lon) * (pi() / 180.0) / 2.0)
        * sin((b.lon - a.lon) * (pi() / 180.0) / 2.0)))"""


def rmargin(x, n):
    """round-margin SAFETY FACTOR: distance of x·10^n to the nearest
    half-integer, over the 1-ulp cross-engine perturbation
    2.2e-16·|x·10^n| — >1e3 is comfortably robust."""
    s = f"(({x})*1e{n})"
    return (f"abs({s} - floor({s}) - 0.5)"
            f" / (2.220446049250313e-16 * greatest(abs({s}), 1.0))")


def fmargin(x):
    """floor-margin SAFETY FACTOR: distance of x to the nearest
    integer over the 1-ulp perturbation (floor flips at integers)."""
    return (f"least(({x}) - floor(({x})), 1.0 - (({x}) - floor(({x}))))"
            f" / (2.220446049250313e-16 * greatest(abs({x}), 1.0))")


BM25_TERM = """CASE WHEN tf{i} > 0 THEN
      ln((CAST(n AS DOUBLE) - CAST(df{i} AS DOUBLE) + 0.5)
         / (CAST(df{i} AS DOUBLE) + 0.5) + 1.0)
      * (CAST(tf{i} AS DOUBLE) * 2.2)
      / (CAST(tf{i} AS DOUBLE) + 1.2 * (0.25
         + 0.75 * CAST(dl AS DOUBLE)
           / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE))))
    ELSE 0.0 END"""

BM25_3 = " + ".join(BM25_TERM.format(i=i) for i in range(3))
BM25_2 = " + ".join(BM25_TERM.format(i=i) for i in range(2))

DSIR_PREFIX = """WITH n AS (SELECT doc_id, lang,
         list_filter(string_split(trim(regexp_replace(
           regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
           ' +', ' ', 'g')), ' '), t -> t <> '') AS w
       FROM documents WHERE text IS NOT NULL),
     f AS (SELECT doc_id, lang,
         unnest(list_transform(range(1, len(w)), i ->
           list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(string_split_regex(
               w[i] || ' ' || w[i+1], ''),
               c -> CAST(ascii(c) AS BIGINT))),
             (a, b) -> (a * 31 + b) % 1000000007) % 4096)) AS bkt
       FROM n WHERE len(w) >= 2),
     tc AS (SELECT bkt, count(*) AS ct FROM f
            WHERE lang = 'en' GROUP BY bkt),
     sc AS (SELECT bkt, count(*) AS cs FROM f GROUP BY bkt),
     tt AS (SELECT count(*) AS t FROM f WHERE lang = 'en'),
     st AS (SELECT count(*) AS t FROM f)"""

DOREMI_PREFIX = """WITH n AS (SELECT source AS domain,
         list_filter(string_split(trim(regexp_replace(
           regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
           ' +', ' ', 'g')), ' '), t -> t <> '') AS w
       FROM documents
       WHERE text IS NOT NULL AND source IS NOT NULL),
     n2 AS (SELECT * FROM n WHERE len(w) >= 2),
     u AS (SELECT domain, unnest(w) AS tok FROM n2),
     uc AS (SELECT tok, count(*) AS c FROM u GROUP BY tok),
     sc AS (SELECT CAST(sum(c) AS BIGINT) AS t,
              count(*) AS v FROM uc),
     bp AS (SELECT domain, unnest(list_transform(range(1, len(w)),
              i -> w[i] || ' ' || w[i+1])) AS pr FROM n2),
     bg AS (SELECT pr, count(*) AS cb FROM bp GROUP BY pr),
     hg AS (SELECT string_split(pr, ' ')[1] AS w1,
              CAST(sum(cb) AS BIGINT) AS ch FROM bg GROUP BY 1)"""

BM25_PREFIX_3 = """WITH toks AS (SELECT doc_id,
         unnest(string_split(lower(text), ' ')) AS t
       FROM documents WHERE text IS NOT NULL),
     pd AS (SELECT doc_id, count(*) AS dl,
         sum(CASE WHEN t = 'hash' THEN 1 ELSE 0 END) AS tf0,
         sum(CASE WHEN t = 'join' THEN 1 ELSE 0 END) AS tf1,
         sum(CASE WHEN t = 'spark' THEN 1 ELSE 0 END) AS tf2
       FROM toks WHERE t <> '' GROUP BY doc_id),
     st AS (SELECT count(*) AS n, sum(dl) AS sumdl,
         sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
         sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
         sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
       FROM pd)"""

BM25_PREFIX_2 = """WITH tk AS (SELECT doc_id,
         unnest(string_split(lower(text), ' ')) AS t
       FROM documents WHERE text IS NOT NULL),
     tkc AS (SELECT doc_id, t FROM tk WHERE t <> ''),
     pd AS (SELECT doc_id, count(*) AS dl,
         sum(CASE WHEN t = 'hash' THEN 1 ELSE 0 END) AS tf0,
         sum(CASE WHEN t = 'join' THEN 1 ELSE 0 END) AS tf1
       FROM tkc GROUP BY doc_id),
     st AS (SELECT count(*) AS n, sum(dl) AS sumdl,
         sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
         sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1
       FROM pd)"""

PRF_PREFIX = BM25_PREFIX_2 + f""",
     short AS (SELECT doc_id FROM (SELECT doc_id,
         round({BM25_2}, 6) AS score
       FROM pd, st WHERE tf0 > 0 OR tf1 > 0
       ORDER BY score DESC, doc_id LIMIT 10)),
     nd AS (SELECT count(*) AS n
       FROM documents WHERE text IS NOT NULL),
     gdf AS (SELECT t, count(*) AS gdf FROM (
         SELECT DISTINCT doc_id, t FROM tkc) GROUP BY 1),
     insh AS (SELECT t, CAST(count(*) AS BIGINT) AS tf_short,
         CAST(count(DISTINCT tkc.doc_id) AS BIGINT) AS df_short
       FROM tkc JOIN short ON tkc.doc_id = short.doc_id
       WHERE t NOT IN ('hash', 'join') GROUP BY 1)"""

GEO_PTS_248 = """WITH pts AS (SELECT c_custkey AS id,
         CAST(c_custkey * 37 % 1600 AS DOUBLE) / 10.0 - 80.0 AS lat,
         CAST(c_custkey * 73 % 3600 AS DOUBLE) / 10.0 - 180.0 AS lon
       FROM customer WHERE c_custkey <= 15000),
     ba AS (SELECT id, lat, lon,
         CAST(floor(lat / (200000.0 / 111320.0)) AS BIGINT) AS band
       FROM pts)"""

GEO_CELLS = """WITH pts AS (SELECT c_custkey AS id,
         CAST(c_custkey * 37 % 16 AS DOUBLE) / 10.0 AS lat,
         CAST(c_custkey * 73 % 3600 AS DOUBLE) / 10.0 - 180.0 AS lon
       FROM customer WHERE c_custkey <= {maxkey}),
     par2 AS (SELECT dlat, dlon,
         greatest(1, CAST(floor(360.0 / dlon) AS BIGINT)) AS nlon
       FROM (SELECT {r} / 111320.0 AS dlat,
         {r} / (111320.0 * greatest(
           cos((SELECT max(abs(lat)) FROM pts) * pi() / 180.0),
           1e-6)) AS dlon)),
     cells AS (SELECT id, lat, lon,
         CAST(floor(lat / dlat) AS BIGINT) AS cy,
         ((CAST(floor(lon / dlon) AS BIGINT) % nlon) + nlon) % nlon
           AS cx, nlon
       FROM pts, par2)"""

HEAPS_PTS = """
  WITH tl AS (SELECT doc_id, list_filter(string_split(trim(
        regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '',
        'g'), ' +', ' ', 'g')), ' '), x -> x <> '') AS t
      FROM documents WHERE text IS NOT NULL),
    d AS (SELECT doc_id, t FROM tl WHERE len(t) >= 1),
    o AS (SELECT doc_id, t, len(t) AS n,
        sum(len(t)) OVER (ORDER BY doc_id
          ROWS UNBOUNDED PRECEDING) - len(t) AS off FROM d),
    toks AS (SELECT off + u.p AS p, u.tok FROM (
        SELECT off, unnest(list_transform(range(1, len(t) + 1),
          i -> struct_pack(p := i, tok := t[i]))) AS u FROM o) y),
    firsts AS (SELECT tok, min(p) AS f FROM toks GROUP BY 1),
    tot AS (SELECT sum(n) AS tt FROM o),
    cps AS (SELECT (CAST(1 AS BIGINT) << i) AS n_tokens
      FROM range(0, 63) r(i), tot
      WHERE (CAST(1 AS BIGINT) << i) <= tt
        AND (CAST(1 AS BIGINT) << i) >= 256),
    pts0 AS (SELECT n_tokens, count(*) AS vocab
      FROM cps JOIN firsts ON f <= n_tokens GROUP BY 1),
    pts AS (SELECT n_tokens, vocab,
        CAST(floor(1000000.0 * ln(CAST(n_tokens AS DOUBLE)))
          AS BIGINT) AS xq,
        CAST(floor(1000000.0 * ln(CAST(vocab AS DOUBLE)))
          AS BIGINT) AS yq
      FROM pts0)"""

PROBES = {
    # Kendall tau-b: ONE global ppm site floor(tau*1e6 + 0.5) over a
    # sqrt — flips at half-integers of tau*1e6. The conc/disc/tie
    # inputs are exact HUGEINTs; only the final close is libm-ish
    # (sqrt is IEEE-correctly-rounded, but probe anyway).
    "q380_kendall_tau": f"""
      WITH r AS (SELECT CAST(l_quantity AS BIGINT) AS x,
             CAST(round(l_extendedprice, -4) AS BIGINT) AS y
           FROM lineitem
           WHERE l_quantity IS NOT NULL
             AND l_extendedprice IS NOT NULL),
         cells AS (SELECT x, y, count(*) AS c FROM r GROUP BY 1, 2),
         pg AS (SELECT
             CAST(coalesce(sum(CASE WHEN a.y < b.y
                 THEN CAST(a.c AS HUGEINT) * b.c END), 0)
               AS HUGEINT) AS conc,
             CAST(coalesce(sum(CASE WHEN a.y > b.y
                 THEN CAST(a.c AS HUGEINT) * b.c END), 0)
               AS HUGEINT) AS disc
           FROM cells a JOIN cells b ON a.x < b.x),
         tx AS (SELECT CAST(sum(CAST(t AS HUGEINT) * (t - 1))
               AS HUGEINT) AS tx2,
             CAST(sum(CAST(t AS HUGEINT)) AS HUGEINT) AS n
           FROM (SELECT sum(c) AS t FROM cells GROUP BY x)),
         ty AS (SELECT CAST(sum(CAST(t AS HUGEINT) * (t - 1))
               AS HUGEINT) AS ty2
           FROM (SELECT sum(c) AS t FROM cells GROUP BY y))
      SELECT {rmargin('''2.0 * CAST(conc - disc AS DOUBLE)
          / sqrt(CAST(n * (n - 1) - tx2 AS DOUBLE)
            * CAST(n * (n - 1) - ty2 AS DOUBLE)) * 1e6''', 0)}
        AS margin
      FROM pg CROSS JOIN tx CROSS JOIN ty""",

    # Bartlett: the per-group DECIMAL(38,6) quantizes of
    # (n-1)*ln(var_g) and (n-1)*var_g, and the final round(T, 6) —
    # the ln sites are the libm exposure; var_g itself is a ratio of
    # exact decimals (IEEE div, correctly rounded, not probed; the
    # Theil-Sen-slope argument).
    "q383_bartlett": f"""
      WITH r AS (SELECT l_returnflag AS grp,
             CAST(round(l_extendedprice, 0) AS BIGINT) AS v
           FROM lineitem
           WHERE l_returnflag IS NOT NULL
             AND l_extendedprice IS NOT NULL),
         pg AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(v AS HUGEINT)) AS HUGEINT) AS s1,
             CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS s2
           FROM r GROUP BY 1),
         t AS (SELECT grp, n,
             CAST(n * s2 - s1 * s1 AS DOUBLE)
               / CAST(n * (n - 1) AS DOUBLE) AS var_g
           FROM pg),
         ag AS (SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n) AS BIGINT) AS nn,
             CAST(sum(CAST(CAST(n - 1 AS DOUBLE) * var_g
               AS DECIMAL(38,6))) AS DOUBLE) AS wsum,
             CAST(sum(CAST(CAST(n - 1 AS DOUBLE) * ln(var_g)
               AS DECIMAL(38,4))) AS DOUBLE) AS lsum,
             CAST(sum(CAST(1.0 / CAST(n - 1 AS DOUBLE)
               AS DECIMAL(38,6))) AS DOUBLE) AS isum
           FROM t)
      SELECT min(m) AS margin FROM (
        SELECT {rmargin('CAST(n - 1 AS DOUBLE) * ln(var_g)', 4)} AS m
        FROM t
        UNION ALL
        SELECT {rmargin('''(CAST(nn - k AS DOUBLE)
            * ln(wsum / CAST(nn - k AS DOUBLE)) - lsum)
          / (1.0 + (isum - 1.0 / CAST(nn - k AS DOUBLE))
            / (3.0 * CAST(k - 1 AS DOUBLE)))''', 6)}
        FROM ag)""",

    # Heaps'-law: floor(1e6·ln(n)) and floor(1e6·ln(V)) at every
    # checkpoint — the two libm sites. The Theil-Sen slope floor
    # (1e6·(yb−ya)/(xb−xa)) is NOT probed: it is IEEE mul/div over
    # exact integers (correctly rounded, hence bit-identical on any
    # engine — equal-y pairs land exactly ON 0, which is fine for the
    # same reason), and the intercept residual is pure integer.
    "q371_heaps": HEAPS_PTS + f"""
      SELECT min(m) AS margin FROM (
        SELECT {fmargin("1000000.0 * ln(CAST(n_tokens AS DOUBLE))")}
          AS m FROM pts
        UNION ALL
        SELECT {fmargin("1000000.0 * ln(CAST(vocab AS DOUBLE))")}
          FROM pts)""",

    # windowed stddev: round(sqrt(var), 2) — probe the sqrt over every
    # 7-row window (count>1 rows only, matching the CASE)
    "q109_moving_std": f"""
      SELECT min(CASE WHEN cnt > 1 THEN {rmargin(
        '''sqrt(greatest(0.0, (q - sd * sd / CAST(cnt AS DOUBLE))
            / (CAST(cnt AS DOUBLE) - 1.0)))''', 2)} END) AS margin
      FROM (SELECT
          CAST(sum(CAST(round(o_totalprice * 10000) AS HUGEINT)
                   * CAST(round(o_totalprice * 10000) AS HUGEINT))
               OVER w AS DOUBLE) / 1e8 AS q,
          CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) OVER w
               AS DOUBLE) AS sd,
          count(*) OVER w AS cnt
        FROM orders
        WINDOW w AS (ORDER BY o_orderkey
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))""",

    # DSIR lambda quantize: round(ln(ratio)·1e4) over all 4096 buckets
    "q119_dsir_weights": DSIR_PREFIX + f"""
      SELECT min({rmargin('''ln(
          ((coalesce(tc.ct, 0) + 0.5) / (tt.t + 2048.0)) /
          ((coalesce(sc.cs, 0) + 0.5) / (st.t + 2048.0)))''', 4)})
        AS margin
      FROM sc FULL OUTER JOIN tc ON sc.bkt = tc.bkt, tt, st""",

    # same lambda site + the unseen-bucket constant
    "q120_dsir_score": DSIR_PREFIX + f"""
      SELECT min(m) AS margin FROM (
        SELECT {rmargin('''ln(
            ((coalesce(tc.ct, 0) + 0.5) / (tt.t + 2048.0)) /
            ((coalesce(sc.cs, 0) + 0.5) / (st.t + 2048.0)))''', 4)} AS m
        FROM sc FULL OUTER JOIN tc ON sc.bkt = tc.bkt, tt, st
        UNION ALL
        SELECT {rmargin('''ln(
            (0.5 / (tt.t + 2048.0)) / (0.5 / (st.t + 2048.0)))''', 4)}
        FROM tt, st)""",

    # DoReMi unigram + bigram logprob quantize (q151 and q154 share
    # the corpus CTEs, so one probe covers both)
    "q151_q154_doremi": DOREMI_PREFIX + f"""
      SELECT min(m) AS margin FROM (
        SELECT {rmargin('ln((c + 0.5) / (t + 0.5 * v))', 4)} AS m
        FROM uc, sc
        UNION ALL
        SELECT {rmargin('ln((cb + 0.5) / (ch + 0.5 * v))', 4)}
        FROM bg JOIN hg ON string_split(bg.pr, ' ')[1] = hg.w1, sc)""",

    # BM25 3-term score round(·,6) over EVERY matching doc (no top-25
    # cut) — covers q167, and q173/q211 which reuse the same score CTE
    "q167_q173_q211_bm25": BM25_PREFIX_3 + f"""
      SELECT min({rmargin(BM25_3, 6)}) AS margin
      FROM pd, st WHERE tf0 > 0 OR tf1 > 0 OR tf2 > 0""",

    # PRF seed score (2-term, all matching docs) — q330/q331 'short'
    "q330_q331_seed": BM25_PREFIX_2 + f"""
      SELECT min({rmargin(BM25_2, 6)}) AS margin
      FROM pd, st WHERE tf0 > 0 OR tf1 > 0""",

    # PRF expansion weight floor(1e6·ln((N+1)/(gdf+1))) — FLOOR site,
    # margin to the nearest integer
    "q330_q331_weight": PRF_PREFIX + f"""
      SELECT min({fmargin('''1000000.0 *
          ln((CAST(nd.n AS DOUBLE) + 1.0) / (CAST(gdf AS DOUBLE) + 1.0))''')})
        AS margin
      FROM insh JOIN gdf USING (t) CROSS JOIN nd""",

    # Benford expected ppm: 9 constants log10(1+1/d)·1e6
    "q222_benford": f"""
      SELECT min({rmargin('log10(1.0 + 1.0 / r.d)', 6)}) AS margin
      FROM (SELECT unnest(range(1, 10)) AS d) r""",

    # (q28_cumprod left the class in r11: it now hashes an exact
    # integer factor signature — see QueriesAgg.scala q28 scaladoc)

    # char-entropy quantize round(ln(nc/n)·1e4) over every
    # (doc, char) census term — the auto tool's fallback reads the
    # entropy OUTPUT column for this entry (false positive); this is
    # the authoritative probe
    "q161_char_entropy": """WITH n AS (SELECT doc_id,
             trim(regexp_replace(regexp_replace(lower(text),
               '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
           FROM documents WHERE text IS NOT NULL),
         c AS (SELECT doc_id, unnest(string_split_regex(
             replace(norm, ' ', ''), '')) AS ch FROM n),
         cc AS (SELECT doc_id, ch, count(*) AS nc
                FROM c WHERE ch <> '' GROUP BY 1, 2),
         t AS (SELECT doc_id, nc,
                 sum(nc) OVER (PARTITION BY doc_id) AS n FROM cc)
      SELECT min(""" + rmargin('ln(CAST(nc AS DOUBLE) / n)', 4) + """)
        AS margin FROM t""",

    # item-item cosine quantize round(1e6·s/sqrt(ca·cb), 0) over every
    # supported pair (before the top-5 neighbor cut)
    "q253_item_cf": """WITH items AS (SELECT DISTINCT l_orderkey AS b,
             p_brand AS i
           FROM lineitem JOIN part ON l_partkey = p_partkey),
         cnt AS (SELECT i, count(*) AS c FROM items GROUP BY 1),
         pr AS (SELECT x.i AS ia, y.i AS ib, count(*) AS support
           FROM items x JOIN items y ON x.b = y.b AND x.i < y.i
           GROUP BY 1, 2 HAVING count(*) >= 100)
      SELECT min(""" + rmargin(
        """1000000.0 * CAST(support AS DOUBLE)
           / sqrt(CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE))""", 0) + """)
        AS margin
      FROM pr JOIN cnt ca ON pr.ia = ca.i
              JOIN cnt cb ON pr.ib = cb.i""",

    # RMST: KM survival round(exp(sum(ln)),6) over every event time
    "q338_rmst": """WITH per AS (SELECT o_custkey,
             min(o_orderdate) AS fd, max(o_orderdate) AS ld
           FROM orders GROUP BY 1),
         mx AS (SELECT max(ld) AS maxd FROM per),
         subj AS (SELECT
             date_diff('day', CAST(fd AS DATE), CAST(ld AS DATE))
               AS duration,
             CAST(date_diff('day', CAST(ld AS DATE),
               CAST(maxd AS DATE)) > 360 AS BIGINT) AS event
           FROM per CROSS JOIN mx),
         times AS (SELECT duration AS t,
             CAST(sum(event) AS BIGINT) AS d, count(*) AS c
           FROM subj GROUP BY 1),
         tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM times),
         r AS (SELECT t, d, c,
             n - COALESCE(sum(c) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS n_risk
           FROM times CROSS JOIN tot),
         km0 AS (SELECT exp(sum(ln(1.0 - CAST(d AS DOUBLE)
             / CAST(n_risk AS DOUBLE))) OVER (ORDER BY t
               ROWS UNBOUNDED PRECEDING)) AS x FROM r)
      SELECT min(""" + rmargin('x', 6) + """) AS margin FROM km0""",

    # q347 Aalen-Johansen CIF: the KM survival margin is the q338
    # probe (same construction); this probes the CIF running sum's
    # final round(·,6) over every (cause, t) row
    "q347_cum_incidence": """WITH per AS (SELECT o_custkey,
             min(o_orderdate) AS fd, max(o_orderdate) AS ld
           FROM orders GROUP BY 1),
         mx AS (SELECT max(ld) AS maxd FROM per),
         subj AS (SELECT
             date_diff('day', CAST(fd AS DATE), CAST(ld AS DATE))
               AS t,
             CASE WHEN date_diff('day', CAST(ld AS DATE),
                 CAST(maxd AS DATE)) > 360
               THEN 1 + o_custkey % 2 ELSE 0 END AS cause
           FROM per CROSS JOIN mx),
         times AS (SELECT t, count(*) AS c,
             CAST(sum(CASE WHEN cause > 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS d_all,
             CAST(sum(CASE WHEN cause = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS d1,
             CAST(sum(CASE WHEN cause = 2 THEN 1 ELSE 0 END)
               AS BIGINT) AS d2
           FROM subj GROUP BY 1),
         tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM times),
         r AS (SELECT t, c, d_all, d1, d2,
             CAST(n - COALESCE(sum(c) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS BIGINT) AS n_risk
           FROM times CROSS JOIN tot),
         km AS (SELECT *, round(exp(sum(ln(1.0 -
             CAST(d_all AS DOUBLE) / CAST(n_risk AS DOUBLE)))
             OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)), 6)
             AS surv FROM r),
         sp AS (SELECT *, COALESCE(lag(CAST(surv * 1e6
             AS BIGINT)) OVER (ORDER BY t), 1000000) AS s6p
           FROM km),
         terms AS (SELECT 1 AS cause, t,
             CAST(CAST(s6p * d1 AS DOUBLE)
               / (CAST(n_risk AS DOUBLE) * 1e6)
               AS DECIMAL(38,12)) AS term FROM sp
           UNION ALL
           SELECT 2, t,
             CAST(CAST(s6p * d2 AS DOUBLE)
               / (CAST(n_risk AS DOUBLE) * 1e6)
               AS DECIMAL(38,12)) FROM sp),
         cs AS (SELECT CAST(sum(term) OVER (PARTITION BY cause
             ORDER BY t ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             AS x FROM terms)
      SELECT min(""" + rmargin('x', 6) + """) AS margin FROM cs""",

    # q352 group-sequential: margins of the rounded z and OBF
    # boundary at every look
    "q352_group_seq": """WITH cells AS (SELECT
             CAST(year(o_orderdate) AS BIGINT) AS look,
             CAST(sum(CASE WHEN o_custkey % 2 = 0 THEN 1
               ELSE 0 END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN o_custkey % 2 = 0
               AND o_totalprice > 150000.0 THEN 1 ELSE 0 END)
               AS BIGINT) AS xa,
             CAST(sum(CASE WHEN o_custkey % 2 = 1 THEN 1
               ELSE 0 END) AS BIGINT) AS nb,
             CAST(sum(CASE WHEN o_custkey % 2 = 1
               AND o_totalprice > 150000.0 THEN 1 ELSE 0 END)
               AS BIGINT) AS xb
           FROM orders GROUP BY 1),
         cum AS (SELECT look,
             CAST(row_number() OVER (ORDER BY look) AS BIGINT) AS k,
             CAST(sum(na) OVER w AS BIGINT) AS n_a,
             CAST(sum(xa) OVER w AS BIGINT) AS x_a,
             CAST(sum(nb) OVER w AS BIGINT) AS n_b,
             CAST(sum(xb) OVER w AS BIGINT) AS x_b
           FROM cells
           WINDOW w AS (ORDER BY look ROWS UNBOUNDED PRECEDING)),
         za0 AS (SELECT sqrt(-2.0 * ln(0.025)) AS t),
         zaq AS (SELECT t - (2.515517 + t * (0.802853 +
             t * 0.010328)) / (1.0 + t * (1.432788 +
             t * (0.189269 + t * 0.001308))) AS za FROM za0),
         vals AS (SELECT (CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE)
               - CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE))
               / sqrt((CAST(x_a + x_b AS DOUBLE)
                   / CAST(n_a + n_b AS DOUBLE))
                 * (1.0 - CAST(x_a + x_b AS DOUBLE)
                   / CAST(n_a + n_b AS DOUBLE))
                 * (1.0 / CAST(n_a AS DOUBLE)
                   + 1.0 / CAST(n_b AS DOUBLE))) AS x
           FROM cum WHERE x_a + x_b > 0
             AND x_a + x_b < n_a + n_b AND n_a > 0 AND n_b > 0
           UNION ALL
           SELECT za * sqrt(7.0 / CAST(k AS DOUBLE))
           FROM cum CROSS JOIN zaq)
      SELECT min(""" + rmargin('x', 6) + """) AS margin FROM vals""",

    # q355 pairwise arms: margins of the rounded z and p over all
    # C(5,2) priority pairs
    "q355_pairwise_arms": """WITH cells AS (SELECT
             o_orderpriority AS a,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(o_totalprice > 150000.0 AS BIGINT))
               AS BIGINT) AS x
           FROM orders GROUP BY 1),
         pr AS (SELECT ca.n AS n_a, ca.x AS x_a,
             cb.n AS n_b, cb.x AS x_b
           FROM cells ca JOIN cells cb ON ca.a < cb.a
           WHERE ca.x + cb.x > 0 AND ca.x + cb.x < ca.n + cb.n),
         zc AS (SELECT (CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE)
              - CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE))
             / sqrt((CAST(x_a + x_b AS DOUBLE)
                 / CAST(n_a + n_b AS DOUBLE))
               * (1.0 - CAST(x_a + x_b AS DOUBLE)
                   / CAST(n_a + n_b AS DOUBLE))
               * (1.0 / CAST(n_a AS DOUBLE)
                  + 1.0 / CAST(n_b AS DOUBLE))) AS z FROM pr),
         ph AS (SELECT z, 1.0 / (1.0 + 0.2316419 * abs(z)) AS t
           FROM zc),
         vals AS (SELECT z AS x FROM ph
           UNION ALL
           SELECT 2.0 * (1.0 - (1.0 - exp(-(abs(z) * abs(z)) / 2.0)
             / 2.5066282746310002 *
             (t * (0.319381530 + t * (-0.356563782 +
               t * (1.781477937 + t * (-1.821255978 +
                 t * 1.330274429))))))) FROM ph)
      SELECT min(""" + rmargin('x', 6) + """) AS margin FROM vals""",

    # geo radius (banded): hashed-output safety over the SELECTED
    # pairs (d <= T; only their dist_m is hashed) + threshold
    # clearance in meters over ALL banded candidate pairs — a flip
    # crosses the membership boundary only within one 1e-6 quantum
    # of T, and the clearance shows the data sits hundreds of meters
    # away from it.
    "q248_geo_radius": GEO_PTS_248 + f"""
      SELECT min(CASE WHEN ({HAV}) <= 200000.0
                 THEN {rmargin(HAV, 2)} END) AS margin,
             min(abs(({HAV}) - 200000.0)) AS threshold_clearance
      FROM ba a JOIN ba b
        ON b.band BETWEEN a.band - 1 AND a.band + 1 AND a.id < b.id""",

    "q250_geo_radius_cells": GEO_CELLS.format(maxkey=5000, r="100000.0") + f"""
      SELECT min(CASE WHEN ({HAV}) <= 100000.0
                 THEN {rmargin(HAV, 2)} END) AS margin,
             min(abs(({HAV}) - 100000.0)) AS threshold_clearance
      FROM cells a JOIN cells b
        ON abs(a.cy - b.cy) <= 1
       AND ((a.cx - b.cx + a.nlon) % a.nlon) IN (0, 1, a.nlon - 1)
       AND a.id < b.id""",

    "q270_dbscan": GEO_CELLS.format(maxkey=1500, r="60000.0") + f"""
      SELECT min(CASE WHEN ({HAV}) <= 60000.0
                 THEN {rmargin(HAV, 6)} END) AS margin,
             min(abs(({HAV}) - 60000.0)) AS threshold_clearance
      FROM cells a JOIN cells b
        ON abs(a.cy - b.cy) <= 1
       AND ((a.cx - b.cx + a.nlon) % a.nlon) IN (0, 1, a.nlon - 1)
       AND a.id < b.id""",
}


def main():
    sf_dir = sys.argv[1]
    con = duckdb.connect()
    import os
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    for name, sql in PROBES.items():
        try:
            df = con.execute(sql).fetchdf()
            vals = ", ".join(f"{c}={df[c].iloc[0]:.3e}" for c in df.columns)
            print(f"{name:28s} {vals}")
        except Exception as e:
            print(f"{name:28s} ERROR {str(e).splitlines()[0][:100]}")


if __name__ == "__main__":
    main()
