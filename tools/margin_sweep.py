#!/usr/bin/env python3
"""Rounding-margin sweep for the q294 fragility class.

For every catalog entry whose oracle SQL rounds a TRANSCENDENTAL
(ln/exp/sqrt/pow/asin/log*) into the hashed output, measure how far the
pre-rounded values sit from the nearest half-way rounding boundary:

    f      = X*10^n - floor(X*10^n)        in [0, 1)
    margin = abs(f - 0.5)                  in [0, 0.5]

margin == 0.5 means X*10^n is an exact integer (maximally safe);
margin ~ 0 means a last-ulp libm difference between engines
(|Δ(X·10^n)| ≈ 2.2e-16·|X·10^n|) can flip the rounded value — the q294
failure mode (driver DuckDB vs JVM StrictMath ln drift). An entry is
ROBUST at this capture when min-margin ≫ 1e-10·|X·10^n|; we flag
anything under 1e-7 for manual ulp analysis.

Probe construction, per round-site (back to front so offsets hold):
  - `round(X, n)` standing as a full SELECT item (optionally inside a
    single CAST(... AS type), optionally `AS alias`) → the item is
    replaced by the margin expression aliased `__mgN`.
  - a site nested inside an aggregate call (sum/avg/min/max) → the
    ENTIRE enclosing aggregate is replaced by `min(<margin>) AS __mgN`
    (the per-row margin minimum is what matters, not the sum).
  - a site inside WHERE/HAVING/ON → rewriting would change the selected
    rows; reported MANUAL (hand probes live in BENCH_NOTES.md).
Only `__mgN` columns are read back; everything else in the projection
is untouched, so grouping/filters/window frames keep their semantics.

Usage: python3 tools/margin_sweep.py <sfDir> <verifyOutDir> [entry ...]
"""
import sys, json, os, re
import duckdb
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
TRANSCENDENTAL = re.compile(
    r"\b(ln|log|log10|log2|exp|sqrt|power|pow|asin|acos|atan|sin|cos)\s*\(", re.I)
AGG_CALL = re.compile(r"\b(sum|avg|min|max)\s*\($", re.I)


def scan_call(sql, open_pos):
    """Given index of '(' , return index just past matching ')'."""
    depth = 0
    i = open_pos
    while i < len(sql):
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    return None


def find_rounds(sql):
    """(start, end, arg, digits) for each round(X [, n])."""
    out = []
    for m in re.finditer(r"\bround\s*\(", sql, re.I):
        open_pos = sql.index("(", m.start())
        end = scan_call(sql, open_pos)
        if end is None:
            continue
        inner = sql[open_pos + 1:end - 1]
        # split top-level comma
        depth = 0
        comma = None
        for i, c in enumerate(inner):
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "," and depth == 0:
                comma = i
        if comma is None:
            arg, digits = inner, "0"
        else:
            arg, digits = inner[:comma], inner[comma + 1:].strip()
        out.append((m.start(), end, arg, digits))
    return out


def clause_of(sql, pos):
    best = ("SELECT", -1)
    for kw in ("SELECT", "WHERE", "HAVING", r"ON", "GROUP\s+BY", "ORDER\s+BY"):
        for m in re.finditer(r"\b" + kw + r"\b", sql, re.I):
            if m.start() < pos and m.start() > best[1]:
                best = (kw.replace("\\s+", " "), m.start())
    return best[0]


def enclosing_agg(sql, start):
    """If sql[start:] sits inside an aggregate call, return its
    (call_start, call_end) span, else None. Scans outward for a
    sum|avg|min|max '(' whose span covers start."""
    for m in re.finditer(r"\b(sum|avg|min|max)\s*\(", sql, re.I):
        if m.start() >= start:
            break
        open_pos = sql.index("(", m.start())
        end = scan_call(sql, open_pos)
        if end is not None and m.start() < start < end:
            return (m.start(), end)
    return None


def item_span(sql, rstart, rend):
    """If the round at [rstart,rend) is a full SELECT item — optionally
    wrapped in one CAST(... AS type) — return (item_start, item_end,
    has_alias_end) else None. item covers `[CAST(] round(...) [AS t)]
    [AS alias]`."""
    s, e = rstart, rend
    # one optional CAST wrapper
    before = sql[:s].rstrip()
    if re.search(r"\bCAST\s*\($", before, re.I):
        cast_open = before.rfind("(")
        cast_start = re.search(r"\bCAST\s*\($", before, re.I).start()
        cast_end = scan_call(sql, cast_open)
        if cast_end is None:
            return None
        between = sql[e:cast_end - 1]
        if not re.fullmatch(r"\s*AS\s+[\w()\s,]*", between, re.I):
            return None
        s, e = cast_start, cast_end
    # preceded by SELECT or ',' at item level?
    pre = sql[:s].rstrip()
    if not (pre.endswith(",") or re.search(r"\bSELECT\b\s*(DISTINCT\s*)?$", pre, re.I)):
        return None
    # optional alias
    m = re.match(r"\s*AS\s+\w+", sql[e:], re.I)
    if m:
        e = e + m.end()
    nxt = sql[e:].lstrip()
    if not (nxt.startswith(",") or re.match(r"(FROM|$)", nxt, re.I)):
        return None
    return (s, e)


def margin_expr(arg, digits):
    # SAFETY FACTOR: distance to the nearest half-integer boundary,
    # divided by the 1-ulp cross-engine perturbation 2.2e-16*|s| —
    # >1e3 means a last-ulp libm difference sits >=1000x below the
    # flip threshold at this capture.
    x = f"(({arg})*1e{digits})"
    return (f"abs({x} - floor({x}) - 0.5)"
            f" / (2.220446049250313e-16 * greatest(abs({x}), 1.0))")


def rewrite(sql):
    """Return (rewritten_sql, n_probes, notes) — probes aliased __mgN.
    notes collects MANUAL sites."""
    sites = [r for r in find_rounds(sql) if TRANSCENDENTAL.search(r[2])]
    if not sites:
        return None, 0, ["no transcendental rounds"]
    notes = []
    plan = []  # (span_start, span_end, replacement)
    for idx, (s, e, arg, d) in enumerate(sites):
        if not re.fullmatch(r"\d+", d):
            notes.append(f"MANUAL site{idx}: digits {d!r}")
            continue
        cl = clause_of(sql, s)
        if cl in ("WHERE", "HAVING", "ON"):
            notes.append(f"MANUAL site{idx}: in {cl}")
            continue
        agg = enclosing_agg(sql, s)
        if agg is not None:
            a0, a1 = agg
            # the aggregate itself may carry an alias; leave it — we
            # replace only the call and append our own alias if the
            # original had one after a1 we keep it but then column name
            # is the original alias; simpler: keep original alias.
            plan.append((a0, a1, f"min({margin_expr(arg, d)})"))
            continue
        it = item_span(sql, s, e)
        if it is not None:
            plan.append((it[0], it[1],
                         f"{margin_expr(arg, d)} AS __mg{idx}"))
            continue
        notes.append(f"MANUAL site{idx}: nested non-aggregate")
    if not plan:
        return None, 0, notes
    # overlapping aggregate spans (two rounds in one sum) — dedupe
    plan.sort(key=lambda p: (-p[0], p[1]))
    dedup = []
    last_start = None
    for p in plan:
        if last_start is not None and p[0] >= last_start:
            continue  # overlaps a span we already replaced
        dedup.append(p)
        last_start = p[0]
    for s, e, rep in dedup:
        sql = sql[:s] + rep + sql[e:]
    return sql, len(dedup), notes


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    sqls = json.load(open(f"{out_dir}/oracle_sql.json"))
    rows = []
    for name in sorted(sqls):
        if only and name not in only:
            continue
        rw, n, notes = rewrite(sqls[name])
        if rw is None:
            if any(x.startswith("MANUAL") for x in notes):
                rows.append((name, None, "; ".join(notes)))
            continue
        try:
            df = con.execute(rw).fetchdf()
        except Exception as e:
            rows.append((name, None,
                         f"probe error: {str(e).splitlines()[0][:90]}"))
            continue
        mmin = None
        for c in df.columns:
            # probe columns only: __mgN aliases, plus any column whose
            # values we replaced an aggregate under (original alias) —
            # conservative: only __mgN unless none exist.
            if not str(c).startswith("__mg"):
                continue
            v = df[c].dropna().values
            if len(v) and df[c].dtype.kind == "f":
                m = float(np.min(v))
                mmin = m if mmin is None else min(mmin, m)
        if mmin is None:
            # aggregate-replacement path kept original aliases; fall
            # back to ALL float columns of the probe result — safe
            # because every float col in the rewritten projection is
            # either a margin or untouched (untouched cols can only
            # RAISE the min incorrectly if tiny; list them instead)
            for c in df.columns:
                v = df[c].dropna().values
                if len(v) and df[c].dtype.kind == "f":
                    m = float(np.min(v))
                    mmin = m if mmin is None else min(mmin, m)
            note = (f"{n} agg-probes (FALLBACK: min over all float "
                    "cols — may understate; covered by a "
                    "margin_manual.py probe)")
        else:
            note = f"{n} probes"
        extra = "; ".join(x for x in notes if x.startswith("MANUAL"))
        rows.append((name, mmin, note + ("; " + extra if extra else "")))
    print(f"{'entry':34s} {'min_margin':>12s}  note")
    worst = []
    for name, m, note in rows:
        ms = "MANUAL" if m is None else f"{m:12.3e}"
        print(f"{name:34s} {ms:>12s}  {note}")
        if m is not None:
            worst.append((m, name))
    worst.sort()
    print("\nworst 5:", [(nm, f"{m:.2e}") for m, nm in worst[:5]])
    # fallback (all-float-col) entries can report non-margin columns;
    # their authoritative numbers come from tools/margin_manual.py
    flagged = [nm for m, nm in worst
               if m < 1e3 and "FALLBACK" not in dict(
                   (r[0], r[2]) for r in rows)[nm]]
    print("flagged (safety < 1e3):", flagged or "none")


if __name__ == "__main__":
    main()
