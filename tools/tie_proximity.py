#!/usr/bin/env python3
"""Tie-proximity sweep over the oracle SQL's round() sites (VERDICT r13
item 4 / BASELINE.md "round() class waiver").

The last systematic hash-flake surface is the ~200 cosmetic 2-arg
`round(expr, n)` output sites: Spark and DuckDB compute `expr` within a
few ulps of each other, so the hash gate can only flake when the TRUE
value sits within that ulp distance of a .5 rounding boundary (the
evt_mad_outliers 0.5227375 near-miss precedent). This tool measures how
close each site actually gets:

  for every `round(X, n)` in a query's top-level oracle projection, run
  the query with the site replaced by
      abs(abs(X) * 10^n % 1.0 - 0.5)
  and report the MINIMUM over rows — the distance to the nearest tie.
  A site whose minimum is comfortably above ~1e-6 cannot flake on ulp
  noise; a site under ~1e-9 is a conversion candidate (micro-units /
  unrounded DOUBLE, the evt_mad_outliers template).

Usage: python3 tools/tie_proximity.py <sfDir> <verifyOutDir> [minShow]

<verifyOutDir> must contain oracle_sql.json (written by graft.Verify).
Only the ORACLE side runs — the Spark side computes the same expr within
ulps, so proximity measured here bounds both engines' tie risk. Sites
inside CTEs are NOT swept (their rounding feeds integer/grid math by
repo convention — see BASELINE.md); only the final projection's sites
hash into the gate directly.

Output: one line per (query, site): min distance, and a sorted summary
of the N closest sites repo-wide.
"""
import sys, os, json, re
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def split_final_select(sql: str):
    """Index of the last depth-0 SELECT — the final projection whose
    round() sites hash into the gate directly (CTE sites feed integer/
    grid math by repo convention and are excluded)."""
    depth = 0
    last_select = 0
    i = 0
    up = sql.upper()
    while i < len(sql):
        c = sql[i]
        if c == '(':
            depth += 1
        elif c == ')':
            depth -= 1
        elif depth == 0 and up.startswith("SELECT", i):
            last_select = i
        i += 1
    return last_select


def find_round_sites(sql: str):
    """Balanced-paren extraction of every `round(X, n)` call (2-arg only)
    in the FINAL top-level SELECT of the statement. Returns a list of
    (full_call, inner_expr, digits)."""
    tail = sql[split_final_select(sql):]
    sites = []
    for m in re.finditer(r'\bround\s*\(', tail, re.IGNORECASE):
        start = m.end()  # after the open paren
        depth = 1
        j = start
        args_split = None
        while j < len(tail) and depth > 0:
            c = tail[j]
            if c == '(':
                depth += 1
            elif c == ')':
                depth -= 1
            elif c == ',' and depth == 1 and args_split is None:
                args_split = j
            j += 1
        if depth != 0 or args_split is None:
            continue  # 1-arg round (scale-0, proven-safe class) or unbalanced
        inner = tail[start:args_split].strip()
        digits = tail[args_split + 1:j - 1].strip()
        if re.fullmatch(r'\d+', digits):
            sites.append((tail[m.start():j], inner, int(digits)))
    return sites


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    min_show = float(sys.argv[3]) if len(sys.argv) > 3 else 1e-4
    con = duckdb.connect()
    con.execute("SET threads TO 8")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')"
                        if os.path.isdir(p) else
                        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    import math
    rows = []
    errs = 0
    for name, sql in sorted(oracles.items()):
        sites = find_round_sites(sql)
        if not sites:
            continue
        try:
            df0 = con.execute(f"SELECT * FROM ({sql}) t").fetchdf()
        except Exception as e:
            errs += 1
            print(f"[err ] {name} base: {type(e).__name__}: {str(e)[:100]}")
            continue
        # anchor replacements to the FINAL projection: a plain sql.replace
        # would rewrite an identical call text inside a CTE (excluded from
        # the sweep by design) and leave the real gate site rounded
        cut = split_final_select(sql)
        head, tail = sql[:cut], sql[cut:]
        for k, (call, inner, n) in enumerate(sites):
            # replace ONLY this site with its distance-to-tie; scope stays
            # valid because the expression runs in the same select item.
            # skip k prior occurrences so duplicate call texts in the final
            # SELECT each measure their own site.
            prior = sum(1 for (c2, _, _) in sites[:k] if c2 == call)
            pos = -1
            for _ in range(prior + 1):
                pos = tail.find(call, pos + 1)
            if pos < 0:
                continue
            site_sql = head + tail[:pos] + f"abs(abs(({inner})) * 1e{n} % 1.0 - 0.5)" + tail[pos + len(call):]
            try:
                df1 = con.execute(f"SELECT * FROM ({site_sql}) t").fetchdf()
            except Exception as e:
                errs += 1
                print(f"[err ] {name} site{k}: {type(e).__name__}: {str(e)[:100]}")
                continue
            # the affected output column(s) = those whose values changed vs
            # the original run (alias is unchanged by the substitution)
            best = None
            for col in df1.columns:
                if col not in df0.columns or df1[col].dtype.kind != 'f':
                    continue
                a, b = df0[col], df1[col]
                try:
                    same = len(a) == len(b) and bool(a.fillna(-1.0).eq(b.fillna(-1.0)).all())
                except Exception:
                    same = False
                if same:
                    continue
                vals = [v for v in b if v is not None and not (isinstance(v, float) and math.isnan(v))]
                # a distance column is bounded in [0, 0.5] by construction;
                # columns outside that range changed for another reason
                # (e.g. the ORDER BY re-sorted on the replaced column)
                if vals and min(vals) >= -1e-12 and max(vals) <= 0.5 + 1e-12:
                    m = min(vals)
                    best = m if best is None or m < best else best
            if best is not None:
                rows.append((best, name, k, n))
    rows.sort()
    print(f"\n== {len(rows)} sites swept, {errs} errors; closest ties first ==")
    for d, name, k, n in rows:
        if d <= min_show:
            print(f"{d:.3e}  {name} site{k} (dp={n})")
    if rows:
        print(f"\nglobal min distance: {rows[0][0]:.3e} ({rows[0][1]})")


if __name__ == "__main__":
    main()
