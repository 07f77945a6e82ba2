#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: load each Verify output
parquet, run the matching oracle SQL in DuckDB against the sf dir's tables,
and compare rows/schema/values (columns sorted by name, rows sorted).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
Dev tool only — not part of the shipped library.
"""
import json
import math
import sys
from pathlib import Path

import duckdb


def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = f"{v:.9g}"
            vals.append(repr(v))
        out.append("|".join(vals))
    return sorted(out)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    results = {}
    for name in sorted(oracle):
        pq = Path(out_dir) / name
        if not pq.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            results[name] = "missing"
            continue
        try:
            got_rel = con.sql(f"SELECT * FROM '{pq}/*.parquet'")
            got_cols = list(got_rel.columns)
            got_types = dict(zip(got_rel.columns, map(str, got_rel.types)))
            got = got_rel.fetchall()
            want_rel = con.sql(oracle[name])
            want_cols = list(want_rel.columns)
            want_types = dict(zip(want_rel.columns, map(str, want_rel.types)))
            want = want_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            results[name] = "error"
            continue
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: cols {sorted(got_cols)} != {sorted(want_cols)}")
            n_fail += 1
            results[name] = "cols"
            continue
        # Type-sensitive: the driver's hash distinguishes e.g. DuckDB HUGEINT
        # (sum of integers) from the BIGINT Spark writes — catch that here.
        bad_types = {c: (got_types[c], want_types[c]) for c in got_cols
                     if got_types[c] != want_types[c]}
        if bad_types:
            print(f"FAIL {name}: column types differ {bad_types}")
            n_fail += 1
            results[name] = "types"
            continue
        g, w = canon(got, got_cols), canon(want, want_cols)
        if g == w:
            n_pass += 1
            results[name] = "pass"
        else:
            n_fail += 1
            results[name] = "values"
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(w)}")
            for a, b in list(zip(g, w))[:200]:
                if a != b:
                    print(f"  spark : {a}\n  oracle: {b}")
                    break
            only_g = [x for x in g if x not in set(w)][:2]
            only_w = [x for x in w if x not in set(g)][:2]
            if only_g:
                print(f"  only-spark: {only_g}")
            if only_w:
                print(f"  only-oracle: {only_w}")
    # Rows-only queries (no oracle): check output exists and has rows.
    for d in sorted(Path(out_dir).iterdir()):
        if d.is_dir() and d.name not in oracle:
            n = con.execute(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
            status = "rows-ok" if n > 0 else "EMPTY"
            results[d.name] = status
            print(f"INFO {d.name}: rows-only, {n} rows ({status})")
    # Machine-readable verdicts for tools/reconcile.py (round-close gate:
    # the local replica must be diffed against the DRIVER's artifact).
    Path(out_dir, "check_results.json").write_text(json.dumps(results,
                                                              indent=1))
    print(f"\n{n_pass} pass / {n_fail} fail of {len(oracle)} oracle-checked")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
