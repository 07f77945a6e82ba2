#!/usr/bin/env python3
"""Round-close BENCH reconciliation (the r14 lesson, the bench twin of
reconcile.py): diff the DRIVER's bench artifact against the BUILDER's
committed run of the same tree, report BOTH totals, and flag every
query whose driver/builder ratio exceeds the threshold — each flag
requires an interleaved A/B adjudication (tools/bench_ab.sh) recorded
in SCALE.md §8b before the round docs may quote a round-over-round
movement for it.

Why this exists: in round 14 the README quoted the builder's run
(0.92x) while the driver's artifact read flat (0.998x on the common
subset) — machine drift between two runs of an IDENTICAL tree. Round
docs must lead with the driver's numbers; a >1.5x per-query gap
between two runs of the same code is itself a finding (driver-machine
drift or interference), never silently averaged away.

Usage: python3 tools/reconcile_bench.py <driver.json> <builder.json> [ratio]
Exit:  0 when no per-query ratio exceeds the threshold; 1 otherwise
       (the flags then need A/B adjudication lines, not silence).
Dev tool only — not part of the shipped library.
"""
import json
import sys
from pathlib import Path


def load(path):
    doc = json.loads(Path(path).read_text())
    # accept either the one-line Bench JSON or a wrapper carrying it
    if "queries" not in doc and "bench" in doc:
        doc = doc["bench"]
    return doc.get("value"), doc.get("queries", {})


def main():
    driver_path, builder_path = sys.argv[1], sys.argv[2]
    flag_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    d_total, d_q = load(driver_path)
    b_total, b_q = load(builder_path)
    common = sorted(set(d_q) & set(b_q))
    d_common = sum(d_q[n] for n in common)
    b_common = sum(b_q[n] for n in common)
    print(f"driver  total: {d_total:8.1f}s over {len(d_q)} queries "
          f"({driver_path})")
    print(f"builder total: {b_total:8.1f}s over {len(b_q)} queries "
          f"({builder_path})")
    if common:
        print(f"common subset ({len(common)}): driver {d_common:.1f}s / "
              f"builder {b_common:.1f}s = {d_common / b_common:.3f}x")
    only_d = sorted(set(d_q) - set(b_q))
    only_b = sorted(set(b_q) - set(d_q))
    if only_d:
        print(f"driver-only queries: {', '.join(only_d)}")
    if only_b:
        print(f"builder-only queries: {', '.join(only_b)}")

    flags = []
    for n in common:
        if b_q[n] <= 0 or d_q[n] <= 0:
            continue
        r = d_q[n] / b_q[n]
        if r > flag_ratio or r < 1.0 / flag_ratio:
            flags.append((n, d_q[n], b_q[n], r))
    for n, dv, bv, r in sorted(flags, key=lambda f: -max(f[3], 1 / f[3])):
        print(f"FLAG {n}: driver {dv:.2f}s vs builder {bv:.2f}s = {r:.2f}x"
              f" — adjudicate: tools/bench_ab.sh <prior-round-ref>"
              f" /root/testdata/sf0.1 {n} 5 ; record in SCALE.md §8b")
    print(f"\n{len(flags)} quer{'y' if len(flags) == 1 else 'ies'} flagged "
          f"at ratio > {flag_ratio}x between two runs of the same tree")
    if flags:
        print("ROUND DOCS MUST QUOTE THE DRIVER'S NUMBERS FIRST AND CARRY "
              "ONE ADJUDICATION LINE PER FLAG.")
        sys.exit(1)
    sys.exit(0)


if __name__ == "__main__":
    main()
