#!/usr/bin/env python3
"""Round-close reconciliation gate: diff the DRIVER's correctness
artifact (CORRECTNESS_r{N}.json) against the local replica's verdicts
(tools/check.py's check_results.json), and REFUSE a green round-status
claim on any divergence.

Why this exists: in round 13 the local replica read 138/138 while the
driver artifact carried two hash_match:false rows — and the round docs
reported only the greener local number. The driver artifact is the
gate of record; any disagreement between it and the replica is itself
a finding that must surface at round close, never be averaged away.

Usage: python3 tools/reconcile.py CORRECTNESS_rN.json <verifyOutDir>
Exit:  0 only if the driver artifact is fully green AND the local
       replica agrees query-by-query; 1 otherwise.
Dev tool only — not part of the shipped library.
"""
import json
import sys
from pathlib import Path


def driver_verdict(row):
    """Collapse a driver artifact row to green/red/rows-only."""
    if row.get("err") == "no_oracle":
        return "rows-ok" if (row.get("spark_rows") or 0) > 0 else "EMPTY"
    if row.get("err"):
        return f"err:{row['err']}"
    ok = (row.get("rows_match") and row.get("schema_match")
          and row.get("hash_match"))
    return "pass" if ok else "fail"


def main():
    art_path, out_dir = sys.argv[1], sys.argv[2]
    driver = json.loads(Path(art_path).read_text())
    if isinstance(driver, dict) and "queries" in driver:
        driver = driver["queries"]
    local_path = Path(out_dir, "check_results.json")
    local = json.loads(local_path.read_text())

    red, diverged = [], []
    names = sorted(set(driver) | set(local))
    for name in names:
        d = driver_verdict(driver[name]) if name in driver else "absent"
        l = local.get(name, "absent")
        d_green = d in ("pass", "rows-ok")
        l_green = l in ("pass", "rows-ok")
        # a query not in the driver artifact yet (added since that
        # artifact was produced) is NOT a red row — it lands in the
        # NOTE below and gets judged by the NEXT driver artifact
        if not d_green and name in driver:
            red.append((name, d, l))
        if d_green != l_green or (name not in driver) != (name not in local):
            # local-only names are fine when they're NEW queries added
            # after the driver artifact was produced — flag, don't fail
            if name in driver:
                diverged.append((name, d, l))
    for name, d, l in red:
        print(f"DRIVER-RED  {name}: driver={d} local={l}")
    for name, d, l in diverged:
        print(f"DIVERGENCE  {name}: driver={d} local={l} "
              "(replica disagrees with the gate of record)")
    new = [n for n in names if n not in driver]
    # A local-only query with a NON-GREEN local verdict is the row the
    # NEXT driver artifact will judge red — fail it now, not next round.
    new_red = [(n, local.get(n, "absent")) for n in new
               if local.get(n) not in ("pass", "rows-ok")]
    for name, l in new_red:
        print(f"LOCAL-RED   {name}: not in driver artifact yet and the "
              f"local replica reads {l} — fix before round close")
    if new:
        print(f"NOTE        {len(new)} quer{'y' if len(new)==1 else 'ies'} "
              f"not in the driver artifact yet (added since): "
              f"{', '.join(new[:10])}")
    n_d = len(driver)
    n_green = sum(1 for n in driver
                  if driver_verdict(driver[n]) in ("pass", "rows-ok"))
    print(f"\ndriver artifact: {n_green}/{n_d} green | "
          f"divergences: {len(diverged)} | driver-red: {len(red)} | "
          f"local-red new queries: {len(new_red)}")
    if red or diverged or new_red:
        if red or diverged:
            print("ROUND STATUS MUST REPORT THE DRIVER'S NUMBERS, "
                  "NOT THE REPLICA'S.")
        sys.exit(1)
    print("reconciled: driver artifact and local replica agree, all green")
    sys.exit(0)


if __name__ == "__main__":
    main()
