"""Rotation staleness audit: which registry queries have the oldest driver
evidence, and does the current first-50 window point at them?

Reads every CORRECTNESS_r*.json in the repo root, labels each registry key
with the LATEST round that produced a fully-green row for it (hash for
oracle-backed keys), and reports:
  - the current first-50 window's evidence mix,
  - keys whose latest evidence is ≥2 rounds old but sit OUTSIDE the window
    (rotation debt — candidates for the next round's _PRIORITY_KEYS),
  - keys never driver-checked at all.

Usage: python tools/rotation_check.py [window_size]
Pure bookkeeping — no Spark session needed (imports the registry only).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    from etl_process_for_detecting_fraudulent_transactions_spark.queries import all_queries

    keys = list(all_queries())
    latest: dict[str, int] = {}
    rounds = []
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        n = int(m.group(1))
        rounds.append(n)
        data = json.load(open(path))
        for k, row in data.items():
            ok = (
                row.get("err") is None
                and row.get("rows_match")
                and row.get("schema_match", True)
                and row.get("hash_match", True)
            )
            if ok:
                latest[k] = max(latest.get(k, 0), n)
    if not rounds:
        print("no CORRECTNESS_r*.json found")
        return
    cur = max(rounds)

    def label(k: str) -> str:
        return f"r{latest[k]}" if k in latest else "never"

    first = keys[:window]
    rest = keys[window:]
    from collections import Counter

    print(f"registry: {len(keys)} keys; latest driver round: r{cur}")
    print(f"first-{window} evidence mix: {dict(Counter(label(k) for k in first))}")
    debt = [
        (k, label(k))
        for k in rest
        if k not in latest or cur - latest[k] >= 2
    ]
    debt.sort(key=lambda kv: (kv[1] != "never", kv[1]))
    print(f"\nrotation debt OUTSIDE the window ({len(debt)} keys, stalest first):")
    for k, lab in debt:
        print(f"  {lab:>6}  {k}")
    never_any = [k for k in keys if k not in latest]
    if never_any:
        print(f"\nnever fully-green in any driver round: {never_any}")


if __name__ == "__main__":
    main()
