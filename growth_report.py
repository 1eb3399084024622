#!/usr/bin/env python
"""Build the BASELINE.md sf0.1->sf1 growth-factor table from two
replica_check.py --resume JSONLs.

    python growth_report.py /tmp/replica_sf01.jsonl /tmp/replica_sf1.jsonl

Prints a markdown table (query, sf0.1 engine s, sf1 engine s, growth
factor) sorted by sf1 time descending, plus summary stats: median/mean
growth, and the count of queries growing >= the 10x data-growth factor
(the barrier-amortization claim is that per-query time grows << 10x
because sf0.1 wall time is mostly the fixed ~1.1 s/barrier floor).
"""

from __future__ import annotations

import json
import statistics
import sys


def load(path: str) -> dict:
    rows: dict = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.update(json.loads(line))
    return rows


def main() -> None:
    small, big = load(sys.argv[1]), load(sys.argv[2])
    shared = [
        q for q in big
        if q in small
        and "engine_sec" in small[q] and "engine_sec" in big[q]
        and not str(small[q].get("err", "")).startswith("engine")
        and not str(big[q].get("err", "")).startswith("engine")
    ]
    rows = []
    for q in shared:
        a, b = small[q]["engine_sec"], big[q]["engine_sec"]
        rows.append((q, a, b, b / a if a > 0 else float("inf")))
    rows.sort(key=lambda r: -r[2])
    print("| query | sf0.1 engine s | sf1 engine s | growth |")
    print("|---|---|---|---|")
    for q, a, b, g in rows:
        print(f"| {q} | {a:.2f} | {b:.2f} | {g:.2f}x |")
    growths = [g for _, _, _, g in rows if g != float("inf")]
    print()
    print(
        f"n={len(growths)} median growth {statistics.median(growths):.2f}x, "
        f"mean {statistics.mean(growths):.2f}x, "
        f">=10x (data growth): {sum(1 for g in growths if g >= 10)}, "
        f"<=3x: {sum(1 for g in growths if g <= 3)}"
    )
    tot_a = sum(a for _, a, _, _ in rows)
    tot_b = sum(b for _, _, b, _ in rows)
    print(f"total engine wall: sf0.1 {tot_a:.0f} s -> sf1 {tot_b:.0f} s "
          f"({tot_b / tot_a:.2f}x on 10x data)")


if __name__ == "__main__":
    main()
