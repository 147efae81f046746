"""Tight-interleave every paired-ratio outlier from a bench record.

Two rounds in a row, the full bench's paired A/B produced per-query
ratios of 1.1-1.3 that evaporated (0.86-0.97) under a narrow 9-pass
tight interleave — the full-bench pairing puts a query's A and B
passes minutes apart, wide enough for this VM's noisy-neighbor drift
to land on one side of a pair. The judge's r11 direction: any query
whose closing paired ratio leaves [0.9, 1.1] gets the tight interleave
AUTOMATICALLY, so the artifact class dies instead of consuming another
round of autopsy.

    python tools/ab_outliers.py [BENCH_JSON] [--passes N] [--lo X] [--hi Y]

Reads the bench summary (default BENCH_DETAIL.json next to bench.py),
collects queries with vs_prev_head.ratios outside [lo, hi], and runs
tools/ab_pair.py ONCE over all of them (one Spark session, N
back-to-back A/B segments) against the same ref the bench paired with.
Prints ab_pair's JSON line, or {"outliers": []} when the record is
clean. Exit 0 either way; non-zero only if ab_pair itself fails.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    argv = list(sys.argv[1:])
    passes, lo, hi = 9, 0.9, 1.1
    for flag, cast in (("--passes", int), ("--lo", float), ("--hi", float)):
        if flag in argv:
            i = argv.index(flag)
            val = cast(argv[i + 1])
            del argv[i : i + 2]
            passes, lo, hi = (
                (val, lo, hi)
                if flag == "--passes"
                else (passes, val, hi)
                if flag == "--lo"
                else (passes, lo, val)
            )
    path = argv[0] if argv else os.path.join(REPO, "BENCH_DETAIL.json")
    record = json.load(open(path))
    ab = record.get("vs_prev_head") or {}
    ratios = ab.get("ratios") or {}
    outliers = sorted(
        q for q, r in ratios.items() if r is not None and not lo <= r <= hi
    )
    if not outliers:
        print(json.dumps({"outliers": [], "checked": len(ratios)}))
        return 0
    ref = ab.get("ref")
    if not ref:
        sys.stderr.write("bench record has ratios but no ref\n")
        return 1
    sys.stderr.write(
        f"tight-interleaving {len(outliers)} outlier(s) vs {ref}: "
        f"{outliers}\n"
    )
    return subprocess.call(
        [
            sys.executable,
            os.path.join(REPO, "tools", "ab_pair.py"),
            ref,
            *outliers,
            "--passes",
            str(passes),
        ]
    )


if __name__ == "__main__":
    raise SystemExit(main())
