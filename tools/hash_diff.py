"""Diff two result-hash manifests (HASHES_r{N}.json).

    python tools/hash_diff.py HASHES_r06.json HASHES_r07.json

Prints added / removed / changed queries; exit 0 when every query
present in both manifests has an identical result hash (added queries
are fine — new operators — but a CHANGED hash means some query's
answer moved between rounds and needs an explanation in the round's
SELFCHECK notes).
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    old, new = (json.load(open(p)) for p in sys.argv[1:3])
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    changed = sorted(
        n for n in set(old) & set(new) if old[n]["hash"] != new[n]["hash"]
    )
    same = len(set(old) & set(new)) - len(changed)
    print(f"unchanged: {same}")
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    for n in changed:
        o, w = old[n], new[n]
        print(
            f"CHANGED {n}: rows {o['rows']}->{w['rows']}, "
            f"hash {o['hash'][:12]}->{w['hash'][:12]}"
        )
    if not changed:
        print("no query's answer changed")
    return 1 if changed else 0


if __name__ == "__main__":
    raise SystemExit(main())
