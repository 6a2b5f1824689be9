"""Regenerate the QUERIES dict in stalest-first driver-window order.

The driver's correctness gate checks only the FIRST 50 keys of
``__spark_entry__.queries()`` each round, so declaration order is
load-bearing: queries with no driver row yet (this round's additions)
go first, then everything else ascending by the newest round in which
the driver checked it (union of CORRECTNESS_r*.json), ties alphabetical.
Run AFTER declaring new queries, BEFORE the round's final commit:

    python tools/rotate_queries.py          # rewrites plans/queries.py in place
    python tools/rotate_queries.py --check  # exit 1 if order is stale

NOTE: landing a new CORRECTNESS_rNN.json makes the previous round's
additions stale by definition, so any commit that introduces one must
re-run this rewrite first — `--check` cannot be green across that
commit otherwise (each round therefore opens with a rotation).

The rewrite only touches the dict literal block (everything between the
``QUERIES: dict[...] = {`` line and its closing ``}``); function bodies
above it are untouched. Idempotent.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QPATH = f"{REPO}/nyc_bikeshare_datawarehouse_spark/plans/queries.py"
HEAD = "QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {"


def newest_driver_rows() -> dict[str, int]:
    newest: dict[str, int] = {}
    for p in sorted(glob.glob(f"{REPO}/CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", p).group(1))
        for k in json.load(open(p)):
            newest[k] = max(newest.get(k, 0), rnd)
    return newest


def desired_order(keys: list[str]) -> list[str]:
    newest = newest_driver_rows()
    new = [k for k in keys if k not in newest]  # declaration order preserved
    stale = sorted((k for k in keys if k in newest), key=lambda k: (newest[k], k))
    return new + stale


def current_block() -> tuple[str, int, int, list[str]]:
    src = open(QPATH).read()
    start = src.index(HEAD)
    end = src.index("\n}\n", start) + len("\n}\n")
    keys = re.findall(r'^    "(\w+)": \w+,', src[start:end], flags=re.M)
    return src, start, end, keys


def main() -> int:
    src, start, end, keys = current_block()
    order = desired_order(keys)
    assert sorted(order) == sorted(keys)
    if "--check" in sys.argv:
        if order == keys:
            print(f"order OK ({len(keys)} queries)")
            return 0
        first_bad = next(i for i, (a, b) in enumerate(zip(order, keys)) if a != b)
        print(f"STALE at index {first_bad}: want {order[first_bad]}, have {keys[first_bad]}")
        return 1
    newest = newest_driver_rows()
    lines = [HEAD]
    lines.append("    # --- stalest-first rotation (tools/rotate_queries.py): the driver")
    lines.append("    # --- checks the FIRST 50 keys each round. New queries (no driver")
    lines.append("    # --- rows) first, then ascending by newest driver row.")
    cur: object = object()
    for i, k in enumerate(order):
        t = newest.get(k)
        if t != cur:
            cur = t
            label = "new this round (no driver rows)" if t is None else f"newest driver row: r{t:02d}"
            lines.append(f"    # --- {label}")
        mark = "  # <- driver window cut (50)" if i == 49 else ""
        lines.append(f'    "{k}": {k},{mark}')
    lines.append("}")
    open(QPATH, "w").write(src[:start] + "\n".join(lines) + "\n" + src[end:])
    print(f"rewrote {len(order)} queries; window = {order[:3]}... cut after {order[49]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
