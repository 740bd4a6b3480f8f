"""Driver-window composition check: the driver's correctness record
keeps only the FIRST 50 registered queries, so every query that is new
or changed in the current round must register at position <= 50 (see
queries/__init__.py for the rotation policy).

Usage:
    python tools/window_check.py [name ...]

With names: asserts each is inside the window (exit 1 otherwise).
Without: prints the window boundary and the out-of-window tail with
oracle/rows-only status, for eyeballing before a round ends.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spotify_pipeline_gcp_spark.queries import REGISTRY, load_all  # noqa: E402

WINDOW = 50


def main() -> int:
    names = list(load_all())
    pos = {n: i + 1 for i, n in enumerate(names)}
    if len(sys.argv) > 1:
        bad = [n for n in sys.argv[1:] if pos.get(n, 10**9) > WINDOW]
        for n in bad:
            print(f"OUT OF WINDOW: {n} at position {pos.get(n, '?')}")
        print(f"{len(sys.argv) - 1 - len(bad)} in-window, {len(bad)} out")
        return 1 if bad else 0
    print(f"{len(names)} registered; window = first {WINDOW}")
    print(f"window boundary: ..., {names[WINDOW - 2]}, {names[WINDOW - 1]} | "
          f"{names[WINDOW]}, ...")
    print("out-of-window tail:")
    for n in names[WINDOW:]:
        kind = "oracle   " if REGISTRY[n].oracle else "rows-only"
        print(f"  {pos[n]:3d} {kind} {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
