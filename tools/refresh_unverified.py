"""Recompute plans/__init__._UNVERIFIED_FIRST from the CORRECTNESS files.

The driver hash-checks a rotating subset of `queries()`; ordering
never-verified queries first is how the rotation reaches them. This prints
the refreshed tuple (newly registered queries first, then older
never-checked ones) — paste it over `_UNVERIFIED_FIRST` at the start of
each round, after the new CORRECTNESS_r{N}.json lands.

Usage: python tools/refresh_unverified.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from hbase_packet_inspector_spark import plans  # noqa: E402


def main() -> None:
    checked: set[str] = set()
    for path in sorted(glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json"))):
        try:
            data = json.load(open(path))
            # only a GREEN hash row counts as "checked" — a red row (or a
            # rows-only entry) must stay in the priority prefix so the
            # rotation re-reaches it after the fix
            checked |= {
                k for k, v in data.items()
                if isinstance(v, dict) and v.get("hash_match")
            }
        except Exception as e:  # pragma: no cover - malformed driver file
            print(f"warn: skipping {path}: {e}", file=sys.stderr)
    registered = list(plans.QUERIES)
    unchecked = [n for n in registered if n not in checked]
    print(f"# {len(registered)} registered, {len(checked)} ever checked, "
          f"{len(unchecked)} never checked")
    print("_UNVERIFIED_FIRST = (")
    for n in unchecked:
        print(f'    "{n}",')
    print(")")


if __name__ == "__main__":
    main()
