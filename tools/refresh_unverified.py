"""Recompute plans/__init__._UNVERIFIED_FIRST from the CORRECTNESS files.

The driver hash-checks a rotating ~50-slot prefix of `queries()`. With 115
registered queries full re-verification takes 3 rounds, so the ordering
must keep every query's latest green row fresh: queries NEVER green come
first, then everything else ascending by the round of its LATEST green
hash row (oldest-green-first — the r4-verdict refinement over plain
never-checked-first), registration order as the tie-break. This prints
the refreshed tuple — paste it over `_UNVERIFIED_FIRST` at the start of
each round, after the new CORRECTNESS_r{N}.json lands.

Usage: python tools/refresh_unverified.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from hbase_packet_inspector_spark import plans  # noqa: E402


def main() -> None:
    latest_green: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            data = json.load(open(path))
        except Exception as e:  # pragma: no cover - malformed driver file
            print(f"warn: skipping {path}: {e}", file=sys.stderr)
            continue
        for k, v in data.items():
            # only a GREEN hash row counts — a red row (or a rows-only
            # entry) must stay in the priority prefix so the rotation
            # re-reaches it after the fix
            if isinstance(v, dict) and v.get("hash_match"):
                latest_green[k] = max(latest_green.get(k, 0), rnd)
    registered = list(plans.QUERIES)
    order = {n: i for i, n in enumerate(registered)}
    ranked = sorted(registered,
                    key=lambda n: (latest_green.get(n, 0), order[n]))
    never = sum(1 for n in registered if n not in latest_green)
    print(f"# {len(registered)} registered, {never} never green; "
          f"ordering = never-green first, then oldest latest-green round")
    print("_UNVERIFIED_FIRST = (")
    for n in ranked:
        print(f'    "{n}",  # latest green r{latest_green.get(n, 0)}')
    print(")")


if __name__ == "__main__":
    main()
