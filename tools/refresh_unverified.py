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
    bound = -(-len(registered) // 50)
    comment = (
        "# Rotation order for the driver's ~50-slot correctness check: "
        "queries\n"
        "# never hash-verified first, then ascending by the round of "
        "each query's\n"
        "# LATEST green hash row (oldest-green-first). Worst-case "
        "freshness is\n"
        f"# ceil(len(registry) / 50) rounds (at {len(registered)} "
        f"queries: {bound} rounds between a\n"
        "# query's driver re-verifications), so the full-registry "
        "parity sweep\n"
        "# (tools/check_parity.py) stays the per-round gate. "
        "Regenerate with\n"
        "# `python tools/refresh_unverified.py --write` after each "
        "round's\n"
        "# CORRECTNESS_r{N}.json lands; new queries register with no "
        "green row\n"
        "# and land at the front automatically.\n"
    )
    tuple_src = "_UNVERIFIED_FIRST = (\n" + "".join(
        f'    "{n}",  # latest green r{latest_green.get(n, 0)}\n'
        for n in ranked) + ")"
    block = comment + tuple_src
    if "--write" in sys.argv:
        path = os.path.join(
            _ROOT, "hbase_packet_inspector_spark", "plans", "__init__.py")
        src = open(path).read()
        new = re.sub(
            r"# Rotation order for the driver's.*?\n_UNVERIFIED_FIRST"
            r" = \(.*?\n\)",
            block, src, count=1, flags=re.S)
        if new == src and block not in src:
            sys.exit("error: rotation block not found in plans/__init__.py")
        open(path, "w").write(new)
        print(f"# wrote {len(registered)} entries ({never} never green, "
              f"freshness bound {bound} rounds) to {path}")
    else:
        print(f"# {len(registered)} registered, {never} never green; "
              f"ordering = never-green first, then oldest latest-green "
              f"round (pass --write to update plans/__init__.py in place)")
        print(block)


if __name__ == "__main__":
    main()
