#!/usr/bin/env python
"""Regenerate the thorough-tier list in tests/conftest.py from a measured
durations report.

Usage:
    PYSTENCILS_ADTPU_FULL_SUITE=1 python -m pytest tests/ -q --durations=0 \
        > /tmp/durations.txt
    python tools/regen_tiers.py /tmp/durations.txt [--cut 3.0]

Tests at or above the cut (seconds) land in ``_THOROUGH`` (skipped by
default, run with PYSTENCILS_ADTPU_FULL_SUITE=1) — except the KEEPERS,
default-lane canaries that must stay even though they exceed the cut.
The script rewrites the tuple in place between its parentheses and prints
the projected default-lane call time.
"""

from __future__ import annotations

import argparse
import re
import sys

# default-lane canaries: one fast representative per gated family
KEEPERS = {
    "test_fused_bwd_neumann_matches_sequential",
    "test_fwi_gradient_end_to_end",
    "test_random_chain_fused_bwd_with_bcs",
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("durations_file")
    ap.add_argument("--cut", type=float, default=3.0)
    ap.add_argument("--conftest", default="tests/conftest.py")
    args = ap.parse_args()

    rows = []
    pat = re.compile(r"^\s*([0-9.]+)s call\s+(\S+)")
    for line in open(args.durations_file):
        m = pat.match(line)
        if m:
            rows.append((float(m.group(1)), m.group(2)))
    if not rows:
        print("no '<t>s call <nodeid>' rows found — pass --durations=0 "
              "output", file=sys.stderr)
        return 1
    rows.sort(reverse=True)

    entries, kept_heavy = [], 0.0
    default_time = 0.0
    for t, nodeid in rows:
        # last :: segment = the test function even for class-based tests;
        # strip only the PATH prefix (a param id could contain "tests/")
        short = nodeid.split("::")[-1].split("[")[0]
        entry = nodeid[len("tests/"):] if nodeid.startswith("tests/") \
            else nodeid
        if t >= args.cut and short not in KEEPERS:
            entries.append(entry)
        else:
            default_time += t
            if t >= args.cut:
                kept_heavy += t

    src = open(args.conftest).read()
    block = "".join(f'    "{e}",\n' for e in entries)
    new_src, n = re.subn(r"_THOROUGH = \(\n(?:    .*\n)*\)",
                         f"_THOROUGH = (\n{block})", src, count=1)
    if n != 1:
        print("could not locate the _THOROUGH tuple", file=sys.stderr)
        return 1
    open(args.conftest, "w").write(new_src)
    print(f"wrote {len(entries)} thorough entries "
          f"(cut {args.cut}s, keepers above cut: {kept_heavy:.0f}s); "
          f"projected default-lane call time {default_time:.0f}s "
          f"(+ ~20s pytest overhead)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
