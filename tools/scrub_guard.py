#!/usr/bin/env python
"""Inspect and scrub the compile-guard registry
(``~/.cache/pystencils_adtpu_guard.json`` or
``$PYSTENCILS_ADTPU_GUARD_CACHE``).

The guard records Mosaic compile crashes/timeouts per (signature, variant)
so later runs route around them.  Records now expire automatically
(``PYSTENCILS_ADTPU_GUARD_TTL_S``, default 48 h) and carry a timestamp and
error text, but after a known-bad relay session — or to force an immediate
re-probe — scrub them by hand:

    python tools/scrub_guard.py list                 # everything
    python tools/scrub_guard.py list 384             # filter by substring
    python tools/scrub_guard.py list --bad           # crashes/timeouts only
    python tools/scrub_guard.py scrub 384,384,384    # drop matching BAD records
    python tools/scrub_guard.py scrub --all-bad      # drop every bad record

``scrub`` only removes crash/timeout records (ok-records hold compile
times worth keeping); the next run re-probes the scrubbed variants under
the normal bounded-build budget.  VERDICT round-4 next #1.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pystencils_autodiff_tpu.ops.guard import (_bad_status, _cache_path,
                                               _is_stale, _load_registry,
                                               _save_registry)


def _fmt(entry) -> str:
    status, when = _bad_status(entry)
    if status is None:
        return f"ok ({entry}s)" if not isinstance(entry, dict) else "ok"
    age = ("untimestamped/legacy" if when is None
           else f"{(time.time() - when) / 3600:.1f}h ago")
    stale = " STALE->re-probes" if _is_stale(when) else ""
    err = entry.get("error", "") if isinstance(entry, dict) else ""
    return f"{status} ({age}{stale})" + (f" — {err[:100]}" if err else "")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = ap.add_subparsers(dest="cmd", required=True)
    p_list = sub.add_parser("list", help="print registry records")
    p_list.add_argument("pattern", nargs="?", default="",
                        help="substring filter on the signature")
    p_list.add_argument("--bad", action="store_true",
                        help="only crash/timeout records")
    p_scrub = sub.add_parser("scrub", help="remove bad records")
    p_scrub.add_argument("pattern", nargs="?", default=None,
                         help="substring the signature must contain")
    p_scrub.add_argument("--all-bad", action="store_true",
                         help="remove every crash/timeout record")
    args = ap.parse_args(argv)

    reg = _load_registry()
    print(f"# registry: {_cache_path()} ({len(reg)} records)",
          file=sys.stderr)

    if args.cmd == "list":
        for sig in sorted(reg):
            if args.pattern not in sig:
                continue
            if args.bad and _bad_status(reg[sig])[0] is None:
                continue
            print(f"{sig}\n    {_fmt(reg[sig])}")
        return 0

    if args.pattern is None and not args.all_bad:
        ap.error("scrub needs a pattern or --all-bad")
    dropped = []
    for sig in sorted(reg):
        if _bad_status(reg[sig])[0] is None:
            continue
        if args.all_bad or (args.pattern and args.pattern in sig):
            dropped.append(sig)
    for sig in dropped:
        print(f"scrubbed: {sig}\n    {_fmt(reg[sig])}")
        del reg[sig]
    if dropped:
        _save_registry(reg)
    print(f"# removed {len(dropped)} bad record(s)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
