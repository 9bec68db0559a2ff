"""Snapshot/compare the catalog for the plan-module consolidation:
for every registered query, hash (a) its implementation source with
relative-import lines masked (those legitimately change when code moves
between modules) and (b) its oracle SQL byte-exactly. Usage:

    python tools/consolidate_check.py snap before.json
    ... consolidation ...
    python tools/consolidate_check.py snap after.json
    python tools/consolidate_check.py diff before.json after.json
"""

from __future__ import annotations

import hashlib
import inspect
import json
import re
import sys

sys.path.insert(0, ".")


def snapshot() -> dict:
    from etl_data_peri_institute_spark.plans import catalog

    catalog.load_all()
    out = {}
    for n, q in catalog.QUERIES.items():
        src = inspect.getsource(q.fn)
        # mask single-dot relative imports INCLUDING multi-line
        # parenthesized forms (a non-greedy ^..$ under re.M only masked
        # the first line, flagging clean moves as CHANGED)
        masked = re.sub(
            r"^\s*from \.\w+ import (?:\([^)]*\)|[\w, ]*)$",
            "<REL_IMPORT>",
            src,
            flags=re.M,
        )
        out[n] = {
            "src": hashlib.sha256(masked.encode()).hexdigest(),
            "oracle": hashlib.sha256((q.oracle or "").encode()).hexdigest(),
        }
    return out


def main():
    cmd = sys.argv[1]
    if cmd == "snap":
        snap = snapshot()
        json.dump(snap, open(sys.argv[2], "w"), indent=0, sort_keys=True)
        print(f"wrote {len(snap)} entries")
    elif cmd == "diff":
        a = json.load(open(sys.argv[2]))
        b = json.load(open(sys.argv[3]))
        bad = 0
        for n in sorted(set(a) | set(b)):
            if n not in a:
                print(f"ADDED {n}")
                bad += 1
            elif n not in b:
                print(f"REMOVED {n}")
                bad += 1
            else:
                for k in ("src", "oracle"):
                    if a[n][k] != b[n][k]:
                        print(f"CHANGED {n}.{k}")
                        bad += 1
        print(f"{bad} differences over {len(a)} queries")
        sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
