"""Generate CATALOG_INDEX.md: the query -> module -> domain map.

Round 9 completed the round-8 verdict's item 2: the 30 round-named
plan modules are merged into domain modules (plans/stats.py, causal.py,
curation.py, dedup.py, ann.py + the pre-existing domain files), so the
module column now matches the domain column for most rows. The index
remains the one-stop query->module map; regenerate after any
registration change with

    python tools/catalog_index.py

The domain is derived from the query-name prefix (the catalog's naming
convention, stable since round 1), so the index needs no hand upkeep.
"""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DOMAINS = {
    "q": "tpch",
    "j": "joins",
    "a": "stats-aggregates",
    "w": "windows",
    "s": "set-ops",
    "st": "streaming",
    "ts": "timeseries",
    "t": "text-analysis",
    "d": "dedup",
    "e": "embeddings-ann",
    "b": "curation-experiments",
    "g": "graphs",
    "m": "multimodal",
    "p": "parity-pipeline",
    "f": "functions",
    "u": "udf-surface",
}


def domain_of(name: str) -> str:
    head = name.split("_", 1)[0].rstrip("0123456789")
    return DOMAINS.get(head, "other")


def main() -> None:
    from etl_data_peri_institute_spark.plans import catalog

    catalog.load_all()
    rows = []
    for name, qd in catalog.QUERIES.items():
        mod = qd.fn.__module__.rsplit(".", 1)[-1]
        doc = (qd.doc or "").strip().splitlines()
        rows.append(
            (
                domain_of(name),
                name,
                mod,
                "yes" if qd.oracle else "rows-only",
                (doc[0] if doc else "").rstrip(),
            )
        )
    rows.sort()
    by_domain = Counter(r[0] for r in rows)
    by_module = Counter(r[2] for r in rows)

    out = [
        "# Catalog index (GENERATED — python tools/catalog_index.py)",
        "",
        f"{len(rows)} registered gate queries; "
        f"{sum(1 for r in rows if r[3] == 'yes')} with DuckDB hash oracles.",
        "",
        "## Queries by domain",
        "",
        "| domain | queries |",
        "|---|---|",
    ]
    out += [f"| {d} | {n} |" for d, n in sorted(by_domain.items())]
    out += [
        "",
        "## Modules",
        "",
        "| module | queries |",
        "|---|---|",
    ]
    out += [f"| plans/{m}.py | {n} |" for m, n in sorted(by_module.items())]
    out += ["", "## Query -> module map", ""]
    cur = None
    for dom, name, mod, oracled, doc in rows:
        if dom != cur:
            out += [f"### {dom}", "", "| query | module | oracle | summary |", "|---|---|---|---|"]
            cur = dom
        out.append(f"| {name} | {mod} | {oracled} | {doc[:100]} |")
    out.append("")
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "CATALOG_INDEX.md")
    with open(path, "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote {path}: {len(rows)} queries, {len(by_module)} modules, {len(by_domain)} domains")


if __name__ == "__main__":
    main()
