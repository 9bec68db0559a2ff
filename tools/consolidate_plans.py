"""One-shot consolidation of the round-named plan modules into domain
modules (round-8 verdict item 2: "merge the 30 round-named plan modules
into domain modules; keep names stable").

Moves every top-level unit (function, constant, assert, bare
``query(...)(fn)`` registration) of ``plans/round*_ext.py`` into a
domain module chosen by the gate-query name it serves, carrying each
unit's source bytes VERBATIM (``ast.get_source_segment``), so the
post-move invariant "every query's source and oracle are byte-identical
modulo relative-import lines" is checkable mechanically
(tools/consolidate_check.py snapshots before/after).

Assignment rules:
- a @query-decorated function (or a bare ``query(name, ...)`` call)
  goes to ``DOMAIN_OF[name]`` (prefix default + explicit overrides);
- a helper/constant goes to the single domain that (transitively)
  references it; a multi-domain helper goes to its HELPER_HOME (all
  seven current ones are corpus/dedup helpers -> dedup) and consumers
  import it;
- source modules are emitted in chronological (round) order inside each
  target, preserving in-module order, so every intra-file reference is
  defined before the decorators that evaluate it at import time;
- per-(module, target) section imports are FILTERED to the names that
  section actually references, so no spurious cross-domain import edges
  (cycle check enforced).

Run with --dry-run to print the plan and collision check only; --apply
to write the domain modules and delete the round modules.
"""

from __future__ import annotations

import ast
import os
import re
import sys
from collections import defaultdict

PLANS = os.path.join(os.path.dirname(__file__), "..", "etl_data_peri_institute_spark", "plans")
PLANS = os.path.abspath(PLANS)

ROUND_MODULES = [
    "round4_ext", "round4b_ext",
    "round6_ext", "round6b_ext", "round6c_ext", "round6d_ext",
    "round6e_ext", "round6f_ext", "round6g_ext", "round6h_ext",
    "round6i_ext", "round6j_ext", "round6k_ext", "round6l_ext",
    "round6m_ext", "round6n_ext",
    "round7_ext", "round7b_ext", "round7c_ext", "round7d_ext",
    "round7e_ext", "round7f_ext", "round7g_ext", "round7h_ext",
    "round7i_ext", "round7j_ext",
    "round8_ext", "round8b_ext",
]

EXISTING_TARGETS = {
    "advanced", "behavioral", "functions_surface", "graphs",
    "quality_ext", "relational", "textops", "timeseries",
}
NEW_TARGETS = ["stats", "causal", "curation", "dedup", "ann"]

TARGET_ORDER = [
    "stats", "causal", "curation", "dedup", "ann", "textops",
    "timeseries", "graphs", "quality_ext", "relational",
    "functions_surface", "advanced", "behavioral",
]

PREFIX_DEFAULT = {
    "a_": "stats", "b_": "behavioral", "d_": "dedup", "e_": "ann",
    "t_": "textops", "ts_": "timeseries", "g_": "graphs",
    "j_": "relational", "p_": "quality_ext", "f_": "functions_surface",
    "m_": "advanced", "q": "relational",
}
OVERRIDES = {
    "b_ab_lift_report": "causal", "b_ab_experiment_report": "causal",
    "b_ab_srm_check": "causal", "b_cuped_adjusted_ab": "causal",
    "b_power_analysis": "causal", "b_did_estimator": "causal",
    "b_stratified_ate": "causal", "b_sequential_mean_monitor": "causal",
    "b_bootstrap_ci": "causal", "b_holdout_leakage_check": "causal",
    "a_quantile_treatment_effect": "causal", "a_covariate_balance": "causal",
    "a_ratio_metric_delta_ci": "causal",
    "b_token_budget_selection": "curation", "b_token_budget_production": "curation",
    "b_source_token_budget": "curation", "b_source_token_budget_production": "curation",
    "b_negative_sampling": "curation", "b_reservoir_per_group": "curation",
    "b_epoch_shuffle": "curation", "b_epoch_shuffle_production": "curation",
    "b_length_bucketing": "curation", "b_kfold_assign": "curation",
    "b_curriculum_schedule": "curation", "b_preference_pairs": "curation",
    "b_dedup_aware_mixture": "curation", "b_token_waterline": "curation",
    "b_frequency_capping": "curation",
}
# multi-domain helpers: all are augmented-corpus / contamination-corpus
# builders -> they live with the dedup gates and consumers import them
HELPER_HOME = {
    "_AUG_SQL": "dedup", "_AUG_SHINGLES": "dedup", "_augmented_corpus": "dedup",
    "_hex2_digit_sql": "dedup", "_EVAL_MOD": "dedup",
    "_CONTAM_MIN_RATIO": "dedup", "_DUCK_CONTAM": "dedup",
}

NEW_DOCSTRINGS = {
    "stats": '''"""Statistical aggregate gates: distribution shape, drift, rank and
trend statistics, multiple-testing control, survival — every entry a
single declarative aggregation pipeline with a DuckDB hash oracle.

Consolidated from the round-4..8 extension modules (round-9 layout
cleanup); each section below cites its source round. The oracle-side
discipline (identical round(), BIGINT casts, deterministic tiebreaks)
is described in catalog.py.
"""''',
    "causal": '''"""Experimentation & causal-inference gates: A/B lift and guardrails
(SRM, CUPED, power, sequential monitoring), difference-in-differences,
stratified ATE, quantile treatment effects, covariate balance — the
measurement layer a training-data pipeline runs over event logs.

Consolidated from the round-4..8 extension modules (round-9 layout
cleanup); each section cites its source round.
"""''',
    "curation": '''"""Training-data curation gates: token-budget selection, source
mixtures, epoch shuffling, k-fold assignment, curriculum schedules,
preference pairs, sampling — the selection layer between a deduped
corpus and a training run. All distributed shapes (range-exchange
cumsum, salted sampling); production twins registered under the SAME
oracle as their semantic pins.

Consolidated from the round-4..8 extension modules (round-9 layout
cleanup); each section cites its source round.
"""''',
    "dedup": '''"""Deduplication gates beyond the catalog's foundational exact/MinHash
entries: decontamination, SemDeDup, span/segment/CDC dedup, bloom
pre-filters, band sweeps, soft weights, incremental (batch-vs-corpus)
near-dup for both text and embeddings — plus the shared augmented-corpus
builders their oracles use.

Consolidated from the round-4..8 extension modules (round-9 layout
cleanup); each section cites its source round.
"""''',
    "ann": '''"""ANN / embedding-index gates: IVF (fit, assign, balance, staleness,
nprobe sweeps), PQ/SQ/binary compression ladders and their recall
matrices, centroid and quality reports, MMR rerank, range search — the
vector-index layer over the embeddings table, all JVM-side
zip_with/aggregate math.

Consolidated from the round-4..8 extension modules (round-9 layout
cleanup); each section cites its source round.
"""''',
}


def domain_of(qname: str) -> str:
    if qname in OVERRIDES:
        return OVERRIDES[qname]
    for pfx in sorted(PREFIX_DEFAULT, key=len, reverse=True):
        if qname.startswith(pfx):
            return PREFIX_DEFAULT[pfx]
    raise ValueError(f"no domain for query {qname!r}")


class Unit:
    def __init__(self, mod, node, src):
        self.mod = mod
        self.node = node
        self.src = src
        self.defines = self._defined_names(node)
        self.refs = self._referenced_names(node)
        self.qnames = self._query_names(node)
        self.target = None

    @staticmethod
    def _defined_names(node):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            return {node.name}
        if isinstance(node, ast.Assign):
            out = set()
            for t in node.targets:
                for n in ast.walk(t):
                    if isinstance(n, ast.Name):
                        out.add(n.id)
            return out
        if isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            return {node.target.id}
        return set()

    @staticmethod
    def _referenced_names(node):
        return {n.id for n in ast.walk(node) if isinstance(n, ast.Name)}

    @staticmethod
    def _query_names(node):
        out = []

        def from_call(call):
            if (
                isinstance(call, ast.Call)
                and isinstance(call.func, ast.Name)
                and call.func.id == "query"
                and call.args
                and isinstance(call.args[0], ast.Constant)
            ):
                out.append(call.args[0].value)

        if isinstance(node, ast.FunctionDef):
            for dec in node.decorator_list:
                from_call(dec)
        if isinstance(node, ast.Expr) and isinstance(node.value, ast.Call):
            inner = node.value.func
            from_call(inner if isinstance(inner, ast.Call) else node.value)
        return out


def _segment(srclines, node):
    """Source of a top-level node INCLUDING decorators
    (ast.get_source_segment starts at the `def` line and silently drops
    the @query decorator — the bug the first apply hit)."""
    start = node.lineno
    for dec in getattr(node, "decorator_list", []) or []:
        start = min(start, dec.lineno)
    return "\n".join(srclines[start - 1 : node.end_lineno])


def parse_module(name):
    path = os.path.join(PLANS, name + ".py")
    src = open(path).read()
    srclines = src.splitlines()
    tree = ast.parse(src)
    units, imports, docstring = [], [], None
    for i, node in enumerate(tree.body):
        seg = _segment(srclines, node)
        if (
            i == 0
            and isinstance(node, ast.Expr)
            and isinstance(node.value, ast.Constant)
            and isinstance(node.value.value, str)
        ):
            docstring = node.value.value
            continue
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            imports.append(node)
            continue
        units.append(Unit(name, node, seg))
    return units, imports, docstring


def build():
    mod_units, mod_imports, mod_doc = {}, {}, {}
    for m in ROUND_MODULES:
        mod_units[m], mod_imports[m], mod_doc[m] = parse_module(m)

    name_table = {m: {u2: u for u in mod_units[m] for u2 in u.defines} for m in ROUND_MODULES}

    # seed query-unit targets
    for m in ROUND_MODULES:
        for u in mod_units[m]:
            if u.qnames:
                doms = {domain_of(q) for q in u.qnames}
                assert len(doms) == 1, (m, u.qnames)
                u.target = doms.pop()

    consumers = defaultdict(set)

    def walk_deps(m, u, dom, seen):
        for r in u.refs:
            tu = name_table[m].get(r)
            if tu is not None and tu is not u and id(tu) not in seen:
                seen.add(id(tu))
                consumers[(m, id(tu))].add(dom)
                walk_deps(m, tu, dom, seen)

    for m in ROUND_MODULES:
        for u in mod_units[m]:
            if u.target:
                walk_deps(m, u, u.target, set())

    # cross-round top-level imports pin source units to consumer domains
    for m in ROUND_MODULES:
        for imp in mod_imports[m]:
            if isinstance(imp, ast.ImportFrom) and imp.level == 1 and imp.module in ROUND_MODULES:
                for a in imp.names:
                    tu = name_table[imp.module].get(a.name)
                    assert tu is not None, (m, a.name)
                    for u in mod_units[m]:
                        if (a.asname or a.name) in u.refs and u.target:
                            consumers[(imp.module, id(tu))].add(u.target)
                            walk_deps(imp.module, tu, u.target, set())

    # lazy in-function round imports
    for m in ROUND_MODULES:
        for u in mod_units[m]:
            for n in ast.walk(u.node):
                if isinstance(n, ast.ImportFrom) and n.level == 1 and n.module in ROUND_MODULES:
                    for a in n.names:
                        tu = name_table[n.module].get(a.name)
                        if tu is not None and u.target:
                            consumers[(n.module, id(tu))].add(u.target)
                            walk_deps(n.module, tu, u.target, set())

    # assign helper targets
    for m in ROUND_MODULES:
        majority = defaultdict(int)
        for u in mod_units[m]:
            if u.target:
                majority[u.target] += 1
        maj = max(majority, key=lambda t: majority[t]) if majority else "stats"
        for u in mod_units[m]:
            if u.target:
                continue
            doms = consumers.get((m, id(u)), set())
            home = None
            for d in u.defines:
                if d in HELPER_HOME:
                    home = HELPER_HOME[d]
            if home:
                u.target = home
            elif len(doms) == 1:
                u.target = next(iter(doms))
            elif len(doms) > 1:
                raise SystemExit(f"multi-domain helper without HELPER_HOME: {m} {u.defines}")
            elif u.defines:
                u.target = maj  # unreferenced documentation constant
            else:
                # non-defining unit (assert / plain Expr): follow the
                # unit defining the first module-local name it references
                tgt = None
                for r in sorted(u.refs):
                    tu = name_table[m].get(r)
                    if tu is not None and tu.target:
                        tgt = tu.target
                        break
                u.target = tgt or maj

    # global name -> (home module) map for import rewriting
    name_home = {}
    for m in ROUND_MODULES:
        for u in mod_units[m]:
            for d in u.defines:
                name_home.setdefault((m, d), u.target)
    return mod_units, mod_imports, mod_doc, name_home


def _import_lines_for(section_units, imports, mod, name_home, target, mod_units):
    """Imports a (module, target) section needs, filtered to referenced
    names; round-module imports rewritten to the names' new homes."""
    needed = set()
    for u in section_units:
        needed |= u.refs
    # names defined by ANY unit of this module that landed in this target
    local_here = set()
    for u in mod_units[mod]:
        if u.target == target:
            local_here |= u.defines
    lines = []
    cross = defaultdict(set)  # target module -> names
    for imp in imports:
        if isinstance(imp, ast.ImportFrom):
            if imp.module == "__future__":
                continue
            if imp.level == 1 and imp.module in ROUND_MODULES:
                for a in imp.names:
                    bind = a.asname or a.name
                    if bind not in needed:
                        continue
                    assert a.asname is None, "aliased round import unsupported"
                    home = name_home[(imp.module, a.name)]
                    if home != target:
                        cross[home].add(a.name)
                continue
            if imp.level == 1 and imp.module == target:
                continue  # landing inside the module it imported from
            keep = [a for a in imp.names if (a.asname or a.name) in needed]
            if not keep:
                continue
            names = ", ".join(a.name + (f" as {a.asname}" if a.asname else "") for a in keep)
            lines.append(f"from {'.' * imp.level}{imp.module or ''} import {names}")
        else:
            keep = [a for a in imp.names if (a.asname or a.name.split('.')[0]) in needed]
            if keep:
                names = ", ".join(a.name + (f" as {a.asname}" if a.asname else "") for a in keep)
                lines.append(f"import {names}")
    # same-module names that landed in other targets
    for u in section_units:
        for r in u.refs:
            home = name_home.get((mod, r))
            if home and home != target and r not in local_here:
                cross[home].add(r)
    for hm in sorted(cross):
        names = ", ".join(sorted(cross[hm]))
        lines.append(f"from .{hm} import {names}")
    return lines


def rewrite_lazy_imports(src, mod, name_home):
    """Rewrite in-function `from .roundX_ext import NAME` lines."""
    def repl(match):
        indent, srcmod, names = match.group(1), match.group(2), match.group(3)
        parts = [n.strip() for n in names.split(",")]
        by_home = defaultdict(list)
        for n in parts:
            by_home[name_home[(srcmod, n)]].append(n)
        return "\n".join(
            f"{indent}from .{hm} import {', '.join(ns)}" for hm, ns in sorted(by_home.items())
        )

    return re.sub(
        r"^(\s*)from \.(round\w+) import ([\w, ]+)$", repl, src, flags=re.M
    )


def main():
    apply = "--apply" in sys.argv
    mod_units, mod_imports, mod_doc, name_home = build()

    # group: target -> list of (mod, [units])
    sections = defaultdict(list)
    for m in ROUND_MODULES:
        by_t = defaultdict(list)
        for u in mod_units[m]:
            by_t[u.target].append(u)
        for t, us in by_t.items():
            sections[t].append((m, us))

    # majority target per module (gets the full docstring comment)
    main_target = {}
    for m in ROUND_MODULES:
        counts = defaultdict(int)
        for u in mod_units[m]:
            counts[u.target] += len(u.src)
        main_target[m] = max(counts, key=lambda t: counts[t])

    emitted_names = defaultdict(dict)  # target -> name -> src (dup detection)
    out_chunks = defaultdict(list)     # target -> text chunks
    seen_import_lines = defaultdict(set)

    # pre-load existing import lines of existing targets so we don't
    # duplicate them in appended sections
    for t in EXISTING_TARGETS:
        src = open(os.path.join(PLANS, t + ".py")).read()
        for node in ast.parse(src).body:
            if isinstance(node, (ast.Import, ast.ImportFrom)):
                seen_import_lines[t].add(ast.get_source_segment(src, node))

    import_edges = defaultdict(set)
    for t in TARGET_ORDER:
        for m, us in sections[t]:
            hdr = [
                "# " + "=" * 75,
                f"# section consolidated from plans/{m}.py (round-9 layout cleanup;",
                f"#   original registrations and docstrings preserved verbatim)",
            ]
            if main_target[m] == t and mod_doc[m]:
                hdr.append("#")
                for line in mod_doc[m].strip().splitlines():
                    hdr.append(("# " + line).rstrip())
            else:
                hdr.append(f"#   (module docstring carried in plans/{main_target[m]}.py)")
            hdr.append("# " + "=" * 75)
            body = []
            ilines = _import_lines_for(us, mod_imports[m], m, name_home, t, mod_units)
            for il in ilines:
                mm = re.match(r"from \.(\w+) import", il)
                if mm:
                    import_edges[t].add(mm.group(1))
                if il not in seen_import_lines[t]:
                    seen_import_lines[t].add(il)
                    body.append(il)
            if body:
                body.append("")
            for u in us:
                dup = False
                for d in u.defines:
                    prior = emitted_names[t].get(d)
                    if prior is not None:
                        # trailing comments may differ on otherwise
                        # identical constant pins (_PQ_SUBDIM)
                        strip = lambda x: re.sub(r"\s*#.*$", "", x, flags=re.M).strip()
                        assert strip(prior) == strip(u.src), f"collision {t}.{d}"
                        dup = True
                if dup:
                    continue
                for d in u.defines:
                    emitted_names[t][d] = u.src
                body.append(rewrite_lazy_imports(u.src, m, name_home))
                body.append("")
            out_chunks[t].append("\n".join(hdr) + "\n\n" + "\n".join(body).rstrip() + "\n")

    # cycle check over new cross-imports among targets
    def reach(a, seen):
        for b in import_edges.get(a, ()):  # noqa: B007
            if b in seen:
                continue
            seen.add(b)
            reach(b, seen)
        return seen

    for t in list(import_edges):
        if t in reach(t, set()):
            raise SystemExit(f"import cycle through {t}: {import_edges}")
    print("import edges:", {k: sorted(v) for k, v in import_edges.items()})

    if not apply:
        for t in TARGET_ORDER:
            n = sum(len(us) for _, us in sections[t])
            print(f"{t}: {n} units, {sum(c.count(chr(10)) for c in out_chunks[t])} lines")
        print("dry run only (pass --apply)")
        return

    for t in TARGET_ORDER:
        if not out_chunks[t]:
            continue
        path = os.path.join(PLANS, t + ".py")
        if t in EXISTING_TARGETS:
            with open(path, "a") as fh:
                fh.write("\n\n" + "\n\n".join(out_chunks[t]))
        else:
            with open(path, "w") as fh:
                fh.write(NEW_DOCSTRINGS[t] + "\n\nfrom __future__ import annotations\n\n")
                fh.write("\n\n".join(out_chunks[t]))
    for m in ROUND_MODULES:
        os.remove(os.path.join(PLANS, m + ".py"))
    # rewrite catalog.load_all import list
    cat = os.path.join(PLANS, "catalog.py")
    src = open(cat).read()
    src = re.sub(r"\n        round\w+,", "", src)
    src = src.replace(
        "    from . import (  # noqa: F401\n        advanced,",
        "    from . import (  # noqa: F401\n        advanced,\n        ann,\n        causal,\n        curation,\n        dedup,\n        stats,",
    )
    open(cat, "w").write(src)
    print("applied")


if __name__ == "__main__":
    main()
