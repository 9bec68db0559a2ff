"""One-shot consolidation of the round-named plan modules into domain
modules (round-8 verdict item 2).

Moves every top-level unit (function, constant, assert, bare
``query(...)(fn)`` registration) of ``plans/round*_ext.py`` into a
domain module chosen by the gate-query name it serves, carrying each
unit's source bytes VERBATIM (``ast.get_source_segment``), so the
post-move invariant "every query's source and oracle are byte-identical
modulo relative-import lines" is checkable mechanically.

Assignment rules:
- a @query-decorated function (or a bare ``query(name, ...)`` call)
  goes to ``DOMAIN_OF[name]`` (prefix default + explicit overrides);
- a helper/constant goes to the single domain that (transitively)
  references it; if several domains share it, it goes to the earliest
  target in ``TARGET_ORDER`` and the others import it from there;
- source modules are emitted in chronological (round) order inside each
  target, preserving in-module order, so every intra-file reference is
  defined before the decorators that evaluate it at import time.

Run with --dry-run to print the plan and collision check only.
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

# Existing domain modules that receive appended sections.
EXISTING_TARGETS = {
    "advanced", "behavioral", "functions_surface", "graphs",
    "quality_ext", "relational", "textops", "timeseries",
}
# Brand-new domain modules (docstrings below).
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
    # experimentation & causal inference
    "b_ab_lift_report": "causal", "b_ab_experiment_report": "causal",
    "b_ab_srm_check": "causal", "b_cuped_adjusted_ab": "causal",
    "b_power_analysis": "causal", "b_did_estimator": "causal",
    "b_stratified_ate": "causal", "b_sequential_mean_monitor": "causal",
    "b_bootstrap_ci": "causal", "b_holdout_leakage_check": "causal",
    "a_quantile_treatment_effect": "causal", "a_covariate_balance": "causal",
    "a_ratio_metric_delta_ci": "causal",
    # training-data curation / selection
    "b_token_budget_selection": "curation", "b_token_budget_production": "curation",
    "b_source_token_budget": "curation", "b_source_token_budget_production": "curation",
    "b_negative_sampling": "curation", "b_reservoir_per_group": "curation",
    "b_epoch_shuffle": "curation", "b_epoch_shuffle_production": "curation",
    "b_length_bucketing": "curation", "b_kfold_assign": "curation",
    "b_curriculum_schedule": "curation", "b_preference_pairs": "curation",
    "b_dedup_aware_mixture": "curation", "b_token_waterline": "curation",
    "b_frequency_capping": "curation",
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
        self.target = None  # decided later

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
        """Gate-query names this unit registers (decorator or bare call)."""
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
            # query("name", oracle=...)(fn)
            inner = node.value.func
            from_call(inner if isinstance(inner, ast.Call) else node.value)
        return out


def parse_module(name):
    path = os.path.join(PLANS, name + ".py")
    src = open(path).read()
    tree = ast.parse(src)
    units, imports, docstring = [], [], None
    for i, node in enumerate(tree.body):
        seg = ast.get_source_segment(src, node)
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
    return units, imports, docstring, src


def main(dry_run: bool) -> int:
    mod_units = {}
    mod_imports = {}
    mod_doc = {}
    for m in ROUND_MODULES:
        units, imports, doc, _ = parse_module(m)
        mod_units[m] = units
        mod_imports[m] = imports
        mod_doc[m] = doc

    # -- resolve import-bound names per module (for cross-module refs)
    import_binds = {}  # mod -> {name: ("module", stmt)}
    for m in ROUND_MODULES:
        binds = {}
        for imp in mod_imports[m]:
            if isinstance(imp, ast.ImportFrom):
                for a in imp.names:
                    binds[a.asname or a.name] = (imp.module or "", imp, a.name)
            else:
                for a in imp.names:
                    binds[a.asname or a.name] = (a.name, imp, a.name)
        import_binds[m] = binds

    # -- per-module name table
    name_table = {m: {} for m in ROUND_MODULES}  # mod -> name -> unit
    for m in ROUND_MODULES:
        for u in mod_units[m]:
            for d in u.defines:
                name_table[m][d] = u

    # -- seed targets: query units
    for m in ROUND_MODULES:
        for u in mod_units[m]:
            if u.qnames:
                doms = {domain_of(q) for q in u.qnames}
                if len(doms) > 1:
                    print(f"!! unit in {m} registers multi-domain {u.qnames}")
                u.target = sorted(doms, key=TARGET_ORDER.index)[0]

    # -- propagate: domain sets for helper units (transitive consumers)
    consumers = defaultdict(set)  # (mod, name) -> set of domains

    def walk_deps(m, u, dom, seen):
        for r in u.refs:
            tu = name_table[m].get(r)
            if tu is not None and tu is not u and id(tu) not in seen:
                seen.add(id(tu))
                consumers[(m, id(tu))].add(dom)
                walk_deps(m, tu, dom, seen)
            # cross-round import reference
            b = import_binds[m].get(r)
            if b and b[0].startswith("."):
                pass  # handled textually later

    for m in ROUND_MODULES:
        for u in mod_units[m]:
            if u.target:
                walk_deps(m, u, u.target, set())

    # cross-round imports: a unit in mod B importing name X from round
    # module A pins A's X-unit (and deps) to B-consumer domains too
    for m in ROUND_MODULES:
        for imp in mod_imports[m]:
            if isinstance(imp, ast.ImportFrom) and imp.level == 1 and imp.module in ROUND_MODULES:
                src_mod = imp.module
                for a in imp.names:
                    tu = name_table[src_mod].get(a.name)
                    if tu is None:
                        print(f"!! {m} imports {a.name} from {src_mod}: not found")
                        continue
                    # consumers: every domain that uses this name in m
                    doms = set()
                    for u in mod_units[m]:
                        if (a.asname or a.name) in u.refs and u.target:
                            doms.add(u.target)
                        elif (a.asname or a.name) in u.refs:
                            doms.add("?")
                    for d in doms:
                        if d != "?":
                            consumers[(src_mod, id(tu))].add(d)
                            walk_deps(src_mod, tu, d, set())

    # also: lazy function-level imports from round modules
    lazy_imports = []  # (mod, src_mod, name)
    for m in ROUND_MODULES:
        for u in mod_units[m]:
            for n in ast.walk(u.node):
                if isinstance(n, ast.ImportFrom) and n.level == 1 and n.module in ROUND_MODULES:
                    for a in n.names:
                        lazy_imports.append((m, u, n.module, a.name))
                        tu = name_table[n.module].get(a.name)
                        if tu is not None and u.target:
                            consumers[(n.module, id(tu))].add(u.target)
                            walk_deps(n.module, tu, u.target, set())

    # -- assign helper targets
    multi = []
    for m in ROUND_MODULES:
        for u in mod_units[m]:
            if u.target:
                continue
            doms = consumers.get((m, id(u)), set())
            if not doms:
                u.target = "UNREFERENCED"
                continue
            if len(doms) == 1:
                u.target = next(iter(doms))
            else:
                u.target = sorted(doms, key=TARGET_ORDER.index)[0]
                multi.append((m, sorted(u.defines), sorted(doms), u.target))

    # -- report
    print("== multi-domain helpers (home = first in TARGET_ORDER) ==")
    for m, names, doms, tgt in multi:
        print(f"  {m}: {names} used by {doms} -> {tgt}")
    print("\n== unreferenced units ==")
    for m in ROUND_MODULES:
        for u in mod_units[m]:
            if u.target == "UNREFERENCED":
                kind = type(u.node).__name__
                print(f"  {m}:{u.node.lineno} {kind} {sorted(u.defines) or u.src[:60]!r}")

    # -- collision check per target
    print("\n== collisions ==")
    existing_names = {}
    for t in EXISTING_TARGETS:
        tree = ast.parse(open(os.path.join(PLANS, t + ".py")).read())
        names = set()
        for node in tree.body:
            names |= Unit._defined_names(node)
        existing_names[t] = names
    bytarget = defaultdict(dict)  # target -> name -> (mod, src)
    ncoll = 0
    for m in ROUND_MODULES:
        for u in mod_units[m]:
            t = u.target
            for d in u.defines:
                if d in bytarget[t]:
                    om, osrc = bytarget[t][d]
                    same = osrc.strip() == u.src.strip()
                    print(f"  {t}: {d} defined in {om} AND {m} (identical={same})")
                    if not same:
                        ncoll += 1
                else:
                    bytarget[t][d] = (m, u.src)
            if t in existing_names:
                for d in u.defines & existing_names[t]:
                    print(f"  {t}: {d} collides with EXISTING module name")
                    ncoll += 1
    print(f"{ncoll} hard collisions")

    # -- target size estimate
    print("\n== target sizes (moved lines) ==")
    lines = defaultdict(int)
    nq = defaultdict(int)
    for m in ROUND_MODULES:
        for u in mod_units[m]:
            lines[u.target] += u.src.count("\n") + 1
            nq[u.target] += len(u.qnames)
    for t in sorted(lines, key=lambda x: -lines[x]):
        print(f"  {t}: +{lines[t]} lines, {nq[t]} queries")
    return ncoll


if __name__ == "__main__":
    sys.exit(1 if main("--dry-run" in sys.argv) else 0)
