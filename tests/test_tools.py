"""Strictness tests for the local gate replica (tools/oracle_check.py).

Round 2 lesson: the driver's correctness gate hashes full-precision
stringified values, while the local checker collapsed floats through
``%.6g`` — so q10's .005-boundary rounding difference passed locally and
failed the driver. These tests pin the local checker at driver
strictness: any float difference, down to 1 ulp, must fail the compare.
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from oracle_check import _norm_cell, _normalize  # noqa: E402


def test_third_decimal_perturbation_fails():
    # the exact q10 failure class: 123.455 vs 123.465 after a boundary flip
    assert _norm_cell(123.46) != _norm_cell(123.47)
    assert _norm_cell(1.234567891) != _norm_cell(1.234567892)


def test_one_ulp_difference_fails():
    x = 6842345.99
    y = math.nextafter(x, math.inf)
    assert x != y or True  # sanity: nextafter produced a distinct double
    assert _norm_cell(x) != _norm_cell(y)


def test_nan_is_not_null():
    assert _norm_cell(float("nan")) != _norm_cell(None)


def test_integer_valued_float_is_not_integer():
    # Spark double 2.0 vs DuckDB BIGINT 2 stringify differently in the
    # driver's pandas canonicalization; the replica must agree.
    assert _norm_cell(2.0) != _norm_cell(2)


def test_normalize_sorts_columns_and_rows():
    cols = ["b", "a"]
    rows = [(2, "y"), (1, "x")]
    sc, sr = _normalize(cols, rows)
    assert sc == ["a", "b"]
    assert sr == [("x", "1"), ("y", "2")]


def test_verify_first_names_resolve_and_are_unique():
    """_VERIFY_FIRST drives which queries get driver-verification rows
    (the artifact records only the first 50 registry entries). load_all
    silently skips unknown names, so a typo would silently deprioritize
    a query — pin that every listed name resolves and none repeats."""
    from etl_data_peri_institute_spark.plans import catalog

    catalog.load_all()
    missing = [n for n in catalog._VERIFY_FIRST if n not in catalog.QUERIES]
    assert missing == []
    assert len(set(catalog._VERIFY_FIRST)) == len(catalog._VERIFY_FIRST)
    # the 50-row window must be fully used (no wasted slots)
    assert len(catalog._VERIFY_FIRST) >= 50


def test_verify_first_names_all_registered():
    """A typo in _VERIFY_FIRST silently drops the name from the driver
    window (load_all filters to registered names) — every entry must
    resolve to a registered query."""
    from etl_data_peri_institute_spark.plans import catalog

    catalog.load_all()
    missing = [n for n in catalog._VERIFY_FIRST if n not in catalog.QUERIES]
    assert missing == [], missing


def test_catalog_index_in_sync():
    """CATALOG_INDEX.md is the generated query->module->domain map (the
    round-7 verdict's alternative to renaming 40 round-named modules).
    It must exist, list every registered query, and carry no stale
    names — i.e. someone reran tools/catalog_index.py after the last
    registration change."""
    import os
    import re

    from etl_data_peri_institute_spark.plans import catalog

    catalog.load_all()
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "CATALOG_INDEX.md")
    assert os.path.exists(path), "run python tools/catalog_index.py"
    text = open(path).read()
    indexed = set(
        re.findall(r"^\| ([a-z0-9_]+) \| \w+ \| (?:yes|rows-only) \|", text, re.M)
    )
    registered = set(catalog.QUERIES)
    assert registered - indexed == set(), f"missing from index: {sorted(registered - indexed)[:5]} — rerun tools/catalog_index.py"
    assert indexed - registered == set(), f"stale in index: {sorted(indexed - registered)[:5]} — rerun tools/catalog_index.py"
