"""Query catalog: the driver-facing registry of implemented operators.

Every operator claimed as done in SURVEY.md §2 (and every north-star
extension) registers here with:

- a Spark implementation ``(spark, sf_dir) -> DataFrame`` (DataFrame API
  or Spark SQL — Catalyst produces the same plan either way), and
- usually a DuckDB-runnable ANSI-SQL oracle string over the same parquet
  tables (``oracle=None`` for genuinely non-SQL-expressible operators —
  the driver then records a weaker rows-only check).

Output discipline (so the driver's order-insensitive value-hash compare
is stable across engines):

- every computed column is aliased identically in Spark and SQL;
- double-valued aggregates are ``round(...)``-ed the same way on both
  sides (sum order differs between engines by ~1 ulp; rounding absorbs it);
- integer-valued sums are cast to BIGINT on both sides (DuckDB's
  ``sum(int)`` is HUGEINT otherwise);
- top-k queries always carry a deterministic tiebreak key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


QUERIES: dict[str, QueryDef] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query implementation (decorator)."""

    def wrap(fn: QueryFn) -> QueryFn:
        QUERIES[name] = QueryDef(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return wrap


def load_all() -> None:
    """Import every plan module so their @query registrations run."""
    from . import (  # noqa: F401
        advanced,
        behavioral,
        functions_surface,
        llmdata,
        parity,
        relational,
        streaming_batch,
        textops,
        tpch,
    )
