"""PySpark-native analytics/ETL engine.

A from-scratch, idiomatic-Spark engine with the query and data-processing
capabilities of the reference pandas ETL (``proyectosperi/etl-data-peri-institute``,
surveyed in SURVEY.md), extended with the full relational operator surface
(joins, aggregations, window functions, set ops, sorts) and LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing),
all designed for a multi-executor cluster at 100 TB scale:

- declarative DataFrame/SQL plans (Catalyst optimizes: pushdown, pruning,
  join selection, AQE),
- broadcast joins for dimension tables, shuffle-on-key only where semantics
  require it,
- zero row-at-a-time Python UDFs in hot paths (built-in column expressions;
  Arrow-batched pandas UDFs as the documented escape hatch).
"""

__version__ = "0.1.0"
