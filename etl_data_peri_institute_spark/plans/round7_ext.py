"""Round-7 continuation operators, batch 1: privacy scrubbing and
split hygiene for LLM training corpora.

- t_pii_scrub_report — per-source PII / blocklist exposure audit
- t_pii_scrub_apply  — deterministic redaction (regex + term blocklist)
- t_repetition_ratio — within-document duplicate-bigram fraction
- b_kfold_assign     — deterministic hash k-fold with per-fold stats

All JVM-side (built-in regex / higher-order functions / hash
arithmetic — zero Python in any hot path), each with a DuckDB oracle.
Regex patterns are written in the Java∩RE2 common dialect so both
engines compile them identically; redaction uses DuckDB's 'g' flag to
match Spark's replace-all semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import query

# Patterns shared by report + apply. Kept in the Java/RE2 common
# subset: character classes, bounded repeats, \b word boundaries.
_SCRUB_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_LONGNUM_RE = r"\b\d{6,}\b"
# Term blocklist (the entity/brand-name scrub of a real pipeline; terms
# chosen to actually occur in the synthetic corpus so the report and
# the redaction hash carry non-trivial signal).
_BLOCKLIST = ("customer", "spark")
_BLOCK_RE = r"\b(" + "|".join(_BLOCKLIST) + r")\b"
_BLOCK_SQL_LIST = ", ".join(f"'{t}'" for t in _BLOCKLIST)


@query(
    "t_pii_scrub_report",
    oracle=f"""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(regexp_extract_all(text, '{_SCRUB_EMAIL_RE}'))) AS BIGINT)
             AS email_hits,
           CAST(sum(len(regexp_extract_all(text, '{_IPV4_RE}'))) AS BIGINT)
             AS ipv4_hits,
           CAST(sum(len(regexp_extract_all(text, '{_LONGNUM_RE}'))) AS BIGINT)
             AS longnum_hits,
           CAST(sum(len(list_filter(string_split(text, ' '),
                                    w -> w IN ({_BLOCK_SQL_LIST})))) AS BIGINT)
             AS blocklist_hits,
           CAST(sum(CASE WHEN len(list_filter(string_split(text, ' '),
                                   w -> w IN ({_BLOCK_SQL_LIST}))) > 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_blockterm,
           round(avg(CASE WHEN len(list_filter(string_split(text, ' '),
                                    w -> w IN ({_BLOCK_SQL_LIST}))) > 0
                          THEN 1.0 ELSE 0.0 END), 4) AS blockterm_doc_rate
    FROM documents GROUP BY source ORDER BY source
    """,
)
def t_pii_scrub_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII / blocklist exposure audit — the pre-redaction
    report every training-data release runs: occurrence counts for
    email / IPv4 / long-number regex detectors plus a term blocklist,
    and the fraction of documents carrying at least one blocked term.
    (On this synthetic corpus the regex detectors legitimately report
    zero — the report proves the NEGATIVE too; the blocklist terms
    occur and give the oracle non-trivial values. t_pii_detect
    (plans/round4_ext.py) is the per-DOCUMENT twin that injects fake
    PII to exercise the regex hits; this is the corpus-level audit a
    release manager reads, plus the term-blocklist category that
    detector lacks.)

    Scale shape: one corpus scan, all detectors evaluated per-row
    inside whole-stage codegen (regexp_count + a higher-order filter on
    the token array), one map-side-combined groupBy(source) — no
    shuffle wider than the per-source partial rows, no UDFs. Detector
    count grows the projection, never the shuffle.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    block_hits = F.size(
        F.filter(toks, lambda w: w.isin(*_BLOCKLIST))
    )
    per_doc = docs.select(
        "source",
        F.regexp_count("text", F.lit(_SCRUB_EMAIL_RE)).alias("e"),
        F.regexp_count("text", F.lit(_IPV4_RE)).alias("i"),
        F.regexp_count("text", F.lit(_LONGNUM_RE)).alias("n"),
        block_hits.alias("b"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("e").cast("long").alias("email_hits"),
            F.sum("i").cast("long").alias("ipv4_hits"),
            F.sum("n").cast("long").alias("longnum_hits"),
            F.sum("b").cast("long").alias("blocklist_hits"),
            F.sum((F.col("b") > 0).cast("int")).cast("long").alias(
                "docs_with_blockterm"
            ),
            F.round(F.avg((F.col("b") > 0).cast("double")), 4).alias(
                "blockterm_doc_rate"
            ),
        )
        .orderBy("source")
    )


@query(
    "t_pii_scrub_apply",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_SCRUB_EMAIL_RE}'))
                + len(regexp_extract_all(text, '{_IPV4_RE}'))
                + len(regexp_extract_all(text, '{_BLOCK_RE}')) AS BIGINT)
             AS n_redactions,
           md5(regexp_replace(regexp_replace(regexp_replace(
                 text, '{_SCRUB_EMAIL_RE}', '<EMAIL>', 'g'),
                 '{_IPV4_RE}', '<IP>', 'g'),
                 '{_BLOCK_RE}', '<TERM>', 'g')) AS scrub_hash,
           CAST(strlen(regexp_replace(regexp_replace(regexp_replace(
                 text, '{_SCRUB_EMAIL_RE}', '<EMAIL>', 'g'),
                 '{_IPV4_RE}', '<IP>', 'g'),
                 '{_BLOCK_RE}', '<TERM>', 'g')) AS BIGINT) AS scrub_len
    FROM documents ORDER BY doc_id
    """,
)
def t_pii_scrub_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redaction APPLY: emails → <EMAIL>, IPv4 → <IP>, blocklist terms
    → <TERM> (replace-all on both engines; DuckDB needs the explicit
    'g' flag to match Spark's regexp_replace semantics). The gate
    output hashes the scrubbed text (md5 over identical utf-8 bytes on
    both engines) so the driver compare certifies the REDACTED BYTES,
    not just the counts.

    Scale shape: pure per-row JVM regex inside codegen — embarrassingly
    parallel, no shuffle at all before the gate's presentation orderBy.
    On a 100 TB corpus this is a map-only rewrite whose cost is one
    read + one write.
    """
    docs = load_table(spark, sf_dir, "documents")
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _SCRUB_EMAIL_RE, "<EMAIL>"),
            _IPV4_RE,
            "<IP>",
        ),
        _BLOCK_RE,
        "<TERM>",
    )
    n_red = (
        F.regexp_count("text", F.lit(_SCRUB_EMAIL_RE))
        + F.regexp_count("text", F.lit(_IPV4_RE))
        + F.regexp_count("text", F.lit(_BLOCK_RE))
    )
    return docs.select(
        "doc_id",
        n_red.cast("long").alias("n_redactions"),
        F.md5(F.encode(scrubbed, "UTF-8")).alias("scrub_hash"),
        F.octet_length(F.encode(scrubbed, "UTF-8")).cast("long").alias(
            "scrub_len"
        ),
    ).orderBy("doc_id")


@query(
    "t_repetition_ratio",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, string_split(text, ' ') AS s FROM documents
    ),
    bigrams AS (
      SELECT doc_id, source, s[i] || ' ' || s[i + 1] AS bg
      FROM toks, UNNEST(range(1, len(s))) AS t(i)
    ),
    per_doc AS (
      SELECT doc_id, source,
             count(*) AS n_bg,
             count(DISTINCT bg) AS n_distinct
      FROM bigrams GROUP BY doc_id, source
    ),
    frac AS (
      SELECT source,
             1.0 - n_distinct * 1.0 / n_bg AS dup_frac
      FROM per_doc WHERE n_bg > 0
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(dup_frac), 4) AS avg_dup_frac,
           round(max(dup_frac), 4) AS max_dup_frac,
           CAST(sum(CASE WHEN dup_frac > 0.5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs_over_half
    FROM frac GROUP BY source ORDER BY source
    """,
)
def t_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition filter statistic (the duplicate-n-gram
    family of quality filters, e.g. the Gopher/MassiveText rules):
    duplicate-bigram fraction = 1 − distinct/total bigrams per doc,
    aggregated per source with the heavy-tail markers a filter
    threshold needs (max, #docs over 0.5). High repetition flags
    boilerplate, keyword stuffing, and degenerate generations.

    Scale shape: bigrams via one posexplode + a per-doc window-free
    self-pairing (slide the token array with higher-order transform —
    no join, no window); the per-doc distinct count is a (doc_id, bg)
    groupBy that AQE coalesces, then one map-side-combined
    groupBy(source). Everything partitions on doc_id — no skew (docs
    are bounded length; a 100 TB corpus is many docs, not long ones).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    # bigram list per doc via array slide: zip tokens with their tails —
    # transform over indices avoids any explode-join or window
    bigrams = F.expr(
        "transform(slice(split(text, ' '), 1, size(split(text, ' ')) - 1),"
        " (w, i) -> concat(w, ' ', element_at(split(text, ' '), i + 2)))"
    )
    per_doc = (
        docs.select("doc_id", "source", F.explode(bigrams).alias("bg"))
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").alias("n_bg"),
            F.countDistinct("bg").alias("n_distinct"),
        )
        .where(F.col("n_bg") > 0)
        .select(
            "source",
            (1.0 - F.col("n_distinct") / F.col("n_bg")).alias("dup_frac"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(F.avg("dup_frac"), 4).alias("avg_dup_frac"),
            F.round(F.max("dup_frac"), 4).alias("max_dup_frac"),
            F.sum((F.col("dup_frac") > 0.5).cast("int")).cast("long").alias(
                "n_docs_over_half"
            ),
        )
        .orderBy("source")
    )


_KFOLDS = 5


@query(
    "b_kfold_assign",
    oracle=f"""
    WITH assigned AS (
      SELECT doc_id, source,
             len(string_split(text, ' ')) AS n_tokens,
             (instr('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1)
               % {_KFOLDS} AS fold
      FROM documents
    )
    SELECT fold,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           round(count(*) * 1.0 /
                 (SELECT count(*) FROM documents), 4) AS doc_share
    FROM assigned GROUP BY fold ORDER BY fold
    """,
)
def b_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash k-fold assignment (k=5) with per-fold balance
    stats — the split primitive under cross-validation and ablation
    sweeps. Fold = first md5 nibble of the doc key mod k: stable across
    engines, runs, and cluster sizes (no RNG state, no sampling
    order-dependence), so every downstream job re-derives the identical
    split from the key alone — the property that makes folds safe to
    recompute on 1000 executors instead of materializing an assignment
    table. Balance columns (doc share, token mass, source spread) are
    the audit that hash folds are size- and mixture-balanced.

    Scale shape: one scan, fold computed in codegen, one
    map-side-combined groupBy(fold) → k rows; the grand-total share
    divides by a scalar subquery both engines fold to a literal.
    """
    docs = load_table(spark, sf_dir, "documents")
    # same portable nibble-hash as b_hash_sample: first md5 hex digit
    # looked up in the hex alphabet, mod k (identical on both engines)
    fold = (
        F.expr("locate(substr(md5(cast(doc_id as string)), 1, 1), '0123456789abcdef') - 1")
        % _KFOLDS
    )
    assigned = docs.select(
        fold.alias("fold"),
        "source",
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    total = docs.count()  # parquet metadata count, one footer read
    return (
        assigned.groupBy("fold")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.countDistinct("source").cast("long").alias("n_sources"),
            F.round(F.count("*") / F.lit(float(total)), 4).alias("doc_share"),
        )
        .orderBy("fold")
    )
