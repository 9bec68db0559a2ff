"""Round-6 continuation, batch 5: label-propagation communities, RAG
chunk manifest, session path mining, and column-entropy profiling.

Four more first-class operators (north-star extensions per the build
brief — the reference repo, /root/reference/etl/transform.py, has no
graph/text/profiling analytics):

- ``g_label_propagation``: synchronous label-propagation community
  detection (2 deterministic rounds, most-frequent-neighbor-label with
  min-label tiebreak) over the supplier co-supply graph — the
  communities complement to the existing PageRank / triangles / k-core
  family (connected components finds REACHABILITY islands; LPA finds
  DENSITY communities inside one component).
- ``t_rag_chunk_manifest``: overlapping sliding-window chunking (the
  RAG-serving shape — stride < window so every boundary sentence lands
  wholly inside at least one chunk), emitting the per-chunk manifest a
  vector-index loader consumes. Distinct from the DEDUP chunkers
  (d_chunk_dedup fixed non-overlapping, d_cdc_chunking content-defined):
  those partition text, this covers it redundantly on purpose.
- ``b_session_path_topk``: most common full session paths (ordered
  event-type sequences per 4-h-gap session, the b_sessionize
  convention) — the sequence-mining readout behind "what do users
  actually do in a session?".
- ``a_column_entropy_report``: Shannon entropy + distinct count per
  profiled column across tables — the information-density profile that
  ranks candidate blocking/partition keys (near-zero-entropy columns
  prune nothing; the profiling complement to a_dataset_profile's
  per-column stats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..sources.tables import load_table
from .catalog import query

# --------------------------------------------------------------------------
# g_label_propagation — 2-round synchronous LPA communities
# --------------------------------------------------------------------------

_LPA_TOP_EDGES = 500
_LPA_ROUNDS = 2

# One synchronous LPA round as SQL CTEs: neighbor-label counts over the
# symmetrized edge list, then the most-frequent label per node with
# min-label tiebreak (row_number over count DESC, label ASC).
_LPA_ROUND = """
    nc{i} AS (
      SELECT s.a AS node, l.label, count(*) AS c
      FROM sym s JOIN l{j} l ON l.node = s.b
      GROUP BY s.a, l.label
    ),
    l{i} AS (
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (
                 PARTITION BY node ORDER BY c DESC, label
               ) AS rn
        FROM nc{i}
      ) WHERE rn = 1
    )"""


def _lpa_oracle() -> str:
    parts = [
        f"""
    WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
    w AS (
      SELECT a.s AS s1, b.s AS s2, count(*) AS c
      FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
      GROUP BY 1, 2
    ),
    e AS (
      SELECT s1, s2 FROM (
        SELECT s1, s2, row_number() OVER (ORDER BY c DESC, s1, s2) AS rn FROM w
      ) WHERE rn <= {_LPA_TOP_EDGES}
    ),
    sym AS (
      SELECT s1 AS a, s2 AS b FROM e UNION ALL SELECT s2, s1 FROM e
    ),
    l0 AS (SELECT DISTINCT a AS node, a AS label FROM sym)"""
    ]
    for it in range(1, _LPA_ROUNDS + 1):
        parts.append("," + _LPA_ROUND.format(i=it, j=it - 1))
    parts.append(
        f"""
    SELECT label, CAST(count(*) AS BIGINT) AS n_members
    FROM l{_LPA_ROUNDS}
    GROUP BY label
    ORDER BY n_members DESC, label
    LIMIT 20
    """
    )
    return "".join(parts)


def lpa_state(spark: SparkSession, sf_dir: str):
    """Shared LPA machinery: returns (edges, sym, labels) — the
    strongest-500-edges co-supply graph, its symmetrized frame, and the
    final deterministic labels after _LPA_ROUNDS synchronous rounds.
    Consumed by g_label_propagation (community sizes) and
    g_community_modularity (partition quality, plans/round7e_ext.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.select(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).distinct()
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    n_pair_tasks = min(4096, max(shuffle_parts, li.count() // 25_000))
    ps = ps.repartition(n_pair_tasks, "p")
    a, b = ps.alias("a"), ps.alias("b")
    wgt = (
        a.join(b, (F.col("a.p") == F.col("b.p")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
        .agg(F.count("*").alias("c"))
    )
    top = F.row_number().over(W.orderBy(F.desc("c"), "s1", "s2"))
    edges = wgt.withColumn("rn", top).filter(F.col("rn") <= _LPA_TOP_EDGES)
    edges = edges.select("s1", "s2").localCheckpoint(eager=True)
    sym = edges.select(F.col("s1").alias("a"), F.col("s2").alias("b")).unionAll(
        edges.select(F.col("s2").alias("a"), F.col("s1").alias("b"))
    )
    labels = sym.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(_LPA_ROUNDS):
        nc = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(F.col("a").alias("n"), "label")
            .agg(F.count("*").alias("c"))
        )
        pick = F.row_number().over(
            W.partitionBy("n").orderBy(F.desc("c"), F.asc("label"))
        )
        labels = (
            nc.withColumn("rn", pick)
            .filter(F.col("rn") == 1)
            .select(F.col("n").alias("node"), "label")
        )
    return edges, sym, labels


@query("g_label_propagation", oracle=_lpa_oracle())
def g_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation communities over the supplier co-supply graph
    (same strongest-500-edges base as g_triangle_count): labels start as
    node ids; each of 2 synchronous rounds relabels every node with its
    most frequent neighbor label (min label on ties — fully
    deterministic, unlike classic randomized LPA); the report is the 20
    largest resulting communities. Complements the graph family:
    components finds reachability islands, LPA finds density
    communities inside them.

    Scale shape per round: one edge-sized shuffle (the neighbor-label
    join re-keys edges by dst, then the (node, label) count
    partial-aggregates map-side) and one node-sized argmax window over
    per-node label groups (each partition is one node's <=deg labels,
    never data-sized). Round count is a literal, so lineage is a
    fixed-depth DAG — a deep fit would localCheckpoint between rounds
    like g_pagerank_suppliers. The edge budget is a literal so the
    top-edge window keeps its WindowGroupLimit rewrite
    (plans/round4_ext.py:1515 discipline).
    """
    # (body shared with g_community_modularity via lpa_state above; the
    # pair-stage widening + _LPA_TOP_EDGES eager-checkpoint discipline
    # lives there — without truncation the expensive pair-enumeration
    # subtree is planned ~6x.)
    _edges, _sym, labels = lpa_state(spark, sf_dir)
    return (
        labels.groupBy("label")
        .agg(F.count("*").alias("n_members"))
        .orderBy(F.desc("n_members"), F.asc("label"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# t_rag_chunk_manifest — overlapping sliding-window chunking
# --------------------------------------------------------------------------

_RAG_W = 32
_RAG_STRIDE = 24


@query(
    "t_rag_chunk_manifest",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ),
    k AS (
      SELECT doc_id, words,
             1 + CAST(ceil(greatest(len(words) - {_RAG_W}, 0)
                           / {_RAG_STRIDE}.0) AS BIGINT) AS n_chunks
      FROM w
    ),
    ch AS (
      SELECT doc_id,
             i AS chunk_idx,
             1 + (i - 1) * {_RAG_STRIDE} AS start_word,
             list_slice(words, 1 + (i - 1) * {_RAG_STRIDE},
                        (i - 1) * {_RAG_STRIDE} + {_RAG_W}) AS cw
      FROM k, UNNEST(range(1, n_chunks + 1)) AS t(i)
    )
    SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(start_word AS BIGINT) AS start_word,
           CAST(len(cw) AS BIGINT) AS n_words,
           md5(array_to_string(cw, ' ')) AS chunk_hash
    FROM ch
    WHERE len(cw) > 0
    ORDER BY doc_id, chunk_idx
    """,
)
def t_rag_chunk_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping sliding-window chunk manifest (window {32} words,
    stride {24} — 8 words of overlap): the RAG-serving cut, where
    stride < window guarantees every boundary neighborhood lands wholly
    inside at least one chunk. Emits (doc_id, chunk_idx, start_word,
    n_words, chunk_hash) — exactly what a vector-index loader ingests
    (embed chunk_hash-keyed text, store doc_id/start_word for
    provenance). The trailing chunk may be shorter; a document shorter
    than one window yields exactly one chunk.

    Scale shape: pure narrow column work — chunk enumeration is a
    higher-order sequence/slice expression inside the row (no shuffle,
    no UDF); the manifest inherits the scan's partitioning and the only
    ordering is the output presentation sort. At 100 TB this is a
    map-only pass that pipelines straight into the embedding UDF batch
    (m_multimodal_features' mapInPandas shape).
    """
    docs = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    base = docs.select("doc_id", words.alias("words"))
    n_chunks = (
        1
        + F.ceil(
            F.greatest(F.size("words") - _RAG_W, F.lit(0)) / float(_RAG_STRIDE)
        )
    ).cast("int")
    ch = base.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), n_chunks)).alias("chunk_idx"),
        "words",
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        (1 + (F.col("chunk_idx") - 1) * _RAG_STRIDE).cast("long").alias(
            "start_word"
        ),
        F.slice(
            "words", (F.col("chunk_idx") - 1) * _RAG_STRIDE + 1, _RAG_W
        ).alias("cw"),
    )
    return (
        ch.filter(F.size("cw") > 0)
        .select(
            "doc_id",
            "chunk_idx",
            "start_word",
            F.size("cw").cast("long").alias("n_words"),
            F.md5(F.concat_ws(" ", "cw")).alias("chunk_hash"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


# --------------------------------------------------------------------------
# b_session_path_topk — most common session event paths
# --------------------------------------------------------------------------

_PATH_GAP_S = 14400  # 4 h, the b_sessionize convention
_PATH_TOP = 20


@query(
    "b_session_path_topk",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN ts - lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                  ) > INTERVAL {_PATH_GAP_S} SECONDS
                  OR lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                  ) IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM events
    ),
    sess AS (
      SELECT user_id, event_type, ts, event_id,
             sum(new_s) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS session_id
      FROM marked
    ),
    paths AS (
      SELECT user_id, session_id,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM sess GROUP BY user_id, session_id
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT {_PATH_TOP}
    """,
)
def b_session_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{20} session paths: each 4-h-gap session (the b_sessionize
    boundary convention) reduces to its ordered event-type sequence
    ("view>click>purchase"), counted across all sessions — the
    sequence-mining readout behind funnel design ("what do users
    actually do?"). Ties order by path for a deterministic cut.

    Scale shape: ONE data-sized shuffle — the session windows and the
    per-session path aggregation all share the user_id partitioning
    (the lag + running-sum + groupBy stack is the b_sessionize plan
    with a sort_array(collect_list) reduction on top); the path
    frequency count partial-aggregates map-side and the final cut is a
    TakeOrderedAndProject. Per-session collect_list is bounded by
    session length — a bot-length session would cap via slice() before
    the join in production, exactly like the degree caps on the graph
    family.
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    new_s = F.when(gap.isNull() | (gap > _PATH_GAP_S), 1).otherwise(0)
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    paths = (
        ev.withColumn("session_id", F.sum(new_s).over(run))
        .groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda x: x["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(_PATH_TOP)
    )


# --------------------------------------------------------------------------
# a_column_entropy_report — information-density profile
# --------------------------------------------------------------------------

_ENTROPY_COLS = (
    ("events", "event_type"),
    ("documents", "lang"),
    ("documents", "source"),
    ("orders", "o_orderstatus"),
)


def _entropy_oracle() -> str:
    selects = []
    for table, col in _ENTROPY_COLS:
        selects.append(
            f"""
    SELECT '{table}.{col}' AS column_name,
           CAST(count(*) AS BIGINT) AS n_distinct,
           round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 4) AS entropy_bits
    FROM (SELECT {col}, count(*) AS c FROM {table} GROUP BY {col})"""
        )
    return (
        "SELECT * FROM ("
        + " UNION ALL ".join(selects)
        + ") ORDER BY column_name"
    )


@query("a_column_entropy_report", oracle=_entropy_oracle())
def a_column_entropy_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (bits) + distinct count per profiled column
    across tables — the information-density profile that ranks
    candidate partition/blocking keys: a near-zero-entropy column
    prunes nothing when partitioned on; a max-entropy column (entropy
    ~ log2 n_distinct) spreads uniformly. Complements the per-column
    stats profile with a distribution-shape scalar.

    Scale shape: per column, ONE map-side-combined groupBy to the
    value-frequency frame, then H = log2(N) - sum(c*log2(c))/N folds
    those counts in a second (distinct-value-sized) aggregate — the
    identity avoids a p=c/N per-row divide against a broadcast total,
    so no window and no cross join; the per-column reports union into
    a 4-row frame. Entropy is rounded to 4 (sum order differs ~1 ulp
    across engines; the standing absorb-in-round discipline).
    """
    outs = []
    for table, col in _ENTROPY_COLS:
        df = load_table(spark, sf_dir, table)
        counts = df.groupBy(col).agg(F.count("*").alias("c"))
        outs.append(
            counts.agg(
                F.lit(f"{table}.{col}").alias("column_name"),
                F.count("*").alias("n_distinct"),
                F.round(
                    F.log2(F.sum("c"))
                    - F.sum(F.col("c") * F.log2("c")) / F.sum("c"),
                    4,
                ).alias("entropy_bits"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("column_name")
