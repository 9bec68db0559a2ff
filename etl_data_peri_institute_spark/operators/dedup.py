"""Reusable document-deduplication operators (engine API).

The plan-level queries in ``plans/llmdata.py`` are thin wrappers over
these. All operators are declarative DataFrame compositions — the LSH
path never materializes the O(n²) pair space, so cost stays linear in
corpus size + colliding-bucket volume at 100 TB.

Contract: input is any DataFrame with (id_col, text_col).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def word_shingles(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    distinct: bool = True,
) -> DataFrame:
    """Word n-gram shingles: (id, sh). Pure higher-order column
    expressions (sequence/transform/explode) — no UDF.

    ``distinct=False`` skips the dedup shuffle — correct for consumers
    whose aggregate is duplicate-insensitive (MinHash mins); set-semantics
    consumers (Jaccard counts) need ``distinct=True``.
    """
    words = df.select(F.col(id_col).alias("id"), F.split(text_col, " ").alias("w"))
    idx = F.sequence(F.lit(1), F.size("w") - (n - 1))
    gram = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at("w", i + k) for k in range(n)])
    )
    out = words.filter(F.size("w") >= n).select("id", F.explode(gram).alias("sh"))
    return out.distinct() if distinct else out


def minhash_signatures(
    shingles: DataFrame, n_hashes: int = 8, hash_fn: str = "xxhash64"
) -> DataFrame:
    """(id, m0..m{n-1}): per-seed minimum of a hash of each shingle — a
    valid MinHash family either way. Hash collisions only perturb an
    already-approximate similarity estimate, so the cheap hash is the
    right default:

    - ``xxhash64`` (engine default): JVM-native seeded 64-bit longs,
      8 bytes/element and no hex materialization — the fast path.
    - ``md5``: seeded hex-string mins — bit-identical in DuckDB, so the
      cross-engine oracle queries pin correctness through this variant.
    Same plan shape (one partial-aggregated groupBy) for both.
    """
    if hash_fn == "xxhash64":
        aggs = [
            F.min(F.xxhash64(F.lit(i), F.col("sh"))).alias(f"m{i}")
            for i in range(n_hashes)
        ]
    elif hash_fn == "md5":
        aggs = [
            F.min(F.md5(F.concat(F.lit(str(i)), F.col("sh")))).alias(f"m{i}")
            for i in range(n_hashes)
        ]
    else:
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")
    return shingles.groupBy("id").agg(*aggs)


def lsh_band_table(sigs: DataFrame, bands: int = 4, rows_per_band: int = 2) -> DataFrame:
    """Unpivot MinHash signatures into the LSH band table:
    ``(id, band, sig)`` where ``sig`` concatenates the band's
    ``rows_per_band`` signature components. This is THE index structure
    of banded LSH — the self-join variant (lsh_candidate_pairs) and the
    incremental batch-vs-corpus probe both join on ``(band, sig)``.

    At scale the corpus's band table is a MAINTAINED artifact: written
    once, bucketed on ``sig`` (sources/formats.py:write_bucketed —
    single-column bucketing; ``sig`` is a subset of the ``(band, sig)``
    join keys, which is what Spark needs to keep the bucketed side
    shuffle-free), appended per ingest batch — so a daily probe pays
    only the batch side's work (pinned by
    tests/test_formats.py:test_maintained_lsh_band_table_probe)."""
    stack_args = ", ".join(
        f"{b}, concat({', '.join(f'm{b * rows_per_band + r}' for r in range(rows_per_band))})"
        for b in range(bands)
    )
    return sigs.select("id", F.expr(f"stack({bands}, {stack_args}) AS (band, sig)"))


def lsh_candidate_pairs(sigs: DataFrame, bands: int = 4, rows_per_band: int = 2) -> DataFrame:
    """Band the signatures and self-join on (band, signature) → candidate
    (id_a < id_b) pairs. P(candidate) = 1-(1-j^r)^b."""
    banded = lsh_band_table(sigs, bands=bands, rows_per_band=rows_per_band)
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def shingle_intersections(
    shingles: DataFrame,
    max_doc_freq: float | int | None = 0.05,
    doc_freq_floor: int = 128,
) -> DataFrame:
    """Shared core of the exact set-overlap verifiers: per doc pair
    sharing ≥1 shingle, the intersection size and both set sizes —
    ``(id_a, id_b, n_common, n_a, n_b)``. jaccard_pairs and
    containment_pairs are thin filters over this frame; the cap, skew,
    and single-pipeline notes below apply to all of them.

    Shuffle-joins on the shingle value; ultra-frequent shingles are the
    skew hazard — one stop-word shingle shared by 10% of a crawl corpus
    makes that join bucket quadratic. ``max_doc_freq`` drops shingles
    whose doc-frequency exceeds the cap BEFORE the self-join, bounding
    any bucket's pair count; ``None`` disables. A float cap is a
    fraction of distinct docs, but never below ``doc_freq_floor``
    absolute docs: a shingle in ≤128 docs yields ≤ ~8k pairs in its
    bucket — harmless at any corpus size — so small corpora (and tests)
    are never over-pruned, while at crawl scale the fraction governs.
    An int cap is absolute. Jaccard is then computed consistently on
    the capped shingle universe (standard stop-shingle semantics). The
    doc-frequency pass is a plain partial-aggregated groupBy — hot
    shingles combine map-side, so the guard itself is skew-proof.

    Scale shapes: the cap is applied as an anti-join against the HOT
    set (shingles over the cap) — tiny by construction (stop shingles),
    so it broadcasts at any corpus size; the keep-set semi-join variant
    would build an unbounded side.

    Single-pipeline shape (round-3 rework): the per-doc set size |A|
    rides along as a window count over ``id`` instead of a separate
    counts frame, so the (capped) shingle frame feeds exactly TWO
    consumers — the two self-join sides — whose subplans are identical.
    When both sides shuffle (the at-scale shape), AQE's runtime stage
    cache serves BOTH from ONE shuffle write — the final adaptive plan
    shows the second side as a ReusedExchange of the first
    (pinned by ``test_shingle_intersections_single_scan_when_both_sides
    _shuffle``; the reuse is a runtime decision, not visible in the
    initial plan). At small inputs the stats-based planner instead
    broadcasts the second side, re-running the (tiny) derivation —
    cheaper there than a shuffle, and irrelevant at scale. The old
    shape (separate counts frame + two count-joins) scanned the shingle
    derivation three times and joined twice more; this one needs no
    persist/cache to be single-scan, so there is no cache lifecycle to
    manage at any scale.
    """
    if max_doc_freq is not None:
        # input contract is set semantics (distinct (id, sh) rows — see
        # word_shingles), so plain count(*) IS the doc-frequency: no
        # count_distinct expansion needed
        doc_freq = shingles.groupBy("sh").agg(F.count("*").alias("__df"))
        if isinstance(max_doc_freq, float):
            total = (
                shingles.select("id").distinct().select(F.count("*").alias("__n_docs"))
            )
            cap = F.greatest(F.lit(doc_freq_floor), F.col("__n_docs") * max_doc_freq)
            hot = doc_freq.crossJoin(total).filter(F.col("__df") > cap)
        else:
            hot = doc_freq.filter(F.col("__df") > max_doc_freq)
        shingles = shingles.join(hot.select("sh"), "sh", "left_anti")
    sized = shingles.withColumn(
        "n", F.count("*").over(Window.partitionBy("id"))
    )
    a, b = sized.alias("a"), sized.alias("b")
    return (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(
            F.count("*").alias("n_common"),
            # n is constant within an id; max() is just the reduction shape
            F.max(F.col("a.n")).alias("n_a"),
            F.max(F.col("b.n")).alias("n_b"),
        )
    )


def jaccard_pairs(
    shingles: DataFrame,
    min_jaccard: float = 0.1,
    max_doc_freq: float | int | None = 0.05,
    doc_freq_floor: int = 128,
) -> DataFrame:
    """Exact shingle-set Jaccard for all docs sharing ≥1 shingle —
    ``(id_a, id_b, jaccard)`` above the threshold. See
    shingle_intersections for the cap/skew/single-pipeline design."""
    inter = shingle_intersections(shingles, max_doc_freq, doc_freq_floor)
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return inter.filter(jac > min_jaccard).select("id_a", "id_b", jac.alias("jaccard"))


def containment_pairs(
    shingles: DataFrame,
    min_containment: float = 0.8,
    max_doc_freq: float | int | None = 0.05,
    doc_freq_floor: int = 128,
) -> DataFrame:
    """Asymmetric set containment — the near-SUBSET detector Jaccard
    misses: a boilerplate header fully contained in a long page, or a
    quoted document embedded in a larger one, scores
    |A∩B|/min(|A|,|B|) ≈ 1 while its Jaccard is tiny (the union is
    dominated by the long side). The standard companion to Jaccard in
    crawl dedup (containment/overlap coefficient).

    Output ``(subset_id, superset_id, n_common, containment)`` for pairs
    at or above the threshold; the smaller set is the subset side (ties
    keep the a-side, i.e. the lower id, deterministically). Same
    shuffle shape and skew cap as jaccard_pairs."""
    inter = shingle_intersections(shingles, max_doc_freq, doc_freq_floor)
    cont = F.col("n_common") / F.least("n_a", "n_b")
    a_is_subset = F.col("n_a") <= F.col("n_b")
    return inter.filter(cont >= min_containment).select(
        F.when(a_is_subset, F.col("id_a")).otherwise(F.col("id_b")).alias("subset_id"),
        F.when(a_is_subset, F.col("id_b")).otherwise(F.col("id_a")).alias("superset_id"),
        "n_common",
        cont.alias("containment"),
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: one survivor (min id) per content hash."""
    return (
        df.groupBy(F.md5(text_col).alias("content_hash"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def head_fingerprint(text_col: str = "text", n_words: int = 8):
    """md5 of the first ``n_words`` whitespace words — THE maintained
    exact-tier key (d_incremental_dedup's set, the retraction gate's
    refcounted table, the physical twin test). One definition so the
    gate, the incremental set and the tests cannot drift apart (a
    changed word count or separator in one copy would silently compare
    different keys)."""
    return F.md5(
        F.array_join(F.slice(F.split(F.col(text_col), " "), 1, n_words), " ")
    )


def _positioned_ngrams(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, pos, g): word n-grams with their 1-based start position.
    Same higher-order-column shape as word_shingles, plus posexplode."""
    words = df.select(F.col(id_col).alias("id"), F.split(text_col, " ").alias("w"))
    idx = F.sequence(F.lit(1), F.size("w") - (n - 1))
    gram = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at("w", i + k) for k in range(n)])
    )
    return (
        words.filter(F.size("w") >= n)
        .select("id", F.posexplode(gram).alias("pos0", "g"))
        .select("id", (F.col("pos0") + 1).alias("pos"), "g")
    )


def duplicated_span_ranges(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
    min_count: int | None = None,
) -> DataFrame:
    """Word-coordinate ranges ``(id, lo, hi)`` (1-based, inclusive) of
    every MERGED run of n-gram occurrences whose n-gram appears in
    ``min_docs``+ distinct documents — the span-level diagnostic behind
    exact-substring training-data dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better": repeated
    spans drive memorization long before whole-document dedup fires).
    t_duplicated_ngram_report is the REPORT over the same grams; this is
    the per-document coordinate form the APPLY consumes.

    ``min_count`` (optional) ALSO flags grams by TOTAL occurrence count
    (a gram repeated ``min_count``+ times qualifies even inside one
    document) — the self-repetition axis of Lee et al.: degenerate
    generation-loop text repeats n-grams within a single doc, which
    ``min_docs`` alone never sees. A gram qualifies when EITHER
    threshold fires; both reduce in the same partial agg.

    Plan shape at 100 TB: one posexplode pass over the corpus, a
    map-side-combined groupBy on the gram (singleton grams — the
    overwhelming majority — never cross the wire past the partial agg),
    a semi-join of positioned grams against the hot-gram set (shuffled
    hash join on the gram key; the hot set is crawl-boilerplate-sized,
    far smaller than the corpus), then merge_intervals' single per-doc
    window. Overlapping occurrences of the same boilerplate collapse
    into one island, so output size is bounded by distinct boilerplate
    regions per doc, not occurrence count."""
    from .intervals import merge_intervals

    grams = _positioned_ngrams(df, id_col, text_col, n)
    qualifies = F.col("n_docs") >= min_docs
    if min_count is not None:
        qualifies = qualifies | (F.col("n_occ") >= min_count)
    hot = (
        grams.groupBy("g")
        .agg(
            F.count_distinct("id").alias("n_docs"),
            F.count("*").alias("n_occ"),
        )
        .filter(qualifies)
        .select("g")
    )
    flagged = grams.join(hot, "g", "left_semi").select(
        "id", F.col("pos").alias("lo"), (F.col("pos") + n - 1).alias("hi")
    )
    # adjacency=1: spans [1,8] and [9,16] cover contiguous words — merge
    return merge_intervals(flagged, ["id"], adjacency=1)


def remove_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
    min_count: int | None = None,
) -> DataFrame:
    """Exact-substring dedup APPLY: cut every duplicated span (per
    duplicated_span_ranges) out of each document's text. Returns the
    input columns plus ``text_clean`` (surviving words re-joined),
    ``n_words_removed`` and ``n_spans_removed``; documents with no
    duplicated span pass through with ``text_clean = text`` and zeros.

    The per-doc merged-span set is collected into ONE small array column
    (bounded by boilerplate regions per doc, not corpus size), joined
    back to the corpus (left join on the doc id — one shuffle, or a
    broadcast when the flagged-doc set is small), and the cut is a pure
    higher-order expression: F.filter's (element, index) lambda keeps
    words not covered by any span — JVM-side, no UDF, no second
    explode of the corpus."""
    clash = {"__spans", "__span_doc_id"} & set(df.columns)
    if clash:
        raise ValueError(
            f"remove_duplicated_spans: input must not contain reserved columns {sorted(clash)}"
        )
    spans = duplicated_span_ranges(df, id_col, text_col, n, min_docs, min_count)
    # reserved internal join key: per_doc's natural key is literally
    # named 'id', which would be ambiguous (or silently drop caller
    # data) whenever the input frame has its own 'id' column
    per_doc = spans.groupBy("id").agg(
        F.collect_list(F.struct("lo", "hi")).alias("__spans")
    ).withColumnRenamed("id", "__span_doc_id")
    joined = df.join(
        per_doc, F.col(id_col) == F.col("__span_doc_id"), "left"
    ).drop("__span_doc_id")
    words = F.split(text_col, " ")
    covered = lambda i: F.exists(  # noqa: E731 — i is the 0-based word index
        "__spans", lambda s: (i + 1 >= s["lo"]) & (i + 1 <= s["hi"])
    )
    kept = F.filter(words, lambda w, i: ~covered(i))
    n_spans = F.size("__spans")
    has = F.col("__spans").isNotNull()
    return joined.select(
        *df.columns,
        F.when(has, F.concat_ws(" ", kept)).otherwise(F.col(text_col)).alias("text_clean"),
        F.when(has, F.size(words) - F.size(kept)).otherwise(F.lit(0)).alias("n_words_removed"),
        F.when(has, n_spans).otherwise(F.lit(0)).alias("n_spans_removed"),
    )


def segment_occurrences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Fixed-window segment occurrences with corpus-wide KEEP-FIRST
    flags — the C4/RefinedWeb-style segment-level dedup primitive
    (Raffel et al. 2020 dropped repeated three-sentence spans from C4;
    with no sentence boundaries in the corpus the segmenter here is
    fixed non-overlapping ``n``-token windows, the same operator shape).

    Complements the two existing granularities: ``exact_dedup`` is
    whole-document, ``duplicated_span_ranges`` is overlapping-gram runs;
    this is the partitioned-segment middle ground (each word belongs to
    exactly ONE segment, so the apply never double-cuts).

    Output: one row per segment occurrence ``(id, chunk, segment,
    kept, *extra_cols)`` — ``chunk`` is the 0-based segment index,
    ``kept`` is true only for the first occurrence corpus-wide in
    (id, chunk) order.

    Plan shape at 100 TB: segmentation is a pure higher-order column
    (sequence/transform/slice — no UDF, no groupBy) followed by ONE
    posexplode; keep-first is a map-side-combined ``min(struct(id,
    chunk))`` groupBy on the segment (a boilerplate segment repeated
    10^9 times collapses to one row per map task — a row_number window
    over the segment partition would instead sort every occurrence of
    the hot segment in a single task), then a hash join of occurrences
    against the distinct-segment winners (AQE skew-join splits any
    residual hot segment's join partition).
    """
    occ = segment_explode(df, id_col, text_col, n, extra_cols)
    first = occ.groupBy("segment").agg(
        F.min(F.struct(F.col("id"), F.col("chunk"))).alias("__first")
    )
    return (
        occ.join(first, "segment")
        .select(
            "id",
            "chunk",
            "segment",
            *extra_cols,
            (
                (F.col("id") == F.col("__first.id"))
                & (F.col("chunk") == F.col("__first.chunk"))
            ).alias("kept"),
        )
    )


def content_defined_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 4,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Content-defined chunking at word granularity (the FastCDC /
    rsync idea): a chunk boundary opens BEFORE word ``pos`` whenever
    the md5 of the ``w`` preceding words starts with hex ``'0'``
    (p = 1/16, so chunks average ~16+w words), plus an unconditional
    boundary at pos 1. Because boundaries depend only on LOCAL content,
    inserting one word re-chunks only the neighborhood of the edit and
    the remaining boundaries RE-SYNC — the property fixed-width
    segmentation (segment_explode) lacks, where a one-word insertion
    shifts every downstream segment and defeats chunk-level dedup.

    Output: one row per chunk ``(id, chunk_id, chunk_text, n_words,
    *extra_cols)`` — ``chunk_id`` is 1-based in document order.

    Plan shape at 100 TB: one posexplode pass; the rolling window is
    ``w`` lag() calls inside ONE per-doc window (doc-bounded partitions
    — the same bounded-window discipline as merge_intervals), the
    chunk id is a running sum over the same window spec (single
    exchange on the doc id serves both), and reassembly is one per-doc
    groupBy of (pos, word) structs. The boundary hash is md5 so the
    DuckDB oracle replays chunking bit-identically.
    """
    words = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in extra_cols],
        F.posexplode(F.split(text_col, " ")).alias("pos0", "word"),
    ).select(
        "id", *extra_cols, (F.col("pos0") + 1).alias("pos"), "word"
    )
    wdw = Window.partitionBy("id").orderBy("pos")
    prev = F.concat_ws(
        " ", *[F.lag("word", w - k).over(wdw) for k in range(w)]
    )
    is_start = F.when(
        (F.col("pos") == 1)
        | ((F.col("pos") > w) & F.md5(prev).startswith("0")),
        F.lit(1),
    ).otherwise(F.lit(0))
    tagged = words.withColumn(
        "chunk_id",
        F.sum(is_start).over(wdw.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        tagged.groupBy("id", "chunk_id", *extra_cols)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "word"))),
                    lambda s: s["word"],
                ),
                " ",
            ).alias("chunk_text"),
            F.count("*").alias("n_words"),
        )
    )


def segment_explode(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Fixed-window segmentation WITHOUT the keep-first pass: one row
    per segment occurrence ``(id, chunk, segment, *extra_cols)``.
    Consumers that only aggregate per segment (e.g. the cross-source
    overlap matrix) use this directly and skip
    :func:`segment_occurrences`' corpus-wide winner join entirely —
    segmentation stays a pure higher-order column (sequence/transform/
    slice, no UDF) followed by ONE posexplode."""
    words = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in extra_cols],
        F.split(text_col, " ").alias("w"),
    )
    n_seg = F.ceil(F.size("w") / F.lit(n)).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda c: F.concat_ws(" ", F.slice("w", c * n + 1, n)),
    )
    return words.select(
        "id", *extra_cols, F.posexplode(segs).alias("chunk", "segment")
    )
