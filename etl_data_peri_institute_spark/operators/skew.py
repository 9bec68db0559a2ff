"""Skew-resistant join: explicit key salting.

AQE's skew-join handling splits oversized shuffle partitions at runtime
(enabled in session.py); explicit salting is the complementary static
pattern for when one build-side key dominates so badly that even split
partitions re-skew, or when AQE is unavailable (streaming joins).

Mechanics: the probe (large, skewed) side gets a random salt in
[0, n_salt); the build side is replicated n_salt times with each salt
value; the join key becomes (key, salt). The dominant key's rows spread
over n_salt reducers at the cost of replicating the (small) build side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


#: Join modes where replicating the build side cannot change the result:
#: every probe row carries exactly one salt, so it meets each build row
#: exactly once. Right/full-outer are NOT equivalent — an unmatched
#: build row would surface once per salt replica — so they are rejected.
SALTED_JOIN_MODES = frozenset({"inner", "left", "left_outer", "left_semi", "left_anti"})


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    n_salt: int = 8,
    how: str = "inner",
    seed: int = 7,
) -> DataFrame:
    """Equality join on ``key`` with the probe side salted and the build
    side replicated. Result equals ``probe.join(build, key, how)`` for
    the probe-preserving modes in ``SALTED_JOIN_MODES``; other modes
    raise (for right/full-outer, salt the other side or let AQE's
    skew-join split partitions instead)."""
    if how not in SALTED_JOIN_MODES:
        raise ValueError(
            f"salted_join(how={how!r}) would duplicate unmatched build rows "
            f"n_salt times; supported modes: {sorted(SALTED_JOIN_MODES)}"
        )
    salted_probe = probe.withColumn("__salt", (F.rand(seed=seed) * n_salt).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    replicated_build = build.withColumn("__salt", salts)
    out = salted_probe.join(replicated_build, [key, "__salt"], how)
    return out.drop("__salt")


def planned_salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    rows_per_reducer: int,
    how: str = "inner",
    seed: int = 7,
    factors: DataFrame | None = None,
) -> DataFrame:
    """Per-key ADAPTIVE salting: only keys whose measured probe-side row
    count exceeds ``rows_per_reducer`` are salted, each with its own
    factor ``ceil(count / rows_per_reducer)`` — the
    p_partition_skew_planner ``hot_key_salt_factor`` formula applied per
    key instead of derived for the single hottest one.

    Why not salted_join: uniform salting replicates the ENTIRE build
    side ``n_salt``× — a bandwidth cost every cold key pays for the hot
    ones (it is the measured driver of j_salted_skew_join's 3.8× 10×
    probe ratio). Here cold keys (the overwhelming majority under a
    skewed distribution) keep one replica and salt 0; replication is
    bounded by ``sum(ceil(c_hot / rows_per_reducer))`` — proportional to
    the skew being fixed, not to the build-table size.

    ``factors``: optionally pass a precomputed ``(key, __nsalt)`` hot-key
    table (in production, maintained alongside the planner's census —
    table stats change slowly relative to daily runs). When None it is
    derived inline with one map-side-combined count groupBy on the same
    key the join shuffles on. The hot-key table is broadcast: its size
    is bounded by ``n_probe_rows / rows_per_reducer`` BY CONSTRUCTION
    (each hot key accounts for > rows_per_reducer rows), i.e. at most
    the task count you were already planning for.

    Same probe-preserving mode set as salted_join, same invisibility
    contract: the result equals the plain ``probe.join(build, key, how)``
    (every probe row carries exactly one salt; a build row of a key with
    factor n is replicated n times but meets each probe row once).
    """
    if how not in SALTED_JOIN_MODES:
        raise ValueError(
            f"planned_salted_join(how={how!r}) would duplicate unmatched "
            f"build rows per salt replica; supported modes: "
            f"{sorted(SALTED_JOIN_MODES)}"
        )
    if rows_per_reducer < 1:
        raise ValueError(f"rows_per_reducer must be >= 1, got {rows_per_reducer}")
    if factors is None:
        factors = (
            probe.groupBy(key)
            .agg(F.count("*").alias("__c"))
            .where(F.col("__c") > rows_per_reducer)
            .select(
                key,
                F.ceil(F.col("__c") / rows_per_reducer).cast("int").alias("__nsalt"),
            )
            # both join sides consume the factor table; truncate the plan
            # so the probe-side count pass runs once, not once per side
            .localCheckpoint(eager=False)
        )
    else:
        # sanitize a user-supplied census: a duplicate key would fan out
        # BOTH join sides (breaking the salting-is-invisible contract),
        # and a factor < 1 would explode an empty/negative salt range —
        # one key-max pass over the (small) factor table closes both
        factors = factors.groupBy(key).agg(
            F.greatest(F.max("__nsalt"), F.lit(1)).alias("__nsalt")
        )
    hot = F.broadcast(factors)
    salted_probe = (
        probe.join(hot, key, "left")
        .withColumn("__nsalt", F.coalesce("__nsalt", F.lit(1)))
        .withColumn("__salt", (F.rand(seed=seed) * F.col("__nsalt")).cast("int"))
        .drop("__nsalt")
    )
    replicated_build = (
        build.join(hot, key, "left")
        .withColumn("__nsalt", F.coalesce("__nsalt", F.lit(1)))
        .withColumn(
            "__salt", F.explode(F.sequence(F.lit(0), F.col("__nsalt") - 1))
        )
        .drop("__nsalt")
    )
    out = salted_probe.join(replicated_build, [key, "__salt"], how)
    return out.drop("__salt")
