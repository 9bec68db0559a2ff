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
