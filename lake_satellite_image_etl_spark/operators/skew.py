"""Skew mitigation (SURVEY.md §4, build plan phase 5): salted joins
for hot keys.

A shuffled equi-join sends every row of a key to ONE reducer; a hot
key (celebrity user, null-ish default, head-of-zipf token) turns that
reducer into the straggler that bounds the whole stage. Two engine
answers:

1. **AQE skew-join** (on by default in session.py): splits oversized
   partitions at runtime — zero code, the first line of defense.
2. **Salting** (this module): pre-split hot keys deterministically —
   the explicit form for when the skew is known and extreme (AQE can
   only split what fits one executor's fetch in the first place).

The salt must be *deterministic* here (derived by hashing a
row-unique column) so plans stay replayable and oracle-checkable —
``rand()``-salting would break retry idempotency too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    *,
    row_id: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where the fact side's hot keys are split across
    ``n_salt`` reducers.

    fact rows get ``salt = pmod(xxhash64(row_id), n_salt)``; the dim
    side is replicated ``n_salt``× via a literal explode. The shuffle
    key becomes (key, salt) — a hot key now lands on n_salt reducers
    instead of one. Cost: dim side ×n_salt (fine for dimension tables;
    for fact-fact skew, salt only the hot-key subset — split the join
    in two and union).

    Only fact-preserving join types are allowed: with ``right`` or
    ``full`` the replicated dim side would emit every unmatched dim
    row ``n_salt`` times — silently wrong output (ADVICE r2)."""
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched rows of "
            f"the replicated dim side; allowed: {sorted(allowed)}"
        )
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(row_id)), F.lit(n_salt)).cast("int")
    )
    salted_dim = dim.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(n_salt)])),
    )
    out = salted_fact.join(salted_dim, [key, "_salt"], how)
    return out.drop("_salt")
