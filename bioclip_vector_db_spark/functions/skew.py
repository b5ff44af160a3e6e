"""Skew-mitigation join helpers.

At 100 TB a handful of hot keys turn a shuffle join into one straggler
task. The engine's first line of defense is AQE skew-join splitting
(enabled in session.py); this module is the explicit fallback for joins AQE
can't fix — e.g. a broadcast-ineligible dimension with pathological key
skew, or pre-AQE writers.

``salted_equi_join`` implements classic salting: the probe (big, skewed)
side gets a deterministic salt in [0, S); the build side is replicated S
times with every salt value; the join key becomes (key, salt), spreading
each hot key over S tasks. Replication multiplies the build side by S, so
S trades straggler latency for build-side volume — keep the build side the
small one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"

#: Join types for which salting preserves plain-join semantics. Build-sided
#: outer joins (right/full) would emit one null-padded row PER SALT REPLICA
#: for unmatched build keys — S duplicates — so they are rejected.
_PROBE_SIDED = frozenset({"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"})


def default_salt(on: str, salts: int) -> Column:
    """The default probe-row salt: pmod of a hash over the key column, the
    task partition id, AND a per-row monotonic id — the per-row component
    is what lets one hot key split across salts even within a single input
    partition. Deterministic per run, uniform enough to spread hot keys."""
    return F.pmod(
        F.hash(F.col(on), F.spark_partition_id(), F.monotonically_increasing_id()),
        F.lit(salts),
    )


def salted_equi_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    *,
    salts: int = 8,
    how: str = "inner",
    salt_source: Column | None = None,
) -> DataFrame:
    """Equi-join ``probe`` with ``build`` on column ``on``, salted S ways.

    Result equals ``probe.join(build, on, how)`` exactly for probe-sided
    join types (inner/left/semi/anti — asserted in tests); build-sided
    outer joins are rejected (see _PROBE_SIDED). A caller-supplied
    ``salt_source`` is wrapped in ``pmod(…, salts)`` so any integer
    expression is safe — an out-of-range salt would otherwise silently
    drop matches.
    """
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in _PROBE_SIDED}:
        raise ValueError(
            f"salted_equi_join preserves semantics only for probe-sided joins "
            f"({sorted(_PROBE_SIDED)}); got how={how!r}"
        )
    salt = default_salt(on, salts) if salt_source is None else F.pmod(salt_source, F.lit(salts))
    salted_probe = probe.withColumn(SALT_COL, salt.cast("int"))
    salted_build = build.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    return salted_probe.join(salted_build, [on, SALT_COL], how).drop(SALT_COL)
