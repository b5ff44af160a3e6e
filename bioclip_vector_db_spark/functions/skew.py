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

    ``salt_source`` picks the probe rows' salt; default is a hash of the
    full probe row's key column plus ``spark_partition_id`` — deterministic
    per run, uniform enough to split hot keys. Result equals
    ``probe.join(build, on, how)`` exactly (asserted in tests).
    """
    if salt_source is None:
        salt_source = F.pmod(
            F.hash(F.col(on), F.spark_partition_id(), F.monotonically_increasing_id()),
            F.lit(salts),
        )
    salted_probe = probe.withColumn(SALT_COL, salt_source.cast("int"))
    salted_build = build.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    return salted_probe.join(salted_build, [on, SALT_COL], how).drop(SALT_COL)
