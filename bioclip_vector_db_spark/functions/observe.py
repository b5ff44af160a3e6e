"""Observation helpers for riding metrics on existing jobs.

``df.observe(obs, ...)`` + an eager action replaces a separate count()
job — but when the action's result is EMPTY, AQE can replace the whole
subtree with an empty relation without ever executing the observed node,
and ``Observation.get`` then raises from the JVM (null metrics row,
``PythonSQLUtils.toPyRow`` assertion; reproduced on Spark 4.1.2 with an
anti-join that removes every row before a localCheckpoint). Callers that
fused a probe into such a job need a defined answer for that edge."""

from __future__ import annotations


def observed_or(obs, key: str, default):
    """``obs.get[key]`` with ``default`` when the metrics row never
    materialized (empty-result plans, see module docstring) or the
    metric itself is NULL (e.g. sum() over zero rows)."""
    try:
        val = obs.get[key]
    except Exception:
        return default
    return default if val is None else val
