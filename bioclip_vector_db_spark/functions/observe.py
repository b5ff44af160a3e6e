"""Observation helpers for riding metrics on existing jobs.

``df.observe(obs, ...)`` + an eager action replaces a separate count()
job — but when the action's result is EMPTY, AQE can replace the whole
subtree with an empty relation without ever executing the observed node,
and ``Observation.get`` then raises from the JVM (null metrics row,
``PythonSQLUtils.toPyRow`` assertion; reproduced on Spark 4.1.2 with an
anti-join that removes every row before a localCheckpoint). Callers that
fused a probe into such a job need a defined answer for that edge."""

from __future__ import annotations

from collections.abc import Callable


def observed_or(obs, key: str, default, *, empty_check: "Callable[[], bool] | None" = None):
    """``obs.get[key]`` with ``default`` when the metrics row never
    materialized (empty-result plans, see module docstring) or the
    metric itself is NULL (e.g. sum() over zero rows).

    ``empty_check`` verifies the PRECONDITION of that edge: it must
    return True iff the observed job's result was genuinely empty.
    With it supplied, an ``Observation.get`` failure whose precondition
    does NOT hold — a metric-name typo, a listener/JVM regression, any
    transient error — RE-RAISES instead of serving the default (r16
    VERDICT item 6 / ADVICE: for near_dup_clusters the default means
    "converged", so an unverified default would silently terminate the
    pointer-jumping loop early and return under-merged clusters — an
    oracle-invisible wrong answer at scale). The check runs only on the
    failure path, so the fused job's cost is unchanged; callers fusing
    probes onto an eagerly-materialized result pass e.g.
    ``empty_check=result.isEmpty`` (a limit-1 probe over the already
    checkpointed rows — cheap, and loud when it cannot confirm).

    Without ``empty_check`` the failure path serves the default
    unconditionally — only safe when the default makes the CALLER take
    the conservative branch (delete_ids falls back to an explicit
    count), never when it short-circuits work.
    """
    try:
        val = obs.get[key]
    except Exception:
        if empty_check is not None and not empty_check():
            raise
        return default
    return default if val is None else val
