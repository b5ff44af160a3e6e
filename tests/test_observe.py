"""observed_or: the default may only paper over the DOCUMENTED edge
(empty-result plan never materializes the metric). r16 VERDICT item 6:
with an empty_check, any OTHER Observation.get failure must re-raise —
for near_dup_clusters the default means 'converged', so an unverified
default would silently end connected components early with under-merged
clusters."""

from __future__ import annotations

import pytest

from bioclip_vector_db_spark.functions.observe import observed_or


class _RaisingObs:
    """Stand-in whose .get raises like a JVM-side Observation failure."""

    @property
    def get(self):
        raise RuntimeError("injected foreign failure (not the empty-plan edge)")


class _NullMetricObs:
    @property
    def get(self):
        return {"changed": None}


class _ValueObs:
    @property
    def get(self):
        return {"changed": 7}


def test_foreign_failure_reraises_when_precondition_fails():
    with pytest.raises(RuntimeError, match="injected foreign failure"):
        observed_or(_RaisingObs(), "changed", 0, empty_check=lambda: False)


def test_failure_with_confirmed_empty_precondition_serves_default():
    assert observed_or(_RaisingObs(), "changed", 0, empty_check=lambda: True) == 0


def test_failure_without_empty_check_serves_default():
    # delete_ids' contract: the default routes to a conservative explicit
    # recount, so the unverified fallback stays available there.
    assert observed_or(_RaisingObs(), "n", None) is None


def test_null_metric_serves_default_without_running_empty_check():
    ran = []
    assert (
        observed_or(
            _NullMetricObs(), "changed", 0, empty_check=lambda: ran.append(1) or True
        )
        == 0
    )
    assert not ran  # NULL metric is the sum-over-zero-rows case, no probe needed


def test_materialized_metric_wins():
    assert observed_or(_ValueObs(), "changed", 0, empty_check=lambda: False) == 7


def test_connected_components_does_not_early_exit_on_foreign_failure(spark):
    """End-to-end: inject a foreign Observation failure into one CC round
    and prove near_dup_clusters RAISES instead of returning under-merged
    labels (the oracle-invisible wrong answer the hardening exists for)."""
    from unittest import mock

    from pyspark.sql import Observation

    from bioclip_vector_db_spark.operators import dedup as dedup_mod

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "a_id long, b_id long"
    )

    class _BrokenGetObservation(Observation):
        @property
        def get(self):  # type: ignore[override]
            raise RuntimeError("injected listener failure")

    # near_dup_clusters imports Observation from pyspark.sql inside the
    # loop body — patch it at that source.
    with mock.patch("pyspark.sql.Observation", _BrokenGetObservation):
        with pytest.raises(RuntimeError, match="injected listener failure"):
            dedup_mod.near_dup_clusters(pairs)
