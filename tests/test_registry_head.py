"""Pin the driver-head rotation to its computed value.

The driver's correctness gate re-verifies exactly the first 50 registry
entries each round; rounds 1-10 maintained that rotation by hand in a
budget comment (the most fragile link in the verification pipeline —
VERDICT r10 task 8). tools/next_head.py now computes it from the
CORRECTNESS_r*.json history, and this test asserts _PRIORITY matches, so
a stale, mis-ordered, or phantom head fails CI instead of silently
burning driver slots. History rows from rounds >= HEAD_ROUND are ignored
by construction, so the pin keeps passing after this round's driver run
writes its own CORRECTNESS file; bumping HEAD_ROUND next round is what
forces the next rotation.
"""

from __future__ import annotations

import importlib.util
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_next_head():
    spec = importlib.util.spec_from_file_location(
        "next_head", os.path.join(_REPO, "tools", "next_head.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_priority_head_matches_computed_rotation():
    from music_streaming_services_etl_pipeline_with_airflow_spark.plans import (
        registry,
    )

    nh = _load_next_head()
    specs = registry.all_specs()
    oracle_backed = {n for n, s in specs.items() if s.oracle is not None}
    hist = nh.latest_rounds(before_round=registry.HEAD_ROUND)
    computed = nh.compute_head(
        registry.ROUND_NEW_OR_CHANGED, hist, oracle_backed
    )
    assert len(computed) == nh.SLOTS
    assert tuple(registry._PRIORITY) == computed, (
        "plans/registry._PRIORITY is not the computed rotation — run "
        "`python tools/next_head.py` and paste its output (did a new "
        "CORRECTNESS file land without bumping HEAD_ROUND, or did "
        "ROUND_NEW_OR_CHANGED drift?)"
    )


def test_computed_head_ordering_properties():
    """Structural invariants of the rotation, independent of the pin:
    new/changed lead verbatim, the tail is sorted by (staleness round,
    name), and nothing appears twice."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.plans import (
        registry,
    )

    nh = _load_next_head()
    hist = nh.latest_rounds(before_round=registry.HEAD_ROUND)
    head = registry._PRIORITY
    k = len(registry.ROUND_NEW_OR_CHANGED)
    assert head[:k] == registry.ROUND_NEW_OR_CHANGED
    assert len(set(head)) == len(head)
    tail_keys = [(hist.get(q, 0), q) for q in head[k:]]
    assert tail_keys == sorted(tail_keys)
    # every non-new entry is genuinely the stalest available: no query
    # outside the head (and not new/changed) may be staler than the
    # head's least-stale tail entry
    specs = registry.all_specs()
    outside = [
        n
        for n, s in specs.items()
        if s.oracle is not None and n not in set(head)
    ]
    if outside and tail_keys:
        assert min((hist.get(q, 0), q) for q in outside) > tail_keys[-1]
