"""Driver-sample rotation: the correctness driver checks the FIRST 50
registry entries each round, so lanes without a driver-green row must
rotate to the front automatically — recomputed from the driver's own
CORRECTNESS_r*.json artifacts, advancing each round with no manual
registry edit until every lane has earned a green row."""

from __future__ import annotations

from sinker_spark.queries import REGISTRY, _load, _rotated_prefix, _driver_evidence


def test_prefix_contains_only_lanes_without_driver_green_rows():
    _load()
    ev = _driver_evidence()
    if ev is None:  # fresh checkout: static seed applies
        assert _rotated_prefix()
        return
    green, _sampled = ev
    prefix = _rotated_prefix()
    # nothing already driver-green may occupy a front slot while
    # un-green lanes exist, and the prefix must cover ALL un-green lanes
    assert all(n not in green for n in prefix)
    assert set(prefix) == {n for n in REGISTRY if n not in green}


def test_registry_order_puts_prefix_first():
    _load()
    names = list(REGISTRY)
    prefix = [n for n in _rotated_prefix() if n in REGISTRY]
    assert names[: len(prefix)] == prefix


def test_evidence_parses_driver_artifacts():
    ev = _driver_evidence()
    if ev is not None:
        green, sampled = ev
        assert green <= sampled
        assert sampled  # artifacts present → at least one sampled lane
