"""Unit tests for bench.py's parent-side orchestration logic.

The headline benchmark (BASELINE.json:2) must be un-zeroable under a
degraded TPU relay (VERDICT r2 #1; r3 observed a second failure mode:
tunnel ports up but the backend hung). These tests pin the pure
classification/ordering helpers that drive the retry loop.
"""

import importlib.util
import os
import sys

_BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench_module", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    # bench.py top level is import + constants only (main() guarded),
    # so loading it never touches JAX or the relay
    spec.loader.exec_module(mod)
    return mod


bench = _load_bench()


def test_harvest_records_completed_tiers():
    measured, wedged = set(), {}
    rows = [
        {"starting": "a"},
        {"tier": "a", "value": 1.0},
        {"starting": "b"},
        {"tier": "b", "value": 2.0},
    ]
    bench.harvest(rows, measured, wedged)
    assert measured == {"a", "b"}
    assert wedged == {}


def test_harvest_charges_wedge_to_last_started_tier():
    measured, wedged = set(), {}
    rows = [
        {"starting": "a"},
        {"tier": "a", "value": 1.0},
        {"starting": "b"},  # child died here (alarm exit / parent kill)
    ]
    bench.harvest(rows, measured, wedged)
    assert measured == {"a"}
    assert wedged == {"b": 1}


def test_harvest_ignores_non_terminal_gaps():
    # a mid-list tier with no value row (plausibility-rejected) is NOT
    # a wedge: the child moved on and printed the next marker
    measured, wedged = set(), {}
    rows = [
        {"starting": "a"},  # rejected by the >60%-MFU guard
        {"starting": "b"},
        {"tier": "b", "value": 2.0},
    ]
    bench.harvest(rows, measured, wedged)
    assert measured == {"b"}
    assert wedged == {}


def test_harvest_trailing_rejection_is_not_a_wedge():
    # a tier rejected by the >60%-MFU plausibility guard at the END of
    # the list prints an explicit marker; it must not be charged as a
    # wedge (ADVICE r3)
    measured, wedged = set(), {}
    rows = [
        {"starting": "a"},
        {"tier": "a", "value": 1.0},
        {"starting": "b"},
        {"rejected": "b"},
        {"done": True},
    ]
    bench.harvest(rows, measured, wedged)
    assert measured == {"a"}
    assert wedged == {}


def test_harvest_done_marker_means_clean_completion():
    # even without a rejected marker, {"done": true} proves the child
    # reached the end of its loop — no wedge charge
    measured, wedged = set(), {}
    rows = [{"starting": "a"}, {"done": True}]
    bench.harvest(rows, measured, wedged)
    assert wedged == {}


def test_harvest_empty_child_output():
    measured, wedged = set(), {}
    bench.harvest([], measured, wedged)
    assert measured == set() and wedged == {}


def test_harvest_accumulates_wedge_counts_across_children():
    measured, wedged = set(), {}
    bench.harvest([{"starting": "c"}], measured, wedged)
    bench.harvest([{"starting": "c"}], measured, wedged)
    assert wedged == {"c": 2}


def test_retry_order_deprioritizes_wedged_tiers():
    order = ["a", "b", "c"]
    assert bench.retry_order(["a", "b", "c"], {"a": 1}, order) == [
        "b",
        "c",
        "a",
    ]
    # no wedges: cheapest-compile-first order preserved
    assert bench.retry_order(["c", "a"], {}, order) == ["a", "c"]
    # repeat offenders go last of all
    assert bench.retry_order(["a", "b", "c"], {"a": 2, "b": 1}, order) == [
        "c",
        "b",
        "a",
    ]


def test_tier_table_shape():
    # every tier entry carries (impl, batch, min_remaining, hang_budget)
    for name, spec in bench.TIERS.items():
        assert len(spec) == 4, name
        assert spec[3] > 60, f"{name}: hang budget must absorb compiles"
    assert list(bench.CHILD_A) == list(bench.TIERS)


def test_prior_measurement_reads_matrix_log():
    # the annotation path used when a relay outage zeroes the round
    row = bench.prior_measurement()
    if row is not None:
        assert row["value"] > 0
        assert row["source"] == "bench_matrix.jsonl"


def test_main_module_import_is_tpu_free():
    # the parent process contract is "never touches the TPU": bench.py
    # must keep jax (and the package that would pull it in) out of its
    # module top level — all device work lives in child subprocesses
    import ast

    tree = ast.parse(open(_BENCH).read())
    top_imports = set()
    for n in tree.body:
        if isinstance(n, ast.Import):
            top_imports.update(a.name.split(".")[0] for a in n.names)
        elif isinstance(n, ast.ImportFrom) and n.module:
            top_imports.add(n.module.split(".")[0])
    assert "jax" not in top_imports
    assert "longterm360fov_tpu" not in top_imports
