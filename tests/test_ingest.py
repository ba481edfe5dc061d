"""ES ingest pipelines: whitelisted processor chain compiled once into
a vectorized batch transform — compile-time validation (the simulate
contract), per-processor semantics, ignore_missing, Dataset stage."""

import numpy as np
import pandas as pd
import pytest

from kafka_es_ray.stages.ingest import apply_ingest_pipeline, compile_pipeline


def _b():
    return pd.DataFrame(
        {
            "a": ["  X1y ", "z2", None],
            "n": np.float64([1.5, -2.5, 3.0]),
            "i": np.int64([7, 8, 9]),
        }
    )


def test_processor_chain_semantics():
    fn = compile_pipeline(
        [
            {"trim": {"field": "a"}},
            {"lowercase": {"field": "a"}},
            {"gsub": {"field": "a", "pattern": "[0-9]", "replacement": "#"}},
            {"rename": {"field": "n", "target_field": "amount"}},
            {"set": {"field": "tag", "value": "v1"}},
            {"convert": {"field": "i", "type": "string"}},
        ]
    )
    out = fn(_b())
    assert out["a"].tolist() == ["x#y", "z#", None]
    assert "n" not in out.columns and out["amount"].tolist() == [1.5, -2.5, 3.0]
    assert out["tag"].tolist() == ["v1"] * 3
    assert out["i"].tolist() == ["7", "8", "9"]


def test_split_and_remove():
    fn = compile_pipeline(
        [
            {"split": {"field": "a", "separator": "[0-9]+"}},
            {"remove": {"field": ["n", "i"]}},
        ]
    )
    out = fn(_b())
    assert out["a"].tolist() == [["  X", "y "], ["z", ""], None]
    assert list(out.columns) == ["a"]


def test_compile_time_validation():
    with pytest.raises(ValueError):
        compile_pipeline([{"grok": {"field": "a"}}])  # not whitelisted
    with pytest.raises(ValueError):
        compile_pipeline([{"set": {"field": "a"}}])  # missing value
    with pytest.raises(ValueError):
        compile_pipeline([{"convert": {"field": "a", "type": "ip"}}])
    with pytest.raises(ValueError):
        compile_pipeline([{"set": {}, "rename": {}}])  # two keys


def test_missing_field_and_ignore_missing():
    fn = compile_pipeline([{"rename": {"field": "zz", "target_field": "y"}}])
    with pytest.raises(KeyError):
        fn(_b())
    ok = compile_pipeline(
        [
            {"rename": {"field": "zz", "target_field": "y", "ignore_missing": True}},
            {"remove": {"field": "zz", "ignore_missing": True}},
            {"gsub": {"field": "zz", "pattern": "x", "replacement": "y",
                      "ignore_missing": True}},
        ]
    )
    out = ok(_b())
    assert list(out.columns) == ["a", "n", "i"]
    # rename onto an existing column is a hard error (ES contract)
    clash = compile_pipeline([{"rename": {"field": "a", "target_field": "n"}}])
    with pytest.raises(KeyError):
        clash(_b())


def test_dataset_stage(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(_b().head(2))
    out = apply_ingest_pipeline(
        ds, [{"set": {"field": "t", "value": 1}}, {"trim": {"field": "a"}}]
    ).to_pandas()
    assert out["t"].tolist() == [1, 1] and out["a"].tolist() == ["X1y", "z2"]


def test_simulate_pipeline_per_doc_error_isolation():
    """_simulate: one doc's processor failure must not affect siblings;
    compile-time errors still raise for the whole request (ES)."""
    import numpy as np
    import pytest as _pytest

    from kafka_es_ray.stages.ingest import simulate_pipeline

    procs = [
        {"rename": {"field": "a", "target_field": "b"}},
        {"convert": {"field": "n", "type": "integer"}},
    ]
    out = simulate_pipeline(
        procs,
        [{"a": "x", "n": "1"}, {"a": "y", "n": "nope"}, {"a": "z", "n": "3"}],
    )
    assert out["slot"].tolist() == [0, 1, 2]
    assert out["ok"].tolist() == [True, False, True]
    assert out.loc[0, "b"] == "x" and out.loc[2, "b"] == "z"
    assert out.loc[1, "b"] is None
    assert np.isnan(out.loc[1, "n"])
    # a doc missing the renamed field fails alone (no ignore_missing)
    out2 = simulate_pipeline(procs, [{"n": "1"}, {"a": "q", "n": "2"}])
    assert out2["ok"].tolist() == [False, True]
    # compile-time validation still fails the whole request
    with _pytest.raises(ValueError, match="unsupported ingest processor"):
        simulate_pipeline([{"nope": {}}], [{"a": 1}])
    # empty docs list -> typed empty frame
    empty = simulate_pipeline(procs, [])
    assert list(empty.columns) == ["slot", "ok"] and len(empty) == 0
