"""records -> parse -> resolve -> index end-to-end (the full reference
dataflow shape, ElasticsearchSink.kt:25-164 analog)."""

import pandas as pd

from kafka_es_ray.config import EngineConfig
from kafka_es_ray.pipelines.actions_flow import index_from_actions
from kafka_es_ray.query.engine import IndexSearcher


def test_index_from_actions_e2e(ray_session, tmp_path):
    import ray.data as rd

    records = pd.DataFrame(
        [
            ("t", 0, '{"index":{"id":"d1"}}', '{"title":"apple banana"}', None),
            ("t", 1, '{"index":{"id":"d2"}}', '{"title":"banana cherry"}', None),
            ("t", 2, '{"index":{"id":"d1"}}', '{"title":"apple grape"}', None),  # LWW for d1
            ("t", 3, '{"index":{"id":"d3"}}', '{"title":"durian"}', None),
            ("t", 4, '{"delete":{"id":"d3"}}', None, None),                       # tombstone
            ("t", 5, "garbage", "{}", None),                                      # quarantined
        ],
        columns=["topic", "seq", "action", "value", "tag"],
    )
    idx = str(tmp_path / "aidx")
    cfg = EngineConfig(num_partitions=4)
    m = index_from_actions(rd.from_pandas(records), idx, cfg)
    assert m["n_docs"] == 2  # d1 (resolved), d2; d3 deleted; garbage dropped

    s = IndexSearcher(idx, cfg)
    assert s.search("banana")["key"].tolist() == ["d2"]  # d1's banana was overwritten
    assert set(s.search("apple grape")["key"]) == {"d1"}
    assert len(s.search("durian")) == 0  # only the deleted doc had durian


def test_index_from_actions_tag_and_map(ray_session, tmp_path):
    import ray.data as rd

    records = pd.DataFrame(
        [
            ("topic_a", 0, '{"index":{"id":"x"}}', '{"title":"kept"}', "foo"),
            ("topic_a", 1, '{"index":{"id":"y"}}', '{"title":"dropped"}', "bar"),
        ],
        columns=["topic", "seq", "action", "value", "tag"],
    )
    idx = str(tmp_path / "bidx")
    cfg = EngineConfig(num_partitions=2)
    m = index_from_actions(
        rd.from_pandas(records), idx, cfg, tag="foo", topic_index_map={"topic_a": "idx_a"}
    )
    assert m["n_docs"] == 1
    s = IndexSearcher(idx, cfg)
    assert s.search("kept")["key"].tolist() == ["x"]
    assert len(s.search("dropped")) == 0


def test_multi_index_fanout(ray_session, tmp_path):
    """Actions with different resolved _index names build SEPARATE
    indices (the per-topic index routing of the reference,
    ElasticsearchSinkTask.kt:301-310)."""
    import pandas as pd
    import ray.data as rd

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.pipelines.actions_flow import index_from_actions_multi
    from kafka_es_ray.query.engine import IndexSearcher

    recs = pd.DataFrame(
        [
            ("logs", 0, '{"index":{"id":"l1"}}', '{"title":"error timeout"}', None),
            ("logs", 1, '{"index":{"id":"l2"}}', '{"title":"error retry"}', None),
            ("products", 2, '{"index":{"id":"p1"}}', '{"title":"red shoe"}', None),
            ("t", 3, '{"index":{"id":"x1","index":"explicit"}}', '{"title":"preset wins"}', None),
        ],
        columns=["topic", "seq", "action", "value", "tag"],
    )
    cfg = EngineConfig(num_partitions=2)
    out = index_from_actions_multi(
        rd.from_pandas(recs),
        str(tmp_path),
        cfg,
        topic_index_map={"logs": "logidx", "products": "prodidx"},
        default_index="dflt",
    )
    assert set(out) == {"logidx", "prodidx", "explicit"}
    s_logs = IndexSearcher(str(tmp_path / "logidx"), cfg)
    assert s_logs.count("error") == 2
    assert s_logs.count("shoe") == 0          # other index's docs absent
    s_prod = IndexSearcher(str(tmp_path / "prodidx"), cfg)
    assert s_prod.search("shoe")["key"].tolist() == ["p1"]
    s_exp = IndexSearcher(str(tmp_path / "explicit"), cfg)
    assert s_exp.count("preset") == 1         # action-preset index wins
