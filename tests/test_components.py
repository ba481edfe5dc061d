"""Connected-components clustering (dedup_clusters) tests.

Oracle: a driver-side union-find over the same edge list — the simplest
correct CC implementation; the distributed large-star/small-star result
must match it exactly on every graph shape.
"""

import numpy as np
import pandas as pd

from kafka_es_ray.pipelines.dedup_ops import connected_components, dedup_clusters


def _uf_labels(n_nodes: list[int], edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = {x: x for x in n_nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-of-component labels
    return {x: find(x) for x in n_nodes}


def _run_cc(ray_session, nodes, edges):
    import ray.data as rd

    pairs = pd.DataFrame(
        {
            "doc_a": pd.Series([a for a, _ in edges], dtype=np.int64),
            "doc_b": pd.Series([b for _, b in edges], dtype=np.int64),
        }
    )
    nodes_df = pd.DataFrame({"doc_id": pd.Series(nodes, dtype=np.int64)})
    out = connected_components(rd.from_pandas(pairs), rd.from_pandas(nodes_df))
    got = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = _uf_labels(nodes, edges)
    assert dict(zip(got["doc_id"], got["cluster_id"])) == want


def test_chain_is_transitive(ray_session):
    # a-b, b-c, c-d collapse to one cluster rooted at the min; isolated
    # nodes label themselves
    _run_cc(
        ray_session,
        nodes=[1, 2, 3, 4, 10, 11, 20],
        edges=[(2, 3), (3, 4), (1, 2), (10, 11)],
    )


def test_empty_edges_all_singletons(ray_session):
    _run_cc(ray_session, nodes=[5, 6, 7], edges=[])


def test_random_graphs_match_union_find(ray_session):
    rng = np.random.default_rng(42)
    for _ in range(3):
        n = 60
        nodes = list(range(1000, 1000 + n))
        m = int(rng.integers(10, 80))
        edges = [
            (int(rng.choice(nodes)), int(rng.choice(nodes))) for _ in range(m)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        _run_cc(ray_session, nodes, edges)


def test_dedup_clusters_end_to_end(ray_session):
    import ray.data as rd

    # three near-identical docs (one cluster), one unique doc
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = pd.DataFrame(
        {
            "doc_id": pd.Series([1, 2, 3, 4], dtype=np.int64),
            "text": [base, base + " extra", "completely different words entirely here today", base + " more"],
        }
    )
    out = dedup_clusters(rd.from_pandas(docs), threshold=0.3).to_pandas()
    lab = dict(zip(out["doc_id"], out["cluster_id"]))
    assert lab[1] == lab[2] == lab[4] == 1
    assert lab[3] == 3
