from __future__ import annotations

import pytest

from presto_db_spark.operators import dedup as dd

from .oracle_utils import check_query


@pytest.mark.parametrize("name", sorted(dd.QUERIES))
def test_dedup_vs_duckdb(spark, sf_dir, name):
    problems = check_query(spark, name, dd.QUERIES[name], dd.ORACLE.get(name), sf_dir)
    assert not problems, f"{name}: {problems}"


def test_cluster_is_transitive_closure_of_pairs(spark, sf_dir):
    """Every pair's two docs must land in the same cluster, exactly one
    member per cluster is the keeper, and the keeper is the min doc_id.
    (The DuckDB value check runs via the parametrized oracle test above.)"""
    from collections import defaultdict

    pairs = [
        (r.id_a, r.id_b)
        for r in dd.QUERIES["dedup_minhash_lsh"](spark, sf_dir).collect()
    ]
    assert pairs, "fixture has no near-dup pairs; clustering untested"
    label = {
        r.doc_id: r.cluster_id
        for r in dd.QUERIES["dedup_cluster"](spark, sf_dir).collect()
    }
    for a, b in pairs:
        assert label[a] == label[b], f"pair ({a},{b}) split across clusters"
    members = defaultdict(list)
    for d, c in label.items():
        members[c].append(d)
    for c, docs in members.items():
        assert c == min(docs), "cluster id must be the min member"
