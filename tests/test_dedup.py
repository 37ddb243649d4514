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


def test_substring_spans_invariants(spark, sf_dir):
    """Cross-doc substring dedup: fractions bounded, the fixture is
    non-vacuous (some duplicated spans exist), window counts equal
    token_count - W_SUB + 1, and first_dup_pos is a valid position."""
    rows = dd.QUERIES["dedup_substring_spans"](spark, sf_dir).collect()
    assert rows
    assert any(r.n_dup_windows > 0 for r in rows), "no duplicated spans"
    texts = {
        r.doc_id: r.text
        for r in __import__("presto_db_spark.catalog", fromlist=["load_table"])
        .load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    for r in rows:
        assert 0 <= r.n_dup_windows <= r.n_windows
        assert abs(r.dup_frac - round(r.n_dup_windows / r.n_windows, 6)) < 1e-12
        ntok = len(texts[r.doc_id].strip().split())
        assert r.n_windows == ntok - dd.W_SUB + 1
        if r.n_dup_windows:
            assert 1 <= r.first_dup_pos <= r.n_windows
        else:
            assert r.first_dup_pos is None


def test_incremental_dedup_consistent_with_self_join(spark, sf_dir):
    """Every (incoming, existing) pair the incremental screen flags must
    also appear in the full corpus self-join at the same threshold (the
    incremental op is a restriction of the symmetric relation), and the
    fixture must yield BOTH dup and novel incoming docs (non-vacuous)."""
    inc = dd.QUERIES["dedup_incremental"](spark, sf_dir).collect()
    assert any(r.is_dup for r in inc) and any(not r.is_dup for r in inc)
    full = {
        (r.id_a, r.id_b)
        for r in dd.QUERIES["dedup_minhash_lsh"](spark, sf_dir).collect()
    }
    sym = full | {(b, a) for a, b in full}
    for r in inc:
        if r.is_dup:
            assert r.best_match_id % dd.INC_MOD != 0  # matches are existing-side
            assert (r.doc_id, r.best_match_id) in sym, (
                r.doc_id, r.best_match_id)


def test_containment_supersets_symmetric_pairs(spark, sf_dir):
    """Containment is a weaker relation over the SAME candidate set:
    max-containment = 2j/(1+j) at worst (equal sizes), so every
    minhash-LSH pair with jaccard >= 3/7 is GUARANTEED past the 0.6
    containment threshold; for pairs present in both, the scores must
    be mutually consistent."""
    cont = {(r.id_a, r.id_b): r for r in
            dd.QUERIES["dedup_containment"](spark, sf_dir).collect()}
    assert cont
    sym = dd.QUERIES["dedup_minhash_lsh"](spark, sf_dir).collect()
    guaranteed = [s for s in sym if s.jaccard >= 3 / 7 + 1e-9]
    assert guaranteed, "fixture has no pair in the guaranteed region"
    for s in guaranteed:
        assert (s.id_a, s.id_b) in cont, (s.id_a, s.id_b)
    for s in sym:
        if (s.id_a, s.id_b) in cont:
            c = cont[(s.id_a, s.id_b)]
            assert max(c.containment_a, c.containment_b) >= c.jaccard - 1e-9
            assert abs(c.jaccard - s.jaccard) < 1e-6
