from __future__ import annotations

import pytest

from presto_db_spark.operators import similarity as sm

from .oracle_utils import check_query


@pytest.mark.parametrize("name", sorted(sm.QUERIES))
def test_similarity_vs_duckdb(spark, sf_dir, name):
    problems = check_query(spark, name, sm.QUERIES[name], sm.ORACLE.get(name), sf_dir)
    assert not problems, f"{name}: {problems}"


def test_kmeans_improves_or_matches_quantization(spark, sf_dir):
    """The trained centroids must describe the corpus at least as well as
    the untrained first-K init: mean best-centroid cosine over all vectors
    must not decrease after Lloyd iterations (spherical k-means ascent),
    and the trained partitions must be non-degenerate (>= 2 non-empty)."""
    import numpy as np

    from presto_db_spark.operators import similarity as S

    emb = [
        (r.vec_id, np.array(r.embedding, dtype=np.float64))
        for r in S._emb(spark, sf_dir).select("vec_id", "embedding").collect()
    ]
    vecs = np.vstack([v for _, v in emb])
    init = vecs[np.argsort([i for i, _ in emb])[: S.N_CENTROIDS]]

    def mean_best(cents):
        sims = (vecs @ cents.T) / (
            np.linalg.norm(vecs, axis=1)[:, None] * np.linalg.norm(cents, axis=1)[None, :]
        )
        return sims.max(axis=1).mean()

    # run the same quantized Lloyd iterations locally
    cents = init.copy()
    for _ in range(S.KMEANS_ITERS):
        sims = (vecs @ cents.T) / (
            np.linalg.norm(vecs, axis=1)[:, None] * np.linalg.norm(cents, axis=1)[None, :]
        )
        assign = sims.argmax(axis=1)
        for c in range(S.N_CENTROIDS):
            members = vecs[assign == c]
            if len(members):
                q = np.floor(members * S.KM_SCALE + 0.5).sum(axis=0)
                cents[c] = q / (len(members) * S.KM_SCALE)
    assert mean_best(cents) >= mean_best(init) - 1e-9
    assert len({int(c) for c in sims.argmax(axis=1)}) >= 2


def test_semantic_dedup_invariants(spark, sf_dir):
    """SemDeDup: kept + removed = members per cluster, the cap holds,
    the fixture yields duplicate pairs somewhere (non-vacuous), and
    removed can never exceed members - 1 (a cluster keeps >= 1)."""
    rows = sm.QUERIES["dedup_semantic"](spark, sf_dir).collect()
    assert rows and len(rows) <= sm.N_CENTROIDS
    assert any(r.n_dup_pairs > 0 for r in rows), "no semantic dup pairs"
    for r in rows:
        assert 1 <= r.n_members <= sm.SEM_CAP
        assert r.n_kept + r.n_removed == r.n_members
        if r.n_members > 0:
            assert r.n_removed <= r.n_members - 1 or r.n_members == 0


def test_int8_quantize_semantics(spark, sf_dir):
    """Codes saturate the int8 range exactly at the max-|x| element
    (±127), never exceed it, and the reconstruction error is small
    relative to the vector norm (the point of the compression)."""
    from presto_db_spark.operators import similarity as sim

    rows = sim.QUERIES["emb_int8_quantize"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -127 <= r.q_min <= r.q_max <= 127
        assert max(abs(r.q_min), abs(r.q_max)) == 127  # scale anchors the max
        assert r.sq_err_nanos >= 0
        assert r.n_dims == 64
    # quantization noise bound: per-element error <= (maxabs/127)/2, so
    # sq_err <= dims * (maxabs/254)^2 — check the aggregate respects it
    for r in rows[:50]:
        maxabs = r.maxabs_micros / 1e6
        bound = r.n_dims * (maxabs / 254 * 1.01) ** 2
        assert r.sq_err_nanos / 1e9 <= bound, (r.vec_id, r.sq_err_nanos, bound)


def test_pq_adc_recall_and_shape(spark, sf_dir):
    """PQ-ADC is an approximation of exact L2 top-k: assert the structural
    contract (TOP_K rows per query, ascending adist, no self-matches) and
    a recall floor against the exact numpy answer — compression must not
    destroy the neighborhood structure on the clustered fixture."""
    import numpy as np

    rows = sm.QUERIES["sim_pq_adc"](spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        assert r.qid != r.vec_id
        by_q.setdefault(r.qid, []).append(r)
    assert len(by_q) == sm.N_QUERIES
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in sm._emb(spark, sf_dir).select("vec_id", "embedding").collect()
    }
    hits = total = 0
    for qid, rs in by_q.items():
        assert len(rs) == sm.TOP_K
        rs.sort(key=lambda r: r.rn)
        # final order is by EXACT reranked distance; ADC adist rides along
        assert all(a.dist <= b.dist + 1e-9 for a, b in zip(rs, rs[1:]))
        q = emb[qid]
        for r in rs:  # reranked dist must BE the exact L2² (to rounding)
            assert abs(r.dist - float(np.sum((q - emb[r.vec_id]) ** 2))) < 1e-4
        exact = sorted(
            ((np.sum((q - v) ** 2), vid) for vid, v in emb.items() if vid != qid)
        )[: sm.TOP_K]
        exact_ids = {vid for _, vid in exact}
        hits += sum(1 for r in rs if r.vec_id in exact_ids)
        total += sm.TOP_K
    assert hits / total >= 0.5, f"PQ recall@{sm.TOP_K} collapsed: {hits}/{total}"


def test_ivfpq_recall_and_pruning_consistency(spark, sf_dir):
    """IVF+PQ: TOP_K rows per query in exact-reranked order, emitted dist
    IS the exact L2², every candidate obeys the partition pruning (its
    coarse assignment is one of the query's probes), and recall@5 vs
    exact stays high (measured 0.92 on both fixtures; floor 0.7)."""
    import numpy as np

    rows = sm.QUERIES["sim_ivfpq"](spark, sf_dir).collect()
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in sm._emb(spark, sf_dir).select("vec_id", "embedding").collect()
    }
    # recompute coarse assignment/probes locally with the operator's math
    import pandas as pd

    ids = sorted(emb)
    cent_ids = [i for i in ids if i < sm.N_CENTROIDS]
    cent_vecs = [[float(x) for x in emb[i]] for i in cent_ids]
    ap = sm._assign_probe_impl(
        pd.Series([[float(x) for x in emb[i]] for i in ids]),
        cent_ids, cent_vecs, sm.N_PROBE,
    )
    cid_of = dict(zip(ids, ap["cid"]))
    probes_of = dict(zip(ids, [set(p) for p in ap["probes"]]))
    by_q = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append(r)
    assert len(by_q) == sm.N_QUERIES
    hits = tot = 0
    for qid, rs in by_q.items():
        assert len(rs) == sm.TOP_K
        rs.sort(key=lambda r: r.rn)
        assert all(a.dist <= b.dist + 1e-9 for a, b in zip(rs, rs[1:]))
        q = emb[qid]
        for r in rs:
            assert abs(r.dist - float(np.sum((q - emb[r.vec_id]) ** 2))) < 1e-4
            assert cid_of[r.vec_id] in probes_of[qid], (
                qid, r.vec_id, "candidate outside probed partitions")
        exact = sorted(
            ((np.sum((q - v) ** 2), vid) for vid, v in emb.items() if vid != qid)
        )[: sm.TOP_K]
        eids = {vid for _, vid in exact}
        hits += sum(1 for r in rs if r.vec_id in eids)
        tot += sm.TOP_K
    assert hits / tot >= 0.7, f"IVFPQ recall collapsed: {hits}/{tot}"


def test_mmr_propose_verify_matches_sequential_and_fallback(spark, sf_dir):
    # r14: sim_mmr_diversify proposes the greedy trajectory on a bounded
    # shortlist and verifies it in ONE distributed pass; the emitted rows
    # must be identical to the r13 sequential loop, and a rejected
    # proposal must fall back to that loop (still exact)
    import presto_db_spark.operators.similarity as sm
    from pyspark.sql import functions as F

    def rel_frame():
        emb = sm._emb(spark, sf_dir)
        qv = emb.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("qe")
        )
        return (
            emb.filter(F.col("vec_id") != 0)
            .crossJoin(F.broadcast(qv))
            .select(
                "vec_id",
                F.round(sm.cosine(F.col("embedding"), F.col("qe")) * 1000000)
                .cast("long")
                .alias("rel_e6"),
                "embedding",
            )
            .localCheckpoint(eager=False)
        )

    seq = [tuple(r) for r in sm._mmr_sequential(spark, rel_frame()).collect()]
    fast = [
        tuple(r) for r in sm.sim_mmr_diversify(spark, sf_dir).collect()
    ]
    assert fast == seq

    # poison the proposal (swap picks 1 and 2): the verifier must reject
    # it and the fallback must still emit the exact rows
    orig = sm._mmr_propose
    try:
        sm._mmr_propose = lambda rows: (
            (lambda p: [p[1], p[0]] + p[2:] if p else p)(orig(rows))
        )
        fallback = [
            tuple(r) for r in sm.sim_mmr_diversify(spark, sf_dir).collect()
        ]
    finally:
        sm._mmr_propose = orig
    assert fallback == seq
