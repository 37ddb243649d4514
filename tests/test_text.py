from __future__ import annotations

import pytest

from presto_db_spark.operators import text as tx

from .oracle_utils import check_query


@pytest.mark.parametrize("name", sorted(tx.QUERIES))
def test_text_vs_duckdb(spark, sf_dir, name):
    problems = check_query(spark, name, tx.QUERIES[name], tx.ORACLE.get(name), sf_dir)
    assert not problems, f"{name}: {problems}"


def test_decontaminate_nonvacuous(spark, sf_dir):
    """The 5-gram overlap join must actually fire on the synthetic corpus
    (shared vocabulary ⇒ some train docs share grams with the eval split),
    or the oracle match is vacuous."""
    from presto_db_spark.operators import text

    rows = text.QUERIES["text_decontaminate"](spark, sf_dir).collect()
    assert len(rows) >= 1
    assert all(r.n_overlap >= 1 for r in rows)


def test_split_deterministic_and_proportional(spark, sf_dir):
    """The md5 split is (a) deterministic across runs and (b) ~90/10 within
    a loose binomial band."""
    from presto_db_spark.operators import text

    a = sorted(map(tuple, text.QUERIES["text_train_val_split"](spark, sf_dir).collect()))
    b = sorted(map(tuple, text.QUERIES["text_train_val_split"](spark, sf_dir).collect()))
    assert a == b
    n_train = sum(r[2] for r in a if r[0] == "train")
    n_val = sum(r[2] for r in a if r[0] == "val")
    frac = n_val / (n_train + n_val)
    assert 0.03 < frac < 0.20, frac
