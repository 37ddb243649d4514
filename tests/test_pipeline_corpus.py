"""End-to-end training-corpus pipeline vs one DuckDB oracle."""

from __future__ import annotations

from presto_db_spark.operators import pipeline_corpus

from .oracle_utils import check_query


def test_pipeline_training_corpus(spark, sf_dir):
    problems = check_query(
        spark,
        "pipeline_training_corpus",
        pipeline_corpus.QUERIES["pipeline_training_corpus"],
        pipeline_corpus.ORACLE["pipeline_training_corpus"],
        sf_dir,
    )
    assert not problems, problems


def test_pipeline_is_nonvacuous(spark, sf_dir):
    """Each stage must actually drop something at sf0.01+, or the
    composition test is a no-op (at sf0.001 the corpus may be too small
    for near-dups; assert the gates at least)."""
    from pyspark.sql import functions as F

    from presto_db_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = pipeline_corpus.QUERIES["pipeline_training_corpus"](spark, sf_dir)
    kept = out.agg(F.sum("n_docs")).collect()[0][0]
    assert 0 < kept < docs.count()
