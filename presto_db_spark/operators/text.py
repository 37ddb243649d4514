"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's surface (BASELINE.json north-star): language-ID,
quality scoring, token counting, document fingerprinting — each a pure
DataFrame expression pipeline (JVM-side, codegen'd; no Python in the hot
path) over the ``documents`` table, designed to scan 100 TB of text with
nothing but a projection (no shuffle at all except final aggregation).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def _q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


# Tiny per-language stopword marker lists for the n-gram/stopword heuristic.
# (A real pipeline ships trained n-gram profiles; the *shape* — score per
# language via expression, argmax — is the part that matters at scale.)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "zh": ["的", "是", "在", "了", "和"],
}


def tokens(col: Column) -> Column:
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    """Whitespace token count (the ``documents`` texts are space-joined)."""
    return F.size(tokens(col))


def word_token_count(col: Column) -> Column:
    """BPE-ish subword proxy: count word chunks + digit runs + punctuation
    marks separately (regexp-based, JVM-side)."""
    return F.size(F.regexp_extract_all(col, F.lit(r"[a-zA-Z]+|[0-9]+|[^\sa-zA-Z0-9]"), 0))


def quality_score(col: Column) -> Column:
    """Heuristic doc quality in [0,1]: penalize very short docs, high
    punctuation ratio, low stopword ratio (the C4/Gopher-style filters)."""
    n_tok = token_count(col)
    n_chars = F.length(col)
    punct = F.length(F.regexp_replace(col, r"[a-zA-Z0-9\s]", ""))
    stop_hits = F.size(
        F.array_intersect(F.array_distinct(tokens(col)), F.array(*[F.lit(w) for w in LANG_MARKERS["en"]]))
    )
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    punct_score = 1 - F.least(punct / (n_chars + 1) * 5, F.lit(1.0))
    stop_score = F.least(stop_hits / F.lit(3.0), F.lit(1.0))
    return F.round((len_score + punct_score + stop_score) / 3, 6)


_FP_UDF = None


def fingerprint(col: Column) -> Column:
    """Deterministic 50-bit rolling hash over characters (document
    fingerprinting) — Arrow-batched pandas UDF with the identical integer
    math the oracle SQL recomputes (no floats, exact parity). The
    equivalent per-char aggregate() fold is a CodegenFallback expression:
    interpreted, boxed, and measured to wobble 0.4 s ↔ 4 s under JIT
    profile pollution; the UDF is flat and stable."""
    global _FP_UDF
    if _FP_UDF is None:

        def _fp(texts):
            import pandas as pd

            mod = 2**50
            out = []
            for t in texts:
                h = 0
                for ch in t or "":
                    h = (h * 31 + ord(ch)) % mod
                out.append(h)
            return pd.Series(out, dtype="int64")

        _FP_UDF = F.pandas_udf(_fp, "long")
    return _FP_UDF(col)


def lang_score(col: Column, markers: list[str]) -> Column:
    toks = F.array_distinct(tokens(F.lower(col)))
    return F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in markers])))


def lang_id(col: Column) -> Column:
    """Marker-list language ID: argmax over per-language stopword hits,
    'und' when nothing matches. Expression-only (greatest over structs)."""
    scored = F.array(
        *[
            F.struct(lang_score(col, ws).alias("score"), F.lit(lang).alias("lang"))
            for lang, ws in sorted(LANG_MARKERS.items())
        ]
    )
    best = F.array_max(scored)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


# --- queries ----------------------------------------------------------------

@_q(
    "text_token_stats",
    """
SELECT doc_id,
       CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER) AS n_tokens,
       CAST(length(text) AS INTEGER) AS n_chars_actual,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^\\sa-zA-Z0-9]')) AS INTEGER)
         AS n_subtokens
FROM documents
""",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        F.length("text").cast("int").alias("n_chars_actual"),
        word_token_count(F.col("text")).alias("n_subtokens"),
    )


@_q(
    "text_quality",
    """
WITH t AS (
  SELECT doc_id,
         len(string_split_regex(trim(text), '\\s+')) AS n_tok,
         length(text) AS n_chars,
         length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS punct,
         len(list_intersect(list_distinct(string_split_regex(trim(text), '\\s+')),
                            ['the', 'and', 'of', 'to', 'a'])) AS stop_hits
  FROM documents
)
SELECT doc_id,
       round((least(n_tok / 50.0, 1.0)
            + (1 - least(punct / (n_chars + 1) * 5, 1.0))
            + least(stop_hits / 3.0, 1.0)) / 3, 6) AS quality
FROM t
""",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", quality_score(F.col("text")).alias("quality"))


@_q(
    "text_lang_id",
    """
WITH scored AS (
  SELECT doc_id, lang AS true_lang,
         [
           {'score': len(list_intersect(list_distinct(string_split_regex(lower(trim(text)), '\\s+')), ['der','die','und','das','ist'])), 'lang': 'de'},
           {'score': len(list_intersect(list_distinct(string_split_regex(lower(trim(text)), '\\s+')), ['the','and','of','to','a'])), 'lang': 'en'},
           {'score': len(list_intersect(list_distinct(string_split_regex(lower(trim(text)), '\\s+')), ['el','la','de','que','y'])), 'lang': 'es'},
           {'score': len(list_intersect(list_distinct(string_split_regex(lower(trim(text)), '\\s+')), ['le','la','et','les','des'])), 'lang': 'fr'},
           {'score': len(list_intersect(list_distinct(string_split_regex(lower(trim(text)), '\\s+')), ['的','是','在','了','和'])), 'lang': 'zh'}
         ] AS scores
  FROM documents
), best AS (
  SELECT doc_id, true_lang, list_max(scores) AS b FROM scored
)
SELECT doc_id, true_lang,
       CASE WHEN b.score > 0 THEN b.lang ELSE 'und' END AS pred_lang
FROM best
""",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        lang_id(F.col("text")).alias("pred_lang"),
    )


@_q(
    "text_fingerprint",
    """
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split(text, ''),
                          ch -> CAST(coalesce(ascii(ch), 0) AS BIGINT))),
         (h, c) -> (h * 31 + c) % 1125899906842624) AS fp
FROM documents
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint(F.col("text")).alias("fp"))
