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


# --- benchmark decontamination (n-gram overlap join) -----------------------

_GRAMS_SQL = (
    "list_distinct(list_transform(generate_series(1, greatest(len({w}) - 4, 0)), "
    "i -> array_to_string({w}[i:i+4], ' ')))"
)


@_q(
    "text_decontaminate",
    f"""
WITH docs AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM documents
), bench_grams AS (
  SELECT DISTINCT unnest({_GRAMS_SQL.format(w='words')}) AS gram
  FROM docs WHERE doc_id % 97 = 0
), train_grams AS (
  SELECT doc_id, unnest({_GRAMS_SQL.format(w='words')}) AS gram
  FROM docs WHERE doc_id % 97 <> 0
)
SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_overlap,
       count(*) >= 2 AS contaminated
FROM train_grams t JOIN bench_grams b ON t.gram = b.gram
GROUP BY t.doc_id
ORDER BY t.doc_id
""",
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs sharing >= N word 5-grams
    with the held-out eval set (the GPT-3/C4 n-gram-overlap rule). The
    eval side collapses to DISTINCT grams and BROADCASTS (eval sets are
    tiny vs 100 TB of training text); the training side explodes its
    distinct grams once — the contamination check is then a broadcast
    hash semi-join + per-doc count: scan-shaped, zero wide shuffles of
    text. Exact-string grams, so the DuckDB oracle value-checks every
    overlap count."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("words")
    )
    grams = F.array_distinct(
        F.expr(
            "transform(sequence(1, greatest(size(words) - 4, 0)), "
            "i -> array_join(slice(words, i, 5), ' '))"
        )
    )
    bench = (
        docs.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode(grams).alias("gram"))
        .distinct()
    )
    train = docs.filter(F.col("doc_id") % 97 != 0).select(
        "doc_id", F.explode(grams).alias("gram")
    )
    return (
        train.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_overlap"))
        .select("doc_id", "n_overlap", (F.col("n_overlap") >= 2).alias("contaminated"))
        .orderBy("doc_id")
    )


# --- deterministic train/val split -----------------------------------------

@_q(
    "text_train_val_split",
    """
WITH split AS (
  SELECT lang,
         CASE WHEN (instr('0123456789abcdef', substring(md5(CAST(doc_id AS STRING)), 1, 1)) - 1) * 16
                   + (instr('0123456789abcdef', substring(md5(CAST(doc_id AS STRING)), 2, 1)) - 1) < 230
              THEN 'train' ELSE 'val' END AS part
  FROM documents
)
SELECT part, lang, CAST(count(*) AS BIGINT) AS n_docs
FROM split GROUP BY part, lang ORDER BY part, lang
""",
)
def text_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~90/10 train/val split: the first md5 byte of the doc
    key thresholded at 230/256 — stable across runs, machines, and
    engines (md5 hex is identical everywhere), no RNG state to manage,
    and a pure projection at 100 TB (the split column never shuffles;
    only the per-(split, lang) count rollup does)."""
    docs = load_table(spark, sf_dir, "documents")
    hexd = "0123456789abcdef"
    h = F.md5(F.col("doc_id").cast("string"))
    byte0 = (
        (F.instr(F.lit(hexd), F.substring(h, 1, 1)) - 1) * 16
        + (F.instr(F.lit(hexd), F.substring(h, 2, 1)) - 1)
    )
    part = F.when(byte0 < 230, "train").otherwise("val").alias("part")
    return (
        docs.select(part, "lang")
        .groupBy("part", "lang")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .orderBy("part", "lang")
    )
