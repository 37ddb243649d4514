"""BPE wrapped-string encoding properties (round 9).

``text_bpe_train_rounds`` / ``text_bpe_encode`` rest on one subtle claim:
with every symbol wrapped in chr(2), the whole-symbol merge of pair
(x, y) is exactly one ``replace`` of "\\x02x\\x02\\x02y\\x02" with
"\\x02xy\\x02" — greedy left-to-right, non-overlapping, and immune to
mid-symbol false matches.  These tests pin the property on the exact
adversarial inputs where a naive encoding breaks, in BOTH engines.
"""

from __future__ import annotations

import duckdb
import pytest

W = "\x02"  # symbol wrapper


def _enc(syms: list[str]) -> str:
    return "".join(W + s + W for s in syms)


def _merge_expr(x: str, y: str) -> tuple[str, str]:
    return W + x + W + W + y + W, W + x + y + W


CASES = [
    # (symbols, pair, expected symbols after ONE merge pass)
    (["a", "a", "a"], ("a", "a"), ["aa", "a"]),        # greedy LTR, no re-merge
    (["a", "a", "a", "a"], ("a", "a"), ["aa", "aa"]),  # adjacent candidates
    (["ax", "yb"], ("x", "y"), ["ax", "yb"]),          # mid-symbol: NO match
    (["a", "ab", "ab"], ("a", "ab"), ["aab", "ab"]),   # merged token not re-merged
    (["aa", "a", "a"], ("a", "a"), ["aa", "aa"]),      # left context can't shift match
    (["x", "y", "x", "y"], ("x", "y"), ["xy", "xy"]),
]


@pytest.mark.parametrize("syms,pair,want", CASES)
def test_wrapped_merge_property_spark(spark, syms, pair, want):
    pat, rep = _merge_expr(*pair)
    got = spark.sql(
        "SELECT split(substring(e, 2, length(e) - 2), concat(chr(2), chr(2))) s "
        "FROM (SELECT replace(:e, :p, :r) e)",
        args={"e": _enc(syms), "p": pat, "r": rep},
    ).collect()[0]["s"]
    assert got == want, (syms, pair, got)


@pytest.mark.parametrize("syms,pair,want", CASES)
def test_wrapped_merge_property_duckdb(syms, pair, want):
    pat, rep = _merge_expr(*pair)
    got = duckdb.sql(
        "SELECT string_split(e[2:length(e) - 1], chr(2) || chr(2)) s "
        f"FROM (SELECT replace('{_enc(syms)}', '{pat}', '{rep}') e)"
    ).fetchall()[0][0]
    assert got == want, (syms, pair, got)


def test_initial_encoding_round_trips(spark):
    # char-level encoding of a word then split must give back the chars
    got = spark.sql(
        "SELECT split(substring(e, 2, length(e) - 2), concat(chr(2), chr(2))) s "
        "FROM (SELECT concat_ws('', transform(sequence(1, length('spark')), "
        "i -> concat(chr(2), substring('spark', i, 1), chr(2)))) e)"
    ).collect()[0]["s"]
    assert got == list("spark")
