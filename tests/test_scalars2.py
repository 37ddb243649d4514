"""Late scalar-surface stragglers (functions/scalars2.py): every name
from the reference scalar-registry probe is SQL-callable and gives the
reference's values (pinned constants where the algorithm has published
test vectors)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def engine(spark):
    from presto_db_spark.engine import Engine

    return Engine(spark)


def _one(engine, q):
    return tuple(engine.sql(q).collect()[0])


def test_bitwise(engine):
    assert _one(engine, "SELECT bitwise_and(19,25), bitwise_or(19,25), "
                        "bitwise_xor(19,25), bitwise_not(4), "
                        "bitwise_shift_left(1,7)") == (17, 27, 10, -5, 128)


def test_binary_spellings(engine):
    b64, hx, sha = _one(engine, "SELECT to_base64(CAST('hello' AS VARBINARY)), "
                                "to_hex(CAST('ab' AS VARBINARY)), "
                                "to_hex(sha256(CAST('' AS VARBINARY)))")
    assert b64 == "aGVsbG8="
    assert hx == "6162"
    # SHA-256 of empty input — published constant
    assert sha == "E3B0C44298FC1C149AFBF4C8996FB92427AE41E4649B934CA495991B7852B855"
    rt = _one(engine, "SELECT from_base64(to_base64(CAST('xy' AS VARBINARY))), "
                      "from_hex(to_hex(CAST('zq' AS VARBINARY))), "
                      "from_base64url(to_base64url(CAST('x>y?~' AS VARBINARY)))")
    assert [bytes(v) for v in rt] == [b"xy", b"zq", b"x>y?~"]


def test_big_endian_ieee754(engine):
    assert _one(engine, "SELECT from_big_endian_64(to_big_endian_64(-123456789)), "
                        "from_big_endian_32(to_big_endian_32(77)), "
                        "from_ieee754_64(to_ieee754_64(3.1415))") == (-123456789, 77, 3.1415)


def test_fnv_hmac(engine):
    f1, f1a = _one(engine, "SELECT fnv1_64(CAST('hello' AS VARBINARY)), "
                           "fnv1a_64(CAST('hello' AS VARBINARY))")
    # standard FNV-1 / FNV-1a 64-bit test vectors for 'hello'
    assert f1 == 8883723591023973575
    assert (f1a + (1 << 64)) % (1 << 64) == 0xA430D84680AABD0B
    import hashlib
    import hmac as hm

    got = bytes(_one(engine, "SELECT hmac_sha256(CAST('abc' AS VARBINARY), "
                             "CAST('key' AS VARBINARY))")[0])
    assert got == hm.new(b"key", b"abc", hashlib.sha256).digest()


def test_combine_hash_wraps(engine):
    # Java long wraparound: 31 * Long.MAX_VALUE + 17
    assert _one(engine, "SELECT combine_hash(9223372036854775807, 17)")[0] \
        == ((31 * 9223372036854775807 + 17 + (1 << 63)) % (1 << 64)) - (1 << 63)


def test_normalize_and_multimaps(engine):
    n, d = _one(engine, "SELECT normalize('e\\u0301'), normalize('Å', NFD)")
    assert n == "é" and len(d) == 2  # NFD decomposes the ring
    m = _one(engine, "SELECT split_to_multimap('a=1,a=2,b=3', ',', '=')")[0]
    assert m == {"a": ["1", "2"], "b": ["3"]}
    mm = _one(engine, "SELECT multimap_from_entries("
                      "ARRAY[ROW('k1', 1), ROW('k2', 2), ROW('k1', 3)])")[0]
    assert mm == {"k1": [1, 3], "k2": [2]}


def test_ip_prefix_family(engine):
    assert _one(engine, "SELECT ip_prefix('192.168.43.17', 24), "
                        "ip_subnet_min('192.168.43.0/24'), "
                        "ip_subnet_max('192.168.43.0/24'), "
                        "is_subnet_of('192.0.0.0/8', '192.168.1.1'), "
                        "is_subnet_of('10.0.0.0/8', '192.168.1.1')") == (
        "192.168.43.0/24", "192.168.43.0", "192.168.43.255", True, False)
    rng = _one(engine, "SELECT ip_subnet_range('2001:db8::/48')")[0]
    assert rng[0] == "2001:db8::"


def test_distribution_cdfs(engine):
    b, ib, inz = _one(engine, "SELECT round(beta_cdf(2.0, 5.0, 0.3), 6), "
                              "round(inverse_beta_cdf(2.0, 5.0, 0.5), 6), "
                              "round(inverse_normal_cdf(0, 1, 0.975), 4)")
    assert b == pytest.approx(0.579825, abs=1e-6)   # scipy.stats.beta.cdf(0.3,2,5)
    assert ib == pytest.approx(0.264450, abs=1e-5)  # beta.ppf(0.5,2,5)
    assert inz == pytest.approx(1.9600, abs=1e-4)
    # round-trip: inverse(beta_cdf(x)) == x
    rt = _one(engine, "SELECT round(inverse_beta_cdf(3.0, 2.0, "
                      "beta_cdf(3.0, 2.0, 0.42)), 6)")[0]
    assert rt == pytest.approx(0.42, abs=1e-5)


def test_misc_spellings(engine):
    assert _one(engine, "SELECT regexp_split('a1b2c', '[0-9]')")[0] == ["a", "b", "c"]
    wl, wu = _one(engine, "SELECT round(wilson_interval_lower(100, 1000, 1.96), 6), "
                          "round(wilson_interval_upper(100, 1000, 1.96), 6)")
    assert wl == pytest.approx(0.082909, abs=1e-6)
    assert wu == pytest.approx(0.120152, abs=1e-6)
    p, q = _one(engine, "SELECT url_extract_port('http://example.com:8080/x'), "
                        "url_extract_port('http://example.com/x')")
    assert (p, q) == (8080, None)
    t = _one(engine, "SELECT localtime")[0]
    assert len(t.split(":")) == 3
    with pytest.raises(Exception):
        engine.sql("SELECT fail('boom')").collect()


def test_qdigest_accessors(engine):
    qs = _one(engine, "SELECT quantiles_at_values(tdigest_agg(x), "
                      "ARRAY[1.0, 3.0]) FROM (VALUES (1.0),(2.0),(3.0)) t(x)")[0]
    assert qs[0] < 0.5 < qs[1]
    v = _one(engine, "SELECT value_at_quantile("
                     "scale_qdigest(qdigest_agg(x), 2.0), 0.5) "
                     "FROM (VALUES (1.0),(2.0),(3.0)) t(x)")[0]
    assert v == 2.0


def test_agg_compat_surface(engine):
    """Aggregate-registry stragglers (functions/aggcompat.py +
    dialect templates): approx_set/merge_hll over Spark's native HLL,
    first-seen-wins map_union, bounded-state pandas aggs."""
    e1 = _one(engine, "SELECT hll_sketch_estimate(approx_set(x)) "
                      "FROM (VALUES (1),(2),(3),(2)) t(x)")[0]
    assert e1 == 3
    e2 = _one(engine, "SELECT hll_sketch_estimate(merge_hll(s)) FROM "
                      "(SELECT approx_set(x) s FROM (VALUES (1,1),(2,1),(3,2)) "
                      "t(x, g) GROUP BY g)")[0]
    assert e2 == 3
    u = _one(engine, "SELECT map_union(m) FROM (VALUES "
                     "(MAP(ARRAY['a','b'], ARRAY[1,2])), "
                     "(MAP(ARRAY['b','c'], ARRAY[9,3]))) t(m)")[0]
    assert u == {"a": 1, "b": 2, "c": 3}  # first-seen b wins
    h = _one(engine, "SELECT numeric_histogram(5, x) FROM "
                     "(VALUES (1.0),(2.0),(3.0),(9.0),(10.0)) t(x)")[0]
    assert sum(h.values()) == 5.0 and len(h) <= 5
    de = _one(engine, "SELECT differential_entropy(100, x) FROM "
                      "(VALUES (1.0),(2.0),(3.0),(4.0),(5.0),(6.0)) t(x)")[0]
    assert de == pytest.approx(2.58, abs=0.5)  # ~log2(6) for uniform spacing
    s = _one(engine, "SELECT evaluate_classifier_predictions(t, p) FROM "
                     "(VALUES ('a','a'),('a','b'),('b','b')) z(t, p)")[0]
    assert s.startswith("Accuracy: 2/3 (66.67%)\n")
    assert "Class 'a'\nPrecision: 1/1 (100.00%)\nRecall: 1/2 (50.00%)" in s


def test_format_datetime_and_to_milliseconds(engine, spark):
    """format_datetime mirrors parse_datetime (DateTimeFunctions.java
    formatDatetime): a LITERAL Joda format rewrites to JVM date_format
    (no Python stage), a non-literal format falls back to the UDF;
    to_milliseconds converts INTERVAL DAY TO SECOND exactly."""
    assert _one(
        engine,
        "SELECT format_datetime(TIMESTAMP '2001-02-03 04:05:06', "
        "'yyyy/MM/dd HH:mm:ss')",
    ) == ("2001/02/03 04:05:06",)
    # round-trip with parse_datetime on the shared Joda subset
    assert _one(
        engine,
        "SELECT format_datetime(parse_datetime('2019-11-27 08:30', "
        "'yyyy-MM-dd HH:mm'), 'dd MMM yyyy')",
    ) == ("27 Nov 2019",)
    # literal path stays JVM-side
    df = engine.sql(
        "SELECT format_datetime(TIMESTAMP '2001-02-03 04:05:06', 'yyyy-MM-dd') v"
    )
    assert "EvalPython" not in df._jdf.queryExecution().executedPlan().toString()
    # non-literal format goes through the UDF and still matches
    assert _one(
        engine,
        "SELECT format_datetime(TIMESTAMP '2001-02-03 04:05:06', "
        "concat('yyyy', '/MM'))",
    ) == ("2001/02",)
    assert _one(
        engine,
        "SELECT to_milliseconds(INTERVAL '1 02:03:04.5' DAY TO SECOND), "
        "to_milliseconds(INTERVAL '2' DAY)",
    ) == (93784500, 172800000)


def test_combinations_template(engine):
    """combinations(array, n) (CombinationsFunction.java): type-generic
    dialect template, lexicographic index order, n capped at 5 like the
    reference."""
    assert _one(
        engine, "SELECT combinations(ARRAY['foo','bar','baz'], 2)"
    ) == ([["foo", "bar"], ["foo", "baz"], ["bar", "baz"]],)
    assert _one(engine, "SELECT combinations(ARRAY[1,2,3,4], 3)") == (
        [[1, 2, 3], [1, 2, 4], [1, 3, 4], [2, 3, 4]],
    )
    assert _one(engine, "SELECT combinations(ARRAY[1,2], 0)") == ([[]],)
    assert _one(engine, "SELECT combinations(sequence(1,5), 5)") == (
        [[1, 2, 3, 4, 5]],
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="must not exceed 5"):
        engine.sql("SELECT combinations(ARRAY[1], 6)").collect()


def test_timezone_offset_and_week_of_year(engine):
    """timezone_hour/minute = session-zone offset (UTC session → 0; the
    documented zone-less-timestamp model), week_of_year = ISO week."""
    assert _one(
        engine,
        "SELECT timezone_hour(TIMESTAMP '2001-08-22 03:04:05'), "
        "timezone_minute(TIMESTAMP '2001-08-22 03:04:05'), "
        "week_of_year(DATE '2001-08-22'), week(DATE '2001-08-22')",
    ) == (0, 0, 34, 34)


def test_format_datetime_joda_widths_nonliteral(engine):
    """Review regression: the non-literal UDF path must match the
    literal JVM path's Joda width semantics — single-letter fields
    unpadded, SSS = 3-digit milliseconds."""
    got = _one(
        engine,
        "SELECT format_datetime(TIMESTAMP '2001-02-03 04:05:06.007', "
        "concat('M', '/d/yyyy H:m:s.SSS')), "
        "format_datetime(TIMESTAMP '2001-02-03 04:05:06.007', "
        "'M/d/yyyy H:m:s.SSS')",
    )
    assert got[0] == got[1] == "2/3/2001 4:5:6.007"


def test_combinations_null_and_negative(engine):
    """NULL n propagates NULL; a NULL array propagates NULL for EVERY n
    including 0 (the n=0 branch used to yield [NULL] via
    array(slice(NULL,1,0))); negative n carries the reference's message
    (ArrayCombinationsFunction.java:59)."""
    assert _one(engine, "SELECT combinations(ARRAY[1,2], CAST(NULL AS INT))") == (None,)
    for n in (0, 1, 2, 5):
        assert _one(
            engine,
            f"SELECT combinations(CAST(NULL AS ARRAY<INT>), {n})",
        ) == (None,), f"combinations(NULL, {n}) must be NULL"
    import pytest as _pytest

    with _pytest.raises(Exception, match="must not be negative"):
        engine.sql("SELECT combinations(ARRAY[1], -1)").collect()


def test_joda_unknown_letters_raise():
    """Both Joda directions must refuse unknown unquoted pattern letters
    (Joda's IllegalArgumentException) rather than silently treating them
    as literal text — but quoted literals still pass through."""
    import pytest as _pytest

    from presto_db_spark.functions.presto import (
        _format_datetime_py, _joda_to_py,
    )
    from datetime import datetime

    ts = datetime(2001, 2, 3, 4, 5, 6, 789000)
    # full-alphabet fields render real values (these used to leak as text)
    assert _format_datetime_py(ts, "S") == "7"
    assert _format_datetime_py(ts, "SS") == "78"
    assert _format_datetime_py(ts, "yyy") == "2001"
    assert _format_datetime_py(ts, "D") == "34"
    assert _format_datetime_py(ts, "K:k") == "4:4"
    assert _format_datetime_py(ts, "e E") == "6 Sat"
    with _pytest.raises(ValueError, match="Illegal pattern"):
        _format_datetime_py(ts, "yyyy-QQ")  # Q: not a Joda field
    with _pytest.raises(ValueError, match="Illegal pattern"):
        _joda_to_py("yyyy-MM-dd X")
    # quoted literals are not pattern letters
    assert _format_datetime_py(ts, "yyyy'X'") == "2001X"
    assert _joda_to_py("'T'HH") == "T%H"
