"""Third-engine cross-checks: Spark results vs independent numpy/python
reference implementations of the r13 statistics.

The family sweeps prove Spark == DuckDB; a shared misreading of a
definition would slip through that pair.  These tests recompute each
statistic from the raw parquet with plain numpy/python (no SQL at all)
and require the Spark answer to match to quantization error — the same
evidence class as test_math_props' algebraic pins, but end-to-end
against the fixture data.
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pyarrow.parquet as pq

from presto_db_spark.registry import all_queries


def _events(sf_dir):
    t = pq.read_table(f"{sf_dir}/events.parquet").to_pydict()
    return t


def _daily_counts(sf_dir):
    t = _events(sf_dir)
    out = defaultdict(lambda: defaultdict(int))
    for ts, et in zip(t["ts"], t["event_type"]):
        out[et][ts.date()] += 1
    return {et: [n for _, n in sorted(d.items())] for et, d in out.items()}


def _daily_cents(sf_dir):
    t = _events(sf_dir)
    out = defaultdict(lambda: defaultdict(int))
    for ts, et, v in zip(t["ts"], t["event_type"], t["value"]):
        out[et][ts.date()] += int(np.round(v * 100))
    return {et: [n for _, n in sorted(d.items())] for et, d in out.items()}


def test_trimmed_winsorized_vs_numpy(spark, sf_dir):
    row = all_queries()["agg_trimmed_winsorized"](spark, sf_dir).collect()[0]
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"]
    )["l_extendedprice"].to_numpy()
    x = np.sort(np.round(li * 100).astype(np.int64))
    n = len(x)
    lo = n * 10 // 100
    tm = x[lo:n - lo].mean()
    wx = x.copy()
    wx[:lo] = x[lo]
    wx[n - lo:] = x[n - lo - 1]
    assert abs(row.trimmed_mean_micros / 1e6 - tm) < 1e-5
    assert abs(row.winsor_mean_micros / 1e6 - wx.mean()) < 1e-5
    assert row.v_lo_cents == x[lo] and row.v_hi_cents == x[n - lo - 1]


def test_hodges_lehmann_vs_python(spark, sf_dir):
    row = all_queries()["agg_hodges_lehmann"](spark, sf_dir).collect()[0]
    t = _events(sf_dir)
    days = defaultdict(int)
    for ts in t["ts"]:
        days[ts.date()] += 1
    xs = np.array([n for _, n in sorted(days.items())], dtype=np.int64)
    walsh = np.sort(np.add.outer(xs, xs)[np.triu_indices(len(xs))])
    nw = len(walsh)
    med_lower = walsh[nw // 2] if nw % 2 else walsh[nw // 2 - 1]
    assert row.hl_micros == int(med_lower) * 500000
    assert row.n_walsh == nw


def test_mann_kendall_vs_python(spark, sf_dir):
    rows = all_queries()["agg_mann_kendall_trend"](spark, sf_dir).collect()
    series = _daily_counts(sf_dir)
    for r in rows:
        xs = series[r.event_type]
        s = sum(
            int(np.sign(xs[j] - xs[i]))
            for i in range(len(xs))
            for j in range(i + 1, len(xs))
        )
        assert r.s_stat == s, (r.event_type, r.s_stat, s)
        n = len(xs)
        assert r.var_s == n * (n - 1) * (2 * n + 5) // 18


def test_jarque_bera_vs_numpy(spark, sf_dir):
    rows = all_queries()["events_jarque_bera"](spark, sf_dir).collect()
    rev = _daily_cents(sf_dir)
    for r in rows:
        x = np.array(rev[r.event_type], dtype=float)
        d = x - x.mean()
        g1 = (d**3).mean() / (d**2).mean() ** 1.5
        g2 = (d**4).mean() / (d**2).mean() ** 2 - 3
        jb = len(x) / 6 * (g1 * g1 + g2 * g2 / 4)
        assert abs(r.skew_e6 / 1e6 - g1) < 1e-5
        assert abs(r.jb_e6 / 1e6 - jb) < 1e-4


def test_kaplan_meier_vs_python(spark, sf_dir):
    rows = all_queries()["events_kaplan_meier"](spark, sf_dir).collect()
    t = _events(sf_dir)
    first_p = {}
    last_any = {}
    import datetime

    day0 = datetime.date(2024, 1, 1)
    for ts, et, u in zip(t["ts"], t["event_type"], t["user_id"]):
        d = (ts.date() - day0).days + 1
        last_any[u] = max(last_any.get(u, 0), d)
        if et == "purchase":
            first_p[u] = min(first_p.get(u, 10**9), d)
    obs = [
        (first_p.get(u, last_any[u]), 1 if u in first_p else 0)
        for u in last_any
    ]
    lt = defaultdict(lambda: [0, 0])
    for tt, ev in obs:
        lt[tt][0 if ev else 1] += 1
    n_total = len(obs)
    s = 10**9
    cum = 0
    km = {}
    for tt in sorted(lt):
        d, c = lt[tt]
        n_at = n_total - cum
        s = s * (n_at - d) // n_at
        km[tt] = (d, c, n_at, s)
        cum += d + c
    for r in rows:
        assert (r.deaths, r.censored, r.at_risk, r.s_e9) == km[r.t], r


def test_pacf_vs_numpy_durbin_levinson(spark, sf_dir):
    rows = all_queries()["events_pacf_yw"](spark, sf_dir).collect()
    rev = _daily_cents(sf_dir)
    for r in rows:
        x = np.array(rev[r.event_type], dtype=float)
        xm = x - x.mean()
        n = len(x)
        c = [float((xm[: n - k] * xm[k:]).sum()) for k in range(4)]
        r1, r2, r3 = c[1] / c[0], c[2] / c[0], c[3] / c[0]
        f22 = (r2 - r1 * r1) / (1 - r1 * r1)
        f21 = r1 * (1 - f22)
        f33 = (r3 - f21 * r2 - f22 * r1) / (1 - f21 * r1 - f22 * r2)
        assert abs(r.pacf1_e6 / 1e6 - r1) < 1e-5
        assert abs(r.pacf2_e6 / 1e6 - f22) < 1e-5
        assert abs(r.pacf3_e6 / 1e6 - f33) < 1e-5


def test_g_test_vs_python(spark, sf_dir):
    row = all_queries()["events_g_test"](spark, sf_dir).collect()[0]
    t = _events(sf_dir)
    cells = defaultdict(int)
    for et, u in zip(t["event_type"], t["user_id"]):
        cells[(et, u % 2)] += 1
    nn = sum(cells.values())
    rr = defaultdict(int)
    cc = defaultdict(int)
    for (et, a), c in cells.items():
        rr[et] += c
        cc[a] += c
    g = 2 * sum(
        c * math.log(c * nn / (rr[et] * cc[a]))
        for (et, a), c in cells.items()
    )
    assert abs(row.g_e6 / 1e6 - g) < 1e-4


def test_ndcg_vs_python(spark, sf_dir):
    rows = all_queries()["ml_ndcg_at_k"](spark, sf_dir).collect()
    t = _events(sf_dir)
    import datetime

    cut = datetime.date(2024, 1, 15)
    agg = defaultdict(lambda: [0, 0])
    for ts, et, u in zip(t["ts"], t["event_type"], t["user_id"]):
        agg[(et, u)][0 if ts.date() <= cut else 1] += 1
    by = defaultdict(list)
    for (et, u), (n1, n2) in agg.items():
        if n1 >= 1:
            by[et].append((u, n1, min(n2, 3)))
    disc = [round(1e9 / math.log2(i + 1)) for i in range(1, 11)]
    for r in rows:
        cand = by[r.event_type]
        ranked = sorted(cand, key=lambda p: (-p[1], p[0]))[:10]
        ideal = sorted(cand, key=lambda p: (-p[2], p[0]))[:10]
        dcg = sum(rel * d for (_, _, rel), d in zip(ranked, disc))
        idcg = sum(rel * d for (_, _, rel), d in zip(ideal, disc))
        assert (r.dcg_e9, r.idcg_e9) == (dcg, idcg), r.event_type
        assert r.ndcg_e6 == dcg * 10**6 // idcg
