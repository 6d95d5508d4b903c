"""Round-12 operators: Wilson intervals, pooled-rank statistics
(Spearman / Kruskal-Wallis), Benjamini-Hochberg FDR, Bradley-Terry
preference fitting, simplified silhouette.

The registry gate (tools/check_correctness.py) proves oracle parity;
these tests pin each statistic against an INDEPENDENT brute-force
Python implementation on small fixtures (the oracle and the Spark side
share the algebraic rearrangement — a second algorithm is the check
that the rearrangement itself is right), plus the semantic invariants
(tie handling, smoothing, degenerate guards).
"""

from __future__ import annotations

import math

import pytest

from access_mopper_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _events_fixture(tmp_path, rows):
    """rows: list of (event_type, iso_ts, value)."""
    import pandas as pd
    pdf = pd.DataFrame({
        "event_id": range(len(rows)),
        "ts": pd.to_datetime([t for _, t, _ in rows]),
        "user_id": [1] * len(rows),
        "event_type": [e for e, _, _ in rows],
        "value": [v for _, _, v in rows],
        "props": [None] * len(rows),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")
    return str(d)


# ---------------------------------------------------------------- wilson

def test_wilson_matches_textbook_formula(spark, tmp_path):
    rows = ([("a", "2024-01-01 01:00:00", 60.0)] * 7
            + [("a", "2024-01-01 02:00:00", 10.0)] * 3
            + [("b", "2024-01-01 03:00:00", 99.0)] * 2)
    d = _events_fixture(tmp_path, rows)
    out = {r["event_type"]: r
           for r in QUERIES["q_wilson_interval"](spark, d).collect()}
    z = 1.96
    for et, n, s in [("a", 10, 7), ("b", 2, 2)]:
        got = out[et]
        assert (got["n"], got["s"]) == (n, s)
        assert got["rate_bp"] == s * 10000 // n
        ph = s / n
        denom = 1 + z * z / n
        center = ph + z * z / (2 * n)
        marg = z * math.sqrt(ph * (1 - ph) / n + z * z / (4 * n * n))
        assert got["wilson_lo"] == pytest.approx((center - marg) / denom,
                                                 abs=2e-6)
        assert got["wilson_hi"] == pytest.approx((center + marg) / denom,
                                                 abs=2e-6)
        assert 0.0 <= got["wilson_lo"] <= got["wilson_hi"] <= 1.0


# -------------------------------------------------------------- spearman

def _midranks(vals):
    """value -> average rank (1-based) with ties."""
    order = sorted(set(vals))
    below, out = 0, {}
    for v in order:
        c = vals.count(v)
        out[v] = below + (c + 1) / 2
        below += c
    return [out[v] for v in vals]


def test_spearman_matches_pearson_on_midranks(spark, tmp_path):
    data = [(0, 100), (0, 100), (1, 150), (2, 90), (2, 90), (5, 200),
            (7, 90), (9, 210), (13, 300), (13, 100), (22, 50), (23, 400)]
    rows = [("probe", f"2024-01-01 {h:02d}:15:00", c / 100.0)
            for h, c in data]
    d = _events_fixture(tmp_path, rows)
    got = QUERIES["q_spearman_rho"](spark, d).collect()[0]
    xs = _midranks([h for h, _ in data])
    ys = _midranks([c for _, c in data])
    n = len(data)
    mx = sum(xs) / n
    my = sum(ys) / n
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    sxx = sum((x - mx) ** 2 for x in xs)
    syy = sum((y - my) ** 2 for y in ys)
    rho = sxy / math.sqrt(sxx * syy)
    assert got["n"] == n

    def dq(midrank):  # doubled rank -> quantized deviation, trunc to 0
        num = (int(2 * midrank) - (n + 1)) * 100000
        return num // (2 * n) if num >= 0 else -((-num) // (2 * n))

    qxy = sum(dq(x) * dq(y) for x, y in zip(xs, ys))
    qxx = sum(dq(x) ** 2 for x in xs)
    qyy = sum(dq(y) ** 2 for y in ys)
    assert got["sxy"] == qxy
    assert got["sxx"] == qxx
    assert got["syy"] == qyy
    # quantized rho tracks the exact midrank rho to the grid resolution
    assert got["rho"] == pytest.approx(rho, abs=5e-4)
    assert got["rho"] == pytest.approx(qxy / math.sqrt(qxx * qyy),
                                       abs=2e-6)


def test_spearman_degenerate_constant_axis(spark, tmp_path):
    rows = [("probe", "2024-01-01 03:00:00", v) for v in (1.0, 2.0, 3.0)]
    d = _events_fixture(tmp_path, rows)
    got = QUERIES["q_spearman_rho"](spark, d).collect()[0]
    assert got["sxx"] == 0 and got["rho"] is None


# -------------------------------------------------------- kruskal-wallis

def test_kruskal_wallis_integer_cores(spark, tmp_path):
    groups = {"a": [100, 100, 300], "b": [200, 50], "c": [300, 300, 400]}
    rows = [(g, "2024-01-01 05:00:00", c / 100.0)
            for g, cs in groups.items() for c in cs]
    d = _events_fixture(tmp_path, rows)
    out = {r["event_type"]: r
           for r in QUERIES["q_kruskal_wallis"](spark, d).collect()}
    pooled = [c for cs in groups.values() for c in cs]
    rk = dict(zip(pooled, _midranks(pooled)))
    n = len(pooled)
    c_bp = (n + 1) * 10000 // (2 * n)
    h_terms = 0.0
    for g, cs in groups.items():
        r2 = sum(int(2 * rk[c]) for c in cs)
        assert out[g]["n_t"] == len(cs)
        assert out[g]["r2_sum"] == r2
        bp = r2 * 10000 // (2 * len(cs) * n)
        assert out[g]["rbar_bp"] == bp
        h_terms += len(cs) * (bp - c_bp) ** 2
    h_quant = 12 * n * h_terms / ((n + 1) * 1e8)
    for g in groups:
        assert out[g]["n_groups"] == 3
        assert out[g]["h_quant"] == pytest.approx(h_quant, abs=2e-6)


def test_kruskal_wallis_identical_groups_h_near_zero(spark, tmp_path):
    rows = [(g, "2024-01-01 05:00:00", v)
            for g in ("a", "b") for v in (1.0, 2.0, 3.0, 4.0)]
    d = _events_fixture(tmp_path, rows)
    out = QUERIES["q_kruskal_wallis"](spark, d).collect()
    # identical distributions -> mean ranks equal the null center
    # exactly -> S = 0 -> H = 0
    assert all(r["h_quant"] == 0.0 for r in out)


# --------------------------------------------------- benjamini-hochberg

def test_bh_step_up_rule_matches_brute(spark, tmp_path):
    # one wildly shifted cell among flat ones.  With m cells of equal
    # count n_i, the shifted cell's z^2 saturates at ~n_i*(m-1) (the
    # shift inflates the pooled variance too), so n_i = 40 is needed
    # for the rational proxy 1/(1+z^2) to cross the rank-1 threshold
    # alpha/m = 0.0125 — the proxy is deliberately fat-tailed; real
    # slice scans have thousands of rows per cell.
    rows = ([("a", "2024-01-01 01:00:00", 10.0)] * 40
            + [("a", "2024-01-01 02:00:00", 10.2)] * 40
            + [("a", "2024-01-01 03:00:00", 9.9)] * 40
            + [("b", "2024-01-01 04:00:00", 500.0)] * 40)
    d = _events_fixture(tmp_path, rows)
    out = QUERIES["q_benjamini_hochberg"](spark, d).collect()
    m = len(out)
    assert m == 4
    # brute: same p-proxy, textbook step-up
    cells = sorted(out, key=lambda r: (r["p_e9"], r["event_type"], r["h"]))
    km = 0
    for k, r in enumerate(cells, 1):
        if r["p_e9"] * m <= k * 50_000_000:
            km = k
    for k, r in enumerate(cells, 1):
        assert r["rank"] == k
        assert r["rejected"] == (k <= km)
    # the shifted cell must be rejected, and p is monotone in the shift
    by_cell = {(r["event_type"], r["h"]): r for r in out}
    assert by_cell[("b", 4)]["rejected"]
    assert by_cell[("b", 4)]["p_e9"] == min(r["p_e9"] for r in out)


def test_bh_no_rejections_when_flat(spark, tmp_path):
    rows = [("a", f"2024-01-01 {h:02d}:00:00", 10.0) for h in range(4)
            for _ in range(5)]
    d = _events_fixture(tmp_path, rows)
    out = QUERIES["q_benjamini_hochberg"](spark, d).collect()
    # zero variance -> p = 1.0 everywhere -> nothing rejected
    assert all(not r["rejected"] for r in out)
    assert all(r["p_e9"] == 1_000_000_000 for r in out)


# ------------------------------------------------------- bradley-terry

def test_bradley_terry_matches_brute_mm(spark, tmp_path):
    import pandas as pd
    # orders with brand duels: brand A dominates
    li = []
    pt = pd.DataFrame({"p_partkey": [1, 2, 3],
                       "p_name": ["x", "y", "z"],
                       "p_brand": ["A", "B", "C"],
                       "p_type": ["t"] * 3, "p_size": [1] * 3,
                       "p_retailprice": [1.0] * 3})
    okey = 0
    for qa, qb in [(5, 1), (4, 2), (3, 4), (6, 1)]:   # A vs B
        okey += 1
        li += [(okey, 1, qa), (okey, 2, qb)]
    for qa, qc in [(5, 2), (2, 3)]:                   # A vs C
        okey += 1
        li += [(okey, 1, qa), (okey, 3, qc)]
    ldf = pd.DataFrame(li, columns=["l_orderkey", "l_partkey",
                                    "l_quantity"])
    ldf["l_quantity"] = ldf["l_quantity"].astype(float)
    d = tmp_path / "sf"
    d.mkdir()
    ldf.to_parquet(d / "lineitem.parquet")
    pt.to_parquet(d / "part.parquet")
    out = {r["brand"]: r
           for r in QUERIES["q_bradley_terry"](spark, str(d)).collect()}
    # brute: wins / comparisons
    wins = {"A": 3 + 1, "B": 1, "C": 1}
    cmps = {"A": 6, "B": 4, "C": 2}
    s1 = {b: (2 * wins[b] + 1) * 1_000_000 // (cmps[b] + 1)
          for b in wins}
    n_ij = {("A", "B"): 4, ("A", "C"): 2}
    d_i = {}
    for b in wins:
        tot = 0
        for (x, y), nij in n_ij.items():
            if b in (x, y):
                o = y if b == x else x
                tot += int(math.floor(nij * 1e12 / (s1[b] + s1[o]) + 0.5))
        d_i[b] = tot
    for b in wins:
        assert (out[b]["wins"], out[b]["comparisons"]) == (wins[b],
                                                           cmps[b])
        assert out[b]["s1_e6"] == s1[b]
        assert out[b]["s2_e6"] == wins[b] * 10 ** 12 // d_i[b]
    # dominance ordering survives both iterations
    assert out["A"]["s2_e6"] > out["B"]["s2_e6"]
    assert out["A"]["s2_e6"] > out["C"]["s2_e6"]


def test_bradley_terry_ties_are_skipped(spark, tmp_path):
    import pandas as pd
    pt = pd.DataFrame({"p_partkey": [1, 2], "p_name": ["x", "y"],
                       "p_brand": ["A", "B"], "p_type": ["t"] * 2,
                       "p_size": [1] * 2, "p_retailprice": [1.0] * 2})
    ldf = pd.DataFrame([(1, 1, 3.0), (1, 2, 3.0)],
                       columns=["l_orderkey", "l_partkey", "l_quantity"])
    d = tmp_path / "sf"
    d.mkdir()
    ldf.to_parquet(d / "lineitem.parquet")
    pt.to_parquet(d / "part.parquet")
    assert QUERIES["q_bradley_terry"](spark, str(d)).count() == 0


# -------------------------------------------------- simplified silhouette

def test_silhouette_matches_numpy_brute(spark, tmp_path):
    import numpy as np
    import pandas as pd
    rng = [
        ([0.1, 0.1], 0), ([0.12, 0.08], 0), ([0.09, 0.11], 0),
        ([-0.3, -0.3], 1), ([-0.28, -0.33], 1), ([-0.31, -0.29], 1),
        ([0.1, -0.3], 2), ([0.08, -0.28], 2),
    ]
    pdf = pd.DataFrame({
        "vec_id": range(len(rng)),
        "embedding": [np.array(v, dtype=np.float32) for v, _ in rng],
        "label": [l for _, l in rng],
    })
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "embeddings.parquet")
    out = {r["label"]: r for r in
           QUERIES["q_simplified_silhouette"](spark, str(d)).collect()}
    # brute with the same e6 quantization
    q = {i: [int(math.floor(float(np.float32(x)) * 1e6 + 0.5))
             for x in v] for i, (v, _) in enumerate(rng)}
    labels = {i: l for i, (_, l) in enumerate(rng)}
    cents = {}
    for lab in set(labels.values()):
        pts = [q[i] for i in q if labels[i] == lab]
        cents[lab] = [int(sum(col) / len(pts))
                      if sum(col) >= 0 else -(-sum(col) // len(pts))
                      for col in zip(*pts)]
    sums = {lab: [] for lab in cents}
    for i, qe in q.items():
        d2 = {lab: sum((a - b) ** 2 for a, b in zip(qe, c))
              for lab, c in cents.items()}
        a = d2[labels[i]]
        b = min(v for lab, v in d2.items() if lab != labels[i])
        sil = int(math.floor((b - a) / max(a, b) * 1e6 + 0.5))
        sums[labels[i]].append(sil)
    for lab, sils in sums.items():
        assert out[lab]["n_points"] == len(sils)
        assert out[lab]["sum_sil_e6"] == sum(sils)
    # well-separated fixture: every cluster strongly positive
    assert all(out[lab]["mean_sil"] > 0.5 for lab in sums)


# ------------------------------------------------------------- ipw-ate

def _md5_lane(prefix, key, mod):
    import hashlib
    return int(hashlib.md5(f"{prefix}{key}".encode()).hexdigest()[:8],
               16) % mod


def test_ipw_ate_matches_brute(spark, tmp_path):
    import pandas as pd
    rows, vals = [], {}
    for eid in range(200):
        h = eid % 3  # 3 strata
        t = _md5_lane("ipw:", eid, 2)
        # treated rows get a +2.00 lift in stratum 2 only
        v = 10.0 + h + (2.0 if (t == 1 and h == 2) else 0.0)
        rows.append((eid, f"2024-01-01 {h:02d}:30:00", v))
        vals[eid] = (h, t, int(v * 100))
    pdf = pd.DataFrame({
        "event_id": [e for e, _, _ in rows],
        "ts": pd.to_datetime([t for _, t, _ in rows]),
        "user_id": [1] * len(rows),
        "event_type": ["x"] * len(rows),
        "value": [v for _, _, v in rows],
        "props": [None] * len(rows),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")
    got = QUERIES["q_ipw_ate"](spark, str(d)).collect()[0]
    # brute per stratum
    strat_e4 = ipw_t = ipw_c = n = nt = 0
    for h in range(3):
        g = [(t, y) for (hh, t, y) in vals.values() if hh == h]
        nts = sum(1 for t, _ in g if t == 1)
        ncs = len(g) - nts
        assert nts > 0 and ncs > 0
        yt = sum(y for t, y in g if t == 1)
        yc = sum(y for t, y in g if t == 0)
        n += len(g)
        nt += nts
        strat_e4 += len(g) * (yt * 10000 // nts - yc * 10000 // ncs)
        ipw_t += int(math.floor(yt * len(g) / nts + 0.5))
        ipw_c += int(math.floor(yc * len(g) / ncs + 0.5))
    assert (got["n"], got["nt"], got["n_strata"]) == (n, nt, 3)
    assert got["strat_e4"] == strat_e4
    assert (got["ipw_t"], got["ipw_c"]) == (ipw_t, ipw_c)
    # randomized assignment, lift only in stratum 2: both estimators
    # should land near lift * P(stratum 2) = 2.0 / 3
    assert got["ate_strat"] == pytest.approx(strat_e4 / (n * 1e6), abs=1e-6)
    assert 0.3 < got["ate_strat"] < 1.1
    assert 0.3 < got["ate_ipw"] < 1.1


# ------------------------------------------------------ conformal

def test_conformal_quantile_and_coverage_brute(spark, tmp_path):
    import pandas as pd
    rows = []
    for eid in range(300):
        h = eid % 2
        v = 10.0 + h * 5 + (eid % 7) * 0.5  # spread of residuals
        rows.append((eid, f"2024-01-01 {h:02d}:00:00", v))
    pdf = pd.DataFrame({
        "event_id": [e for e, _, _ in rows],
        "ts": pd.to_datetime([t for _, t, _ in rows]),
        "user_id": [1] * len(rows),
        "event_type": ["x"] * len(rows),
        "value": [v for _, _, v in rows],
        "props": [None] * len(rows),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")
    got = QUERIES["q_conformal_interval"](spark, str(d)).collect()[0]
    # brute
    lanes = {e: _md5_lane("cfp:", e, 2) for e, _, _ in rows}
    cents = {e: int(round(v * 100)) for e, _, v in rows}
    hour = {e: e % 2 for e, _, _ in rows}
    cal = [e for e in lanes if lanes[e] == 0]
    tst = [e for e in lanes if lanes[e] == 1]
    pred = {}
    for h in (0, 1):
        ys = [cents[e] for e in cal if hour[e] == h]
        pred[h] = sum(ys) // len(ys)
    res = sorted(abs(cents[e] - pred[hour[e]]) for e in cal)
    k = -(-(9 * (len(cal) + 1)) // 10)  # ceil(0.9*(n+1))
    r_star = res[k - 1]
    n_cov = sum(1 for e in tst
                if abs(cents[e] - pred[hour[e]]) <= r_star)
    assert (got["n_cal"], got["k"]) == (len(cal), k)
    assert got["r_star"] == r_star
    assert (got["n_test"], got["n_cov"]) == (len(tst), n_cov)
    assert got["coverage_bp"] == n_cov * 10000 // len(tst)
    # the conformal guarantee: coverage >= ~90% minus finite-sample slack
    assert got["coverage_bp"] >= 8500


# ------------------------------------------------- harmonic centrality

def test_harmonic_centrality_matches_brute_bfs(spark, tmp_path):
    import pandas as pd
    # path graph 1-2-3-4-5-6-7 via shared orders + isolated pair (8,9)
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7), (8, 9)]
    li = []
    for ok, (a, b) in enumerate(edges, 1):
        li += [(ok, a, 30.0), (ok, b, 30.0)]
    ldf = pd.DataFrame(li, columns=["l_orderkey", "l_partkey",
                                    "l_quantity"])
    d = tmp_path / "sf"
    d.mkdir()
    ldf.to_parquet(d / "lineitem.parquet")
    out = {r["landmark"]: r for r in
           QUERIES["q_harmonic_centrality"](spark, str(d)).collect()}
    assert set(out) == {1, 2, 3, 4}  # 4 smallest node ids
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for s in (1, 2, 3, 4):
        dist = {s: 0}
        frontier = {s}
        for hop in range(1, 5):
            nxt = {y for x in frontier for y in adj[x]} - set(dist)
            for y in nxt:
                dist[y] = hop
            frontier = nxt
        reached = [h for n, h in dist.items() if h > 0]
        assert out[s]["reached"] == len(reached)
        assert out[s]["sum_hops"] == sum(reached)
        assert out[s]["harmonic_e6"] == sum(10 ** 6 // h for h in reached)


# ------------------------------------------------- cochran-armitage

def test_cochran_armitage_matches_brute(spark, tmp_path):
    # success rate rising with hour -> strong positive trend
    rows = []
    eid = 0
    for h, (succ, tot) in enumerate([(1, 10), (3, 10), (6, 10), (9, 10)]):
        for i in range(tot):
            v = 60.0 if i < succ else 10.0
            rows.append((f"probe", f"2024-01-01 {h:02d}:00:00", v))
            eid += 1
    d = _events_fixture(tmp_path, rows)
    got = QUERIES["q_cochran_armitage"](spark, d).collect()[0]
    counts = {0: (1, 10), 1: (3, 10), 2: (6, 10), 3: (9, 10)}
    n = sum(t for _, t in counts.values())
    r = sum(s for s, _ in counts.values())
    t_stat = sum(h * (s * n - t * r) for h, (s, t) in counts.items())
    sw = sum(t * h for h, (_, t) in counts.items())
    sww = sum(t * h * h for h, (_, t) in counts.items())
    var = r * (n - r) * (sww * n - sw * sw) / n
    assert (got["n"], got["r"], got["t_stat"]) == (n, r, t_stat)
    assert got["z"] == pytest.approx(t_stat / math.sqrt(var), abs=2e-6)
    assert got["z"] > 3  # the trend is real


def test_cochran_armitage_degenerate_all_success(spark, tmp_path):
    rows = [("p", f"2024-01-01 {h:02d}:00:00", 60.0)
            for h in range(3) for _ in range(5)]
    d = _events_fixture(tmp_path, rows)
    got = QUERIES["q_cochran_armitage"](spark, d).collect()[0]
    assert got["r"] == got["n"] and got["z"] is None


# --------------------------------------------------- neyman allocation

def _docs_fixture(tmp_path, rows):
    """rows: list of (source, n_chars)."""
    import pandas as pd
    pdf = pd.DataFrame({
        "doc_id": range(len(rows)),
        "text": ["x" * c for _, c in rows],
        "lang": ["en"] * len(rows),
        "source": [s for s, _ in rows],
        "n_chars": [c for _, c in rows],
    })
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "documents.parquet")
    return str(d)


def test_neyman_allocation_matches_brute(spark, tmp_path):
    rows = ([("big_var", c) for c in (10, 500, 20, 900, 50)]
            + [("small_var", c) for c in (100, 101, 102, 99)]
            + [("single", 400)])
    d = _docs_fixture(tmp_path, rows)
    out = {r["source"]: r for r in
           QUERIES["q_stratified_neyman"](spark, d).collect()}
    w = {}
    for s in ("big_var", "small_var", "single"):
        ls = [c for src, c in rows if src == s]
        if len(ls) < 2:
            w[s] = 0
            continue
        n = len(ls)
        m = sum(ls) / n
        sd = math.sqrt(sum((x - m) ** 2 for x in ls) / (n - 1))
        w[s] = int(math.floor(n * sd * 1000 + 0.5))
    for s in w:
        assert out[s]["w_e3"] == w[s]
    wt = sum(w.values())
    base = {s: 1000 * w[s] // wt for s in w}
    rem = {s: 1000 * w[s] % wt for s in w}
    deficit = 1000 - sum(base.values())
    order = sorted(w, key=lambda s: (-rem[s], s))
    alloc = {s: base[s] + (1 if order.index(s) < deficit else 0)
             for s in w}
    for s in w:
        assert out[s]["alloc"] == alloc[s]
    # allocations are an exact partition of the budget; the single-doc
    # stratum gets weight 0 and the high-variance stratum dominates
    assert sum(r["alloc"] for r in out.values()) == 1000
    assert out["single"]["w_e3"] == 0
    assert out["big_var"]["alloc"] > out["small_var"]["alloc"]


# ------------------------------------------------------- odds ratio

def test_odds_ratio_matches_haldane_brute(spark, tmp_path):
    # a=3 am-success, b=1 am-fail, c=1 pm-success, d=5 pm-fail
    rows = ([("x", "2024-01-01 08:00:00", 60.0)] * 3
            + [("x", "2024-01-01 09:00:00", 10.0)] * 1
            + [("x", "2024-01-01 15:00:00", 70.0)] * 1
            + [("x", "2024-01-01 16:00:00", 5.0)] * 5)
    d = _events_fixture(tmp_path, rows)
    got = QUERIES["q_odds_ratio_ci"](spark, d).collect()[0]
    a, b, c, dd = 3, 1, 1, 5
    assert (got["a"], got["b"], got["c"], got["d"]) == (a, b, c, dd)
    lor = math.log((2 * a + 1) * (2 * dd + 1)
                   / ((2 * b + 1) * (2 * c + 1)))
    hw = 1.96 * math.sqrt(2 / (2 * a + 1) + 2 / (2 * b + 1)
                          + 2 / (2 * c + 1) + 2 / (2 * dd + 1))
    assert got["odds_ratio"] == pytest.approx(math.exp(lor), abs=2e-6)
    assert got["ci_lo"] == pytest.approx(math.exp(lor - hw), abs=2e-6)
    assert got["ci_hi"] == pytest.approx(math.exp(lor + hw), abs=2e-6)
    assert got["ci_lo"] < got["odds_ratio"] < got["ci_hi"]


def test_odds_ratio_zero_cell_is_finite(spark, tmp_path):
    # d = 0: Haldane keeps the ratio and CI finite
    rows = ([("x", "2024-01-01 08:00:00", 60.0)] * 2
            + [("x", "2024-01-01 09:00:00", 10.0)] * 2
            + [("x", "2024-01-01 15:00:00", 70.0)] * 2)
    d = _events_fixture(tmp_path, rows)
    got = QUERIES["q_odds_ratio_ci"](spark, d).collect()[0]
    assert got["d"] == 0
    assert got["odds_ratio"] is not None and got["ci_hi"] is not None


# ------------------------------------------------- diff-in-diff

def test_diff_in_diff_matches_brute(spark, tmp_path):
    import pandas as pd
    rows = []
    cells = {}
    for uid in range(40):
        t = _md5_lane("did:", uid, 2)
        for day, post in [(5, 0), (20, 1)]:
            # treated users gain +3.00 post; common +1.00 time trend
            v = 10.0 + post * 1.0 + (3.0 if (t == 1 and post == 1) else 0.0)
            rows.append((uid, f"2024-01-{day:02d} 10:00:00", v))
            key = (t, post)
            n, s = cells.get(key, (0, 0))
            cells[key] = (n + 1, s + int(v * 100))
    pdf = pd.DataFrame({
        "event_id": range(len(rows)),
        "ts": pd.to_datetime([t for _, t, _ in rows]),
        "user_id": [u for u, _, _ in rows],
        "event_type": ["x"] * len(rows),
        "value": [v for _, _, v in rows],
        "props": [None] * len(rows),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")
    got = QUERIES["q_diff_in_diff"](spark, str(d)).collect()[0]
    mean_bp = {k: s * 10000 // n for k, (n, s) in cells.items()}
    did = (mean_bp[(1, 1)] - mean_bp[(1, 0)]
           - mean_bp[(0, 1)] + mean_bp[(0, 0)])
    assert got["n_cells"] == 4
    assert got["did_e4"] == did
    # the time trend cancels; the estimate recovers the +3.00 lift
    assert got["did_dollars"] == pytest.approx(3.0, abs=0.01)


# --------------------------------------------------- power / mde

def test_power_mde_matches_brute(spark, tmp_path):
    vals = [10.0, 12.0, 9.0, 14.0, 11.0, 10.5]
    rows = [("x", "2024-01-01 10:00:00", v) for v in vals]
    d = _events_fixture(tmp_path, rows)
    got = QUERIES["q_power_mde"](spark, d).collect()[0]
    cents = [int(round(v * 100)) for v in vals]
    n = len(cents)
    m = sum(cents) / n
    var = sum((c - m) ** 2 for c in cents) / (n - 1)
    mde = (1.96 + 0.8416) * math.sqrt(2 * var / n) / 100
    assert got["n"] == n
    assert got["var_dollars2"] == pytest.approx(var / 1e4, abs=0.01)
    assert got["mde_dollars"] == pytest.approx(mde, abs=2e-6)


# ------------------------------------------------------- script mix

def test_script_mix_counts_and_spoof_flag(spark, tmp_path):
    docs = [
        ("en", "Hello world 123"),           # latin 10, digit 3
        ("en", "pаypаl login"),              # Cyrillic 'а' x2 spoof
        ("zh", "你好世界 ok"),                 # cjk 4, latin 2
        ("ru", "привет"),                     # cyr 6
    ]
    rows = [(f"src", len(t)) for _, t in docs]
    import pandas as pd
    pdf = pd.DataFrame({
        "doc_id": range(len(docs)),
        "text": [t for _, t in docs],
        "lang": [l for l, _ in docs],
        "source": ["s"] * len(docs),
        "n_chars": [len(t) for _, t in docs],
    })
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "documents.parquet")
    out = {r["lang"]: r for r in
           QUERIES["q_script_mix"](spark, str(d)).collect()}

    def classify(t):
        lat = sum(1 for ch in t if "A" <= ch <= "Z" or "a" <= ch <= "z")
        cyr = sum(1 for ch in t if "Ѐ" <= ch <= "ӿ")
        cjk = sum(1 for ch in t if "一" <= ch <= "鿿")
        dig = sum(1 for ch in t if "0" <= ch <= "9")
        return len(t), lat, cyr, cjk, dig

    for lang in ("en", "zh", "ru"):
        texts = [t for l, t in docs if l == lang]
        nc = sum(classify(t)[0] for t in texts)
        lat = sum(classify(t)[1] for t in texts)
        cyr = sum(classify(t)[2] for t in texts)
        got = out[lang]
        assert got["chars"] == nc
        assert got["latin_bp"] == lat * 10000 // nc
        assert got["cyr_bp"] == cyr * 10000 // nc
    # the homoglyph-spoofed doc is the only mixed latin+cyrillic one
    assert out["en"]["mixed_script_docs"] == 1
    assert out["ru"]["mixed_script_docs"] == 0


# ------------------------------------------- quantile treatment effect

def test_qte_matches_brute_quantiles(spark, tmp_path):
    import pandas as pd
    rows, arms = [], {}
    for eid in range(120):
        t = _md5_lane("qte:", eid, 2)
        # treated arm shifted +5.00 above control
        v = 10.0 + (eid % 10) + (5.0 if t == 1 else 0.0)
        rows.append((eid, "2024-01-01 10:00:00", v))
        arms.setdefault(t, []).append(int(round(v * 100)))
    pdf = pd.DataFrame({
        "event_id": [e for e, _, _ in rows],
        "ts": pd.to_datetime([t for _, t, _ in rows]),
        "user_id": [1] * len(rows),
        "event_type": ["x"] * len(rows),
        "value": [v for _, _, v in rows],
        "props": [None] * len(rows),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")
    out = {r["q_bp"]: r for r in
           QUERIES["q_quantile_treatment_effect"](spark, str(d)).collect()}

    def q1(vals, qbp):
        s = sorted(vals)
        k = -(-(qbp * len(s)) // 10000)  # ceil
        return s[k - 1]

    for qbp in (2500, 5000, 7500):
        got = out[qbp]
        vt, vc = q1(arms[1], qbp), q1(arms[0], qbp)
        assert (got["v_treat"], got["v_ctrl"]) == (vt, vc)
        assert got["qte_cents"] == vt - vc
        assert got["n_treat"] == len(arms[1])
    # the +5.00 uniform shift shows up at every quartile
    assert all(400 <= out[q]["qte_cents"] <= 600 for q in out)


# --------------------------------------------- regression discontinuity

def test_rd_recovers_known_jump(spark, tmp_path):
    rows = []
    for day in range(9, 23):
        x = day - 16
        # linear trend 0.10/day + a +4.00 jump at the cutoff
        base = 10.0 + 0.10 * x + (4.0 if x >= 0 else 0.0)
        for _ in range(5):
            rows.append(("x", f"2024-01-{day:02d} 10:00:00", base))
    d = _events_fixture(tmp_path, rows)
    got = QUERIES["q_regression_discontinuity"](spark, d).collect()[0]
    assert got["n_left"] == 35 and got["n_right"] == 35
    # noiseless linear data: the local-linear fits are exact
    assert got["limit_left"] == pytest.approx(10.0, abs=1e-4)
    assert got["limit_right"] == pytest.approx(14.0, abs=1e-4)
    assert got["rd_estimate"] == pytest.approx(4.0, abs=1e-4)


def test_rd_degenerate_one_day_side(spark, tmp_path):
    rows = ([("x", "2024-01-20 10:00:00", 12.0)] * 5    # right: one day
            + [("x", f"2024-01-{d:02d} 10:00:00", 10.0)
               for d in (10, 12, 14)] * 3)
    d = _events_fixture(tmp_path, rows)
    got = QUERIES["q_regression_discontinuity"](spark, d).collect()[0]
    # single-day right side -> zero dose variance -> NULL fit
    assert got["limit_right"] is None and got["rd_estimate"] is None


# ----------------------------------------------------- freshness decay

def test_freshness_decay_matches_brute(spark, tmp_path):
    rows = ([("new", "2024-01-30 10:00:00", 1.0)] * 4      # age 0
            + [("old", "2024-01-23 10:00:00", 1.0)] * 2    # age 7
            + [("old", "2024-01-16 10:00:00", 1.0)] * 2)   # age 14
    d = _events_fixture(tmp_path, rows)
    out = {r["event_type"]: r for r in
           QUERIES["q_freshness_decay"](spark, d).collect()}
    w = {a: int(math.floor(math.exp(-a / 7) * 1e9 + 0.5))
         for a in (0, 7, 14)}
    assert out["new"]["newest_age_days"] == 0
    assert out["new"]["decayed_e9"] == 4 * w[0]
    assert out["new"]["freshness"] == pytest.approx(1.0, abs=1e-6)
    assert out["old"]["newest_age_days"] == 7
    assert out["old"]["decayed_e9"] == 2 * w[7] + 2 * w[14]
    assert out["old"]["freshness"] == pytest.approx(
        (2 * w[7] + 2 * w[14]) / (4 * 1e9), abs=2e-6)
    assert out["new"]["freshness"] > out["old"]["freshness"]


# ------------------------------------------------------ winrate matrix

def test_winrate_matrix_matches_brute(spark, tmp_path):
    import pandas as pd
    pt = pd.DataFrame({"p_partkey": [1, 2], "p_name": ["x", "y"],
                       "p_brand": ["A", "B"], "p_type": ["t"] * 2,
                       "p_size": [1] * 2, "p_retailprice": [1.0] * 2})
    li = []
    duels = [(5, 1), (4, 2), (1, 3), (6, 2), (7, 1), (2, 4)]  # A wins 4/6
    for ok, (qa, qb) in enumerate(duels, 1):
        li += [(ok, 1, float(qa)), (ok, 2, float(qb))]
    ldf = pd.DataFrame(li, columns=["l_orderkey", "l_partkey",
                                    "l_quantity"])
    d = tmp_path / "sf"
    d.mkdir()
    ldf.to_parquet(d / "lineitem.parquet")
    pt.to_parquet(d / "part.parquet")
    out = QUERIES["q_winrate_matrix"](spark, str(d)).collect()
    assert len(out) == 1
    got = out[0]
    n, w1 = 6, 4
    assert (got["b1"], got["b2"], got["n"], got["w1"]) == ("A", "B", n, w1)
    assert got["rate_bp"] == w1 * 10000 // n
    z, ph = 1.96, w1 / n
    lo = ((ph + z * z / (2 * n)
           - z * math.sqrt(ph * (1 - ph) / n + z * z / (4 * n * n)))
          / (1 + z * z / n))
    assert got["wilson_lo"] == pytest.approx(lo, abs=2e-6)
    # 4/6 is far from decisively settled: the lower bound dips under 50%
    assert got["wilson_lo"] < 0.5


def test_winrate_matrix_min_count_filter(spark, tmp_path):
    import pandas as pd
    pt = pd.DataFrame({"p_partkey": [1, 2], "p_name": ["x", "y"],
                       "p_brand": ["A", "B"], "p_type": ["t"] * 2,
                       "p_size": [1] * 2, "p_retailprice": [1.0] * 2})
    ldf = pd.DataFrame([(1, 1, 5.0), (1, 2, 1.0), (2, 1, 3.0),
                        (2, 2, 4.0)],
                       columns=["l_orderkey", "l_partkey", "l_quantity"])
    d = tmp_path / "sf"
    d.mkdir()
    ldf.to_parquet(d / "lineitem.parquet")
    pt.to_parquet(d / "part.parquet")
    # only 2 duels < the 5-comparison floor -> empty
    assert QUERIES["q_winrate_matrix"](spark, str(d)).count() == 0


# --------------------------------------------------------- modularity

def test_modularity_matches_brute(spark, tmp_path):
    import pandas as pd
    # two brand cliques joined by one bridge edge
    edges = [(1, 2), (1, 3), (2, 3),          # brand A clique
             (4, 5), (4, 6), (5, 6),          # brand B clique
             (3, 4)]                           # bridge
    li = []
    for ok, (a, b) in enumerate(edges, 1):
        li += [(ok, a, 30.0), (ok, b, 30.0)]
    ldf = pd.DataFrame(li, columns=["l_orderkey", "l_partkey",
                                    "l_quantity"])
    pt = pd.DataFrame({
        "p_partkey": [1, 2, 3, 4, 5, 6],
        "p_name": list("abcdef"),
        "p_brand": ["A", "A", "A", "B", "B", "B"],
        "p_type": ["t"] * 6, "p_size": [1] * 6,
        "p_retailprice": [1.0] * 6})
    d = tmp_path / "sf"
    d.mkdir()
    ldf.to_parquet(d / "lineitem.parquet")
    pt.to_parquet(d / "part.parquet")
    out = {r["community"]: r for r in
           QUERIES["q_modularity"](spark, str(d)).collect()}
    m = len(edges)
    # brute: e_in and degree sums per community
    brand = {1: "A", 2: "A", 3: "A", 4: "B", 5: "B", 6: "B"}
    e_in = {"A": 3, "B": 3}
    d_c = {"A": sum(1 for a, b in edges for x in (a, b)
                    if brand[x] == "A"),
           "B": sum(1 for a, b in edges for x in (a, b)
                    if brand[x] == "B")}
    q = sum(e_in[c] / m - (d_c[c] / (2 * m)) ** 2 for c in ("A", "B"))
    for c in ("A", "B"):
        assert out[c]["e_in"] == e_in[c]
        assert out[c]["d_c"] == d_c[c]
        assert out[c]["num_c"] == 4 * m * e_in[c] - d_c[c] ** 2
        assert out[c]["modularity"] == pytest.approx(q, abs=2e-6)
    # near-disjoint cliques: strongly positive modularity
    assert q > 0.3


# ------------------------------------------------------- fleiss kappa

def test_fleiss_kappa_matches_brute(spark, tmp_path):
    import pandas as pd
    n_docs = 60
    lens = [80 + (i % 3) * 150 for i in range(n_docs)]  # 3 buckets
    pdf = pd.DataFrame({
        "doc_id": range(n_docs),
        "text": ["x" * l for l in lens],
        "lang": ["en"] * n_docs,
        "source": ["s"] * n_docs,
        "n_chars": lens,
    })
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "documents.parquet")
    got = QUERIES["q_fleiss_kappa"](spark, str(d)).collect()[0]
    # brute with the same md5 lanes
    votes = {}
    for i, l in enumerate(lens):
        tc = 0 if l < 120 else (1 if l < 300 else 2)
        vs = []
        for r in (1, 2, 3):
            if _md5_lane(f"rate{r}:", i, 10) < 2:
                vs.append(_md5_lane(f"cat{r}:", i, 3))
            else:
                vs.append(tc)
        votes[i] = vs
    s_agree = 0
    catcnt = {0: 0, 1: 0, 2: 0}
    for vs in votes.values():
        from collections import Counter
        cc = Counter(vs)
        s_agree += sum(c * c for c in cc.values()) - 3
        for v in vs:
            catcnt[v] += 1
    t_sq = sum(c * c for c in catcnt.values())
    n = len(votes)
    p_bar = s_agree / (6 * n)
    p_e = t_sq / (9 * n * n)
    kappa = (p_bar - p_e) / (1 - p_e)
    assert got["n_items"] == n
    assert got["s_agree"] == s_agree
    assert got["t_sq"] == t_sq
    assert got["fleiss_kappa"] == pytest.approx(kappa, abs=2e-6)
    # 80% faithful raters on a balanced 3-class task: strong agreement
    assert got["fleiss_kappa"] > 0.5


# ------------------------------------------------------ effective rank

def test_effective_rank_isotropic_vs_collapsed(spark, tmp_path):
    import numpy as np
    import pandas as pd

    def fixture(vecs, path):
        # the GEMM operator's accumulator is the production 64x64;
        # pad fixtures to 64 dims (zero dims contribute nothing to PR)
        padded = [v + [0.0] * (64 - len(v)) for v in vecs]
        pdf = pd.DataFrame({
            "vec_id": range(len(padded)),
            "embedding": [np.array(v, dtype=np.float32) for v in padded],
            "label": [0] * len(padded),
        })
        path.mkdir()
        pdf.to_parquet(path / "embeddings.parquet")

    # isotropic: 4 orthogonal directions, equal mass -> PR ~ 4
    iso = [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0],
           [0, 0, 0, 1.0]] * 5
    d1 = tmp_path / "iso"
    fixture(iso, d1)
    got = QUERIES["q_effective_rank"](spark, str(d1)).collect()[0]
    assert got["dim"] == 64
    assert got["effective_rank"] == pytest.approx(4.0, abs=0.01)

    # collapsed: every vector on one axis -> PR ~ 1
    col = [[1.0, 0, 0, 0]] * 20
    d2 = tmp_path / "col"
    fixture(col, d2)
    got2 = QUERIES["q_effective_rank"](spark, str(d2)).collect()[0]
    assert got2["effective_rank"] == pytest.approx(1.0, abs=0.01)


# -------------------------------------------------------- kendall w

def test_kendall_w_matches_brute(spark, tmp_path):
    import pandas as pd
    lens = [100 + 37 * i for i in range(25)]   # distinct spread lengths
    pdf = pd.DataFrame({
        "doc_id": range(len(lens)),
        "text": ["x" * l for l in lens],
        "lang": ["en"] * len(lens),
        "source": ["s"] * len(lens),
        "n_chars": lens,
    })
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "documents.parquet")
    got = QUERIES["q_kendall_w"](spark, str(d)).collect()[0]
    n, m = len(lens), 3
    scores = {r: {i: lens[i] + _md5_lane(f"kw{r}:", i, 101) - 50
                  for i in range(n)} for r in (1, 2, 3)}
    r2 = {}
    t_sum = 0
    for r in (1, 2, 3):
        vals = list(scores[r].values())
        from collections import Counter
        cc = Counter(vals)
        t_sum += sum(c ** 3 - c for c in cc.values())
        mr = dict(zip(vals, _midranks(vals)))
        for i in range(n):
            r2[i] = r2.get(i, 0) + int(2 * mr[scores[r][i]])
    s2q = 0
    for i in range(n):
        num = (r2[i] - 3 * (n + 1)) * 100000
        dq = num // (6 * n) if num >= 0 else -((-num) // (6 * n))
        s2q += dq * dq
    assert got["n_items"] == n and got["t_sum"] == t_sum
    assert got["s2q"] == s2q
    w = 108 * n * n * s2q / (1e10 * (9 * (n ** 3 - n) - 3 * t_sum))
    assert got["w"] == pytest.approx(w, abs=2e-6)
    # noise is small relative to the length spread: raters mostly agree
    assert got["w"] > 0.8


def test_kendall_w_perfect_concordance(spark, tmp_path):
    import pandas as pd
    # spread lengths so wide the +-50 noise can never flip a rank:
    # all three raters produce the identical ranking -> W = 1 exactly
    lens = [1000 * (i + 1) for i in range(12)]
    pdf = pd.DataFrame({
        "doc_id": range(len(lens)),
        "text": ["x" * 5 for _ in lens],
        "lang": ["en"] * len(lens),
        "source": ["s"] * len(lens),
        "n_chars": lens,
    })
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "documents.parquet")
    got = QUERIES["q_kendall_w"](spark, str(d)).collect()[0]
    assert got["t_sum"] == 0
    assert got["w"] == pytest.approx(1.0, abs=1e-3)


# ----------------------------------------------------- design effect

def test_design_effect_matches_brute(spark, tmp_path):
    import pandas as pd
    rows = []
    # strongly clustered: each user's events hug a user-specific level
    for uid in range(10):
        for j in range(8):
            rows.append((uid, f"2024-01-01 {j:02d}:00:00",
                         10.0 * (uid + 1) + 0.01 * j))
    pdf = pd.DataFrame({
        "event_id": range(len(rows)),
        "ts": pd.to_datetime([t for _, t, _ in rows]),
        "user_id": [u for u, _, _ in rows],
        "event_type": ["x"] * len(rows),
        "value": [v for _, _, v in rows],
        "props": [None] * len(rows),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")
    got = QUERIES["q_design_effect"](spark, str(d)).collect()[0]
    cents = {}
    for u, _, v in rows:
        cents.setdefault(u, []).append(int(round(v * 100)))
    n = sum(len(v) for v in cents.values())
    k = len(cents)
    cf = sum(sum(v) ** 2 * 10 // len(v) for v in cents.values())
    s = sum(sum(v) for v in cents.values())
    qq = sum(x * x for v in cents.values() for x in v)
    ssb = cf - int(math.floor(s * s * 10 / n + 0.5))
    ssw = qq * 10 - cf
    assert (got["n"], got["k"]) == (n, k)
    assert got["ssb_e1"] == ssb and got["ssw_e1"] == ssw
    nn2 = sum(len(v) ** 2 for v in cents.values())
    msb, msw = ssb / (k - 1), ssw / (n - k)
    m0 = (n - nn2 / n) / (k - 1)
    icc = (msb - msw) / (msb + (m0 - 1) * msw)
    deff = 1 + (n / k - 1) * icc
    assert got["icc"] == pytest.approx(icc, abs=2e-6)
    assert got["deff"] == pytest.approx(deff, abs=2e-6)
    # near-total clustering: ICC ~ 1, DEFF ~ cluster size
    assert got["icc"] > 0.99
    assert got["deff"] > 6.5


# ----------------------------------------------------- mcc / lift

def test_mcc_f1_identities_on_testdata(spark):
    got = QUERIES["q_mcc_f1"](spark, SF).collect()[0]
    tp, fp, fn, tn = got["tp"], got["fp"], got["fn"], got["tn"]
    assert got["f1_bp"] == 2 * tp * 10000 // (2 * tp + fp + fn)
    mcc = ((tp * tn - fp * fn)
           / (math.sqrt(tp + fp) * math.sqrt(tp + fn)
              * math.sqrt(tn + fp) * math.sqrt(tn + fn)))
    assert got["mcc"] == pytest.approx(mcc, abs=2e-6)
    # label = (md5 lane < prob): prob IS informative -> positive MCC
    assert got["mcc"] > 0.2


def test_lift_gains_monotone_and_consistent(spark):
    rows = {r["bin"]: r for r in
            QUERIES["q_lift_gains"](spark, SF).collect()}
    # tiny smoke SF: small partkeys cap prob_bp below the top bins —
    # assert over whichever bins are populated
    bins = sorted(rows)
    lo, hi = bins[0], bins[-1]
    assert len(bins) >= 3
    # gains reach 100% at the lowest bin; the top bin has max lift
    assert rows[lo]["gain_bp"] == 10000
    assert rows[hi]["lift_bp"] == max(r["lift_bp"] for r in rows.values())
    # cumulative consistency: cum_n at bin b = sum of n for bins >= b
    for b in bins:
        assert rows[b]["cum_n"] == sum(rows[x]["n"] for x in bins
                                       if x >= b)
        assert rows[b]["cum_pos"] == sum(rows[x]["pos"] for x in bins
                                         if x >= b)
    # gains are monotone decreasing in bin (cumulative from the top)
    gains = [rows[b]["gain_bp"] for b in bins]
    assert gains == sorted(gains, reverse=True)


def test_silhouette_single_label_is_null(spark, tmp_path):
    import numpy as np
    import pandas as pd
    pdf = pd.DataFrame({
        "vec_id": [0, 1],
        "embedding": [np.array([0.1, 0.2], dtype=np.float32)] * 2,
        "label": [0, 0],
    })
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "embeddings.parquet")
    out = QUERIES["q_simplified_silhouette"](spark, str(d)).collect()
    assert len(out) == 1 and out[0]["sum_sil_e6"] is None
