"""Round-11 operators: paired/association/inequality/rank statistics,
information-theoretic diagnostics, link prediction, Lorenz curve.

The registry gate (tools/check_correctness.py) proves oracle parity;
these tests pin each statistic against an INDEPENDENT brute-force
Python implementation on small fixtures (the oracle and the Spark side
share the algebraic rearrangement — a second algorithm is the check
that the rearrangement itself is right), plus the semantic invariants
(tie handling, caps, degenerate guards).
"""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from access_mopper_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- kendall

def _brute_tau_b(xy):
    """O(n^2) Kendall tau-b with tie corrections."""
    n = len(xy)
    s = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = (xy[i][0] > xy[j][0]) - (xy[i][0] < xy[j][0])
            dy = (xy[i][1] > xy[j][1]) - (xy[i][1] < xy[j][1])
            s += dx * dy
    n0 = n * (n - 1) // 2
    from collections import Counter
    n1 = sum(c * (c - 1) // 2 for c in Counter(x for x, _ in xy).values())
    n2 = sum(c * (c - 1) // 2 for c in Counter(y for _, y in xy).values())
    den = math.sqrt(n0 - n1) * math.sqrt(n0 - n2)
    return s, n0, n1, n2, (s / den if den > 0 else None)


def test_kendall_tau_matches_brute_force(spark, tmp_path):
    """The grid/window S and tau_b must equal the O(n^2) definition,
    including heavy ties in both margins."""
    import pandas as pd
    rows = []
    data = [(0, 100), (0, 100), (1, 100), (2, 150), (2, 90), (5, 200),
            (7, 90), (7, 210), (13, 300), (13, 300), (22, 50), (23, 400)]
    ts = [f"2024-01-01 {h:02d}:15:00" for h, _ in data]
    pdf = pd.DataFrame({
        "event_id": range(len(data)),
        "ts": pd.to_datetime(ts),
        "user_id": [1] * len(data),
        "event_type": ["probe"] * len(data),
        "value": [c / 100.0 for _, c in data],
        "props": [None] * len(data),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")
    out = {r["event_type"]: r
           for r in QUERIES["q_kendall_tau"](spark, str(d)).collect()}
    got = out["probe"]
    s, n0, n1, n2, tau = _brute_tau_b(data)
    assert got["s"] == s
    assert (got["n0"], got["n1"], got["n2"]) == (n0, n1, n2)
    assert got["tau_b"] == pytest.approx(tau, abs=2e-6)


def test_kendall_tau_degenerate_all_tied(spark, tmp_path):
    """All events in one hour -> n0 == n1 -> tau_b NULL, S = 0."""
    import pandas as pd
    pdf = pd.DataFrame({
        "event_id": range(4),
        "ts": pd.to_datetime(["2024-01-01 03:00:00"] * 4),
        "user_id": [1] * 4,
        "event_type": ["probe"] * 4,
        "value": [1.0, 2.0, 3.0, 4.0],
        "props": [None] * 4,
    })
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")
    got = QUERIES["q_kendall_tau"](spark, str(d)).collect()[0]
    assert got["s"] == 0 and got["tau_b"] is None


# ------------------------------------------------------------ mcnemar

def test_mcnemar_matches_python(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    b = c = 0
    for r in docs:
        if r["text"] is None:
            continue
        fa = (r["n_chars"] or 0) >= 200
        fb = any(ch.isdigit() for ch in r["text"])
        b += fa and not fb
        c += fb and not fa
    got = QUERIES["q_mcnemar_test"](spark, SF).collect()[0]
    assert (got["n10"], got["n01"]) == (b, c)
    if b + c:
        exp = max(abs(b - c) - 1, 0) ** 2 / (b + c)
        assert got["chi2_mcnemar"] == pytest.approx(exp, abs=2e-6)


# -------------------------------------------------------------- kappa

def test_cohens_kappa_matches_python(spark):
    from access_mopper_spark.functions.text import lang_guess
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    g = docs.select(F.coalesce("lang", F.lit("<null>")).alias("gold"),
                    lang_guess(F.col("text")).alias("guessed")).collect()
    n = len(g)
    agree = sum(r["gold"] == r["guessed"] for r in g)
    from collections import Counter
    rn = Counter(r["gold"] for r in g)
    cn = Counter(r["guessed"] for r in g)
    pe = sum(rn[k] * cn.get(k, 0) for k in rn) / (n * n)
    po = agree / n
    got = QUERIES["q_cohens_kappa"](spark, SF).collect()[0]
    assert got["n"] == n and got["n_agree"] == agree
    assert got["kappa"] == pytest.approx((po - pe) / (1 - pe), abs=2e-6)


# -------------------------------------------------------------- theil

def test_theil_decomposition_matches_python(spark):
    """T_total from the quantized-grid sums must match the direct
    float Theil to grid precision, and T_b + T_w must equal T_total."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    xs = [(r["source"], r["n_chars"]) for r in docs
          if r["n_chars"] and r["n_chars"] > 0 and r["source"]]
    n = len(xs)
    mu = sum(x for _, x in xs) / n
    t_direct = sum((x / mu) * math.log(x / mu) for _, x in xs) / n
    got = QUERIES["q_theil_index"](spark, SF).collect()[0]
    # 1e4 quantization of x*ln(x) bounds the total error by
    # n * 0.5e-4 / X ~ 1e-7 at this corpus
    assert got["theil_total"] == pytest.approx(t_direct, abs=1e-4)
    assert got["theil_total"] == pytest.approx(
        got["theil_between"] + got["theil_within"], abs=2e-6)
    assert got["theil_between"] >= -1e-9  # between-group Theil is >= 0


# ---------------------------------------------------------- jensen-shannon

def test_jensen_shannon_matches_python(spark):
    from access_mopper_spark.operators.search import tokens
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    tk = (docs.where(F.col("text").isNotNull())
          .select(F.when(F.coalesce(F.col("lang"), F.lit("")) == "en", 0)
                  .otherwise(1).alias("side"),
                  F.explode(tokens(F.col("text"))).alias("tok"))
          .where(F.col("tok") != "")).collect()
    from collections import Counter
    c1 = Counter(r["tok"] for r in tk if r["side"] == 0)
    c2 = Counter(r["tok"] for r in tk if r["side"] == 1)
    n1, n2 = sum(c1.values()), sum(c2.values())
    js = 0.0
    for t in set(c1) | set(c2):
        p, q = c1.get(t, 0) / n1, c2.get(t, 0) / n2
        m = (p + q) / 2
        if p:
            js += 0.5 * p * math.log(p / m)
        if q:
            js += 0.5 * q * math.log(q / m)
    got = QUERIES["q_jensen_shannon"](spark, SF).collect()[0]
    assert got["js_nats"] == pytest.approx(js, abs=2e-6)
    assert 0 <= got["js_nats"] <= math.log(2) + 1e-9  # JS bound
    assert got["js_bits"] == pytest.approx(js / math.log(2), abs=2e-6)


# ---------------------------------------------------------------- fano

def test_burstiness_fano_matches_python(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    from collections import Counter
    daily = Counter()
    for r in ev:
        if r["ts"] is not None:
            daily[(r["event_type"], r["ts"].date())] += 1
    by_type = {}
    for (et, _), c in daily.items():
        by_type.setdefault(et, []).append(c)
    got = {r["event_type"]: r
           for r in QUERIES["q_burstiness_fano"](spark, SF).collect()}
    for et, cs in by_type.items():
        d = len(cs)
        if d < 2:
            assert got[et]["fano"] is None
            continue
        mean = sum(cs) / d
        var = sum((c - mean) ** 2 for c in cs) / (d - 1)
        sig = math.sqrt(var)
        assert got[et]["fano"] == pytest.approx(var / mean, abs=2e-6)
        assert got[et]["burstiness"] == pytest.approx(
            (sig - mean) / (sig + mean), abs=2e-6)


# ---------------------------------------------------------------- hill

def test_hill_matches_python(spark):
    lens = sorted((r["n_chars"] for r in
                   spark.read.parquet(f"{SF}/documents.parquet").collect()
                   if r["n_chars"] and r["n_chars"] > 0), reverse=True)
    got = QUERIES["q_hill_tail_index"](spark, SF).collect()[0]
    if len(lens) < 101:
        assert got["alpha_hill"] is None
        return
    top, xk1 = lens[:100], lens[100]
    den = sum(math.log(x) for x in top) - 100 * math.log(xk1)
    assert got["x_k1"] == xk1
    assert got["alpha_hill"] == pytest.approx(100 / den, abs=2e-6)


# ---------------------------------------------------------- cond entropy

def test_bigram_cond_entropy_matches_python(spark):
    from access_mopper_spark.operators.search import tokens
    toks = (spark.read.parquet(f"{SF}/documents.parquet")
            .where(F.col("text").isNotNull())
            .select(tokens(F.col("text")).alias("w")).collect())
    from collections import Counter
    c12, c1 = Counter(), Counter()
    for r in toks:
        w = [t for t in r["w"]]
        for i in range(len(w) - 1):
            if w[i] and w[i + 1]:
                c12[(w[i], w[i + 1])] += 1
                c1[w[i]] += 1
    n = sum(c12.values())
    h = sum(c * math.log(c1[w1] / c) for (w1, _), c in c12.items()) / n
    got = QUERIES["q_bigram_cond_entropy"](spark, SF).collect()[0]
    assert got["n_bigrams"] == n
    assert got["cond_entropy_nats"] == pytest.approx(h, abs=2e-6)
    assert got["perplexity"] == pytest.approx(math.exp(h), abs=2e-5)


# ---------------------------------------------------------- adamic-adar

def test_adamic_adar_matches_python(spark, tmp_path):
    """Small fixture graph: scores, the deg cap, the non-edge filter,
    and the exact-integer ordering must match a dict implementation."""
    import pandas as pd
    # orders as cliques: order 1 = {1,2,3}, order 2 = {2,3,4},
    # order 3 = {1,4,5}
    rows = []
    for ok, parts in ((1, [1, 2, 3]), (2, [2, 3, 4]), (3, [1, 4, 5])):
        for p in parts:
            rows.append((ok, p, 30.0))
    pdf = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey",
                                      "l_quantity"])
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "lineitem.parquet")
    got = {(r["v"], r["w"]): (r["n_common"], r["aa_e9"])
           for r in QUERIES["q_adamic_adar"](spark, str(d)).collect()}
    # brute force
    edges = set()
    for _, parts in ((1, [1, 2, 3]), (2, [2, 3, 4]), (3, [1, 4, 5])):
        for i in parts:
            for j in parts:
                if i < j:
                    edges.add((i, j))
    from collections import Counter, defaultdict
    deg = Counter()
    nbrs = defaultdict(set)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
        nbrs[a].add(b)
        nbrs[b].add(a)
    exp = {}
    nodes = sorted(deg)
    for i in nodes:
        for j in nodes:
            if i < j and (i, j) not in edges:
                common = [m for m in nbrs[i] & nbrs[j] if 2 <= deg[m] <= 64]
                if common:
                    aa = sum(math.floor(1e9 / math.log(deg[m]) + 0.5)
                             for m in common)
                    exp[(i, j)] = (len(common), aa)
    assert got == exp


def test_adamic_adar_excludes_existing_edges(spark):
    out = QUERIES["q_adamic_adar"](spark, SF)
    assert out.where(F.col("v") >= F.col("w")).count() == 0
    assert out.count() <= 50


# ---------------------------------------------------------------- lorenz

def test_lorenz_matches_python(spark):
    lens = sorted(r["n_chars"] for r in
                  spark.read.parquet(f"{SF}/documents.parquet").collect()
                  if r["n_chars"] and r["n_chars"] > 0)
    n, x = len(lens), sum(lens)
    got = {r["decile"]: r for r in
           QUERIES["q_lorenz_curve"](spark, SF).collect()}
    for d in range(1, 11):
        m = (n * d) // 10
        cum = sum(lens[:m])
        assert got[d]["cum_docs"] == m
        assert got[d]["cum_chars"] == cum
        assert got[d]["share_bp"] == (cum * 10000) // x
    # curve is convex-increasing and ends at 100%
    assert got[10]["share_bp"] == 10000


def test_cramers_v_bounds(spark):
    got = QUERIES["q_cramers_v"](spark, SF).collect()[0]
    assert got["chi2"] >= 0
    if got["cramers_v"] is not None:
        assert 0 <= got["cramers_v"] <= 1


# ------------------------------------------------------------- batch 2

def test_anova_matches_python(spark):
    ev = [(r["event_type"], r["ts"].hour,
           math.floor(r["value"] * 100 + 0.5))
          for r in spark.read.parquet(f"{SF}/events.parquet").collect()
          if r["ts"] is not None and r["value"] is not None]
    got = {r["event_type"]: r
           for r in QUERIES["q_anova_oneway"](spark, SF).collect()}
    from collections import defaultdict
    by_type = defaultdict(list)
    for et, h, c in ev:
        by_type[et].append((h, c))
    for et, rows in by_type.items():
        xs = [c for _, c in rows]
        n = len(xs)
        mu = sum(xs) / n
        sst = sum((x - mu) ** 2 for x in xs)
        groups = defaultdict(list)
        for h, c in rows:
            groups[h].append(c)
        ssb = sum(len(g) * (sum(g) / len(g) - mu) ** 2
                  for g in groups.values())
        k = len(groups)
        if sst > 0:
            assert got[et]["eta2"] == pytest.approx(ssb / sst, abs=2e-6)
        if k >= 2 and n > k and sst - ssb > 0:
            f = (ssb / (k - 1)) / ((sst - ssb) / (n - k))
            assert got[et]["f_stat"] == pytest.approx(f, rel=1e-4)


def test_runs_test_matches_python(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    from collections import defaultdict
    daily = defaultdict(int)
    for r in ev:
        if r["ts"] is None or r["value"] is None:
            continue
        daily[(r["event_type"], r["ts"].date())] += \
            math.floor(r["value"] * 100 + 0.5)
    series = defaultdict(list)
    for (et, d), tot in sorted(daily.items()):
        series[et].append(tot)
    got = {r["event_type"]: r
           for r in QUERIES["q_runs_test"](spark, SF).collect()}
    for et, xs in series.items():
        sg = [1 if b > a else -1 for a, b in zip(xs, xs[1:]) if b != a]
        if not sg:
            assert et not in got
            continue
        runs = 1 + sum(x != y for x, y in zip(sg, sg[1:]))
        nu, nd = sg.count(1), sg.count(-1)
        assert (got[et]["n_up"], got[et]["n_down"], got[et]["runs"]) \
            == (nu, nd, runs)
        if nu and nd:
            n = nu + nd
            mu = 2 * nu * nd / n + 1
            var = (2 * nu * nd / n) * (2 * nu * nd - n) / (n * (n - 1))
            if var > 0:
                assert got[et]["z_runs"] == pytest.approx(
                    (runs - mu) / math.sqrt(var), abs=2e-6)


def test_lang_diversity_matches_python(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    from collections import Counter, defaultdict
    c = defaultdict(Counter)
    for r in docs:
        if r["source"] is not None:
            c[r["source"]][r["lang"] or "<null>"] += 1
    got = {r["source"]: r
           for r in QUERIES["q_lang_diversity"](spark, SF).collect()}
    for src, cnt in c.items():
        n = sum(cnt.values())
        h = -sum(v / n * math.log(v / n) for v in cnt.values())
        assert got[src]["n_docs"] == n
        assert got[src]["n_langs"] == len(cnt)
        assert got[src]["top_share_bp"] == max(cnt.values()) * 10000 // n
        assert got[src]["entropy_nats"] == pytest.approx(h, abs=2e-6)
        assert got[src]["effective_langs"] == pytest.approx(
            math.exp(h), abs=2e-5)


def test_acf_matches_python(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    from collections import defaultdict
    daily = defaultdict(int)
    for r in ev:
        if r["ts"] is None or r["value"] is None:
            continue
        daily[(r["event_type"], r["ts"].date())] += \
            math.floor(r["value"] * 100 + 0.5)
    got = {(r["event_type"], r["lag"]): r
           for r in QUERIES["q_acf_multilag"](spark, SF).collect()}
    series = defaultdict(dict)
    for (et, d), tot in daily.items():
        series[et][d.toordinal()] = tot
    import statistics
    for et, sd in series.items():
        for lag in range(1, 8):
            pairs = [(v, sd[k + lag]) for k, v in sd.items()
                     if k + lag in sd]
            if len(pairs) < 2:
                assert (et, lag) not in got or got[(et, lag)]["acf"] is None
                continue
            xs, ys = [p[0] for p in pairs], [p[1] for p in pairs]
            n = len(pairs)
            num = n * sum(x * y for x, y in pairs) - sum(xs) * sum(ys)
            vx = n * sum(x * x for x in xs) - sum(xs) ** 2
            vy = n * sum(y * y for y in ys) - sum(ys) ** 2
            assert got[(et, lag)]["n_pairs"] == n
            if vx > 0 and vy > 0:
                assert got[(et, lag)]["acf"] == pytest.approx(
                    num / (math.sqrt(vx) * math.sqrt(vy)), abs=2e-6)


# ------------------------------------------------------------- batch 3

def test_pr_auc_matches_sklearn_style_python(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    from collections import defaultdict
    per = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for r in li:
        s = int(r["l_quantity"])
        lab = 1 if r["l_extendedprice"] > 30000 else 0
        cell = per[r["l_returnflag"]][s]
        cell[0] += lab
        cell[1] += 1 - lab
    got = {r["l_returnflag"]: r
           for r in QUERIES["q_pr_auc"](spark, SF).collect()}
    for flag, cells in per.items():
        tp = pp = 0
        ap_sum = 0.0
        pos = sum(p for p, _ in cells.values())
        for s in sorted(cells, reverse=True):
            p, n = cells[s]
            tp += p
            pp += p + n
            ap_sum += p * tp / pp
        assert got[flag]["n_pos"] == pos
        if pos:
            assert got[flag]["pr_auc"] == pytest.approx(ap_sum / pos,
                                                        abs=2e-6)


def test_brier_decomposition_consistency(spark):
    """Exact-integer Brier must equal the float definition, and for the
    calibrated fixture it must be close to mean p(1-p) (the refinement
    floor of a perfectly calibrated predictor)."""
    got = QUERIES["q_brier_score"](spark, SF).collect()[0]
    assert got["brier"] == pytest.approx(got["sq_e8"] / (got["n"] * 1e8),
                                         abs=5e-7)  # R6 grid
    assert 0 <= got["brier"] <= 0.5


def test_ece_near_zero_on_calibrated_fixture(spark):
    got = QUERIES["q_ece_calibration"](spark, SF).collect()[0]
    assert got["n_bins"] <= 20
    # calibrated by construction: ECE small, MCE bounded
    assert got["ece"] < 0.2
    assert got["mce"] >= got["ece"]


def test_degree_distribution_matches_python(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    from collections import defaultdict, Counter
    orders = defaultdict(set)
    for r in li:
        if r["l_quantity"] > 25:
            orders[r["l_orderkey"]].add(r["l_partkey"])
    edges = set()
    for parts in orders.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                edges.add((a, b))
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    buckets = Counter(d.bit_length() - 1 for d in deg.values())
    got = {r["log2_bucket"]: r for r in
           QUERIES["q_degree_distribution"](spark, SF).collect()}
    for bkt, n in buckets.items():
        assert got[bkt]["n_nodes"] == n
    assert sum(r["sum_degree"] for r in got.values()) == 2 * len(edges)


# ------------------------------------------------------------- batch 4

def test_hits_matches_python(spark):
    orders = {r["o_orderkey"]: r["o_custkey"] for r in
              spark.read.parquet(f"{SF}/orders.parquet").collect()}
    li = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    edges = {(orders[r["l_orderkey"]], r["l_partkey"])
             for r in li if r["l_quantity"] > 25
             and r["l_orderkey"] in orders}
    from collections import defaultdict
    by_c, by_p = defaultdict(set), defaultdict(set)
    for c, p in edges:
        by_c[c].add(p)
        by_p[p].add(c)
    a = {p: len(cs) for p, cs in by_p.items()}
    for _ in range(2):
        h = {c: sum(a[p] for p in ps) for c, ps in by_c.items()}
        a = {p: sum(h[c] for c in cs) for p, cs in by_p.items()}
    exp = sorted(a.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [(r["part"], r["authority"]) for r in
           QUERIES["q_hits_bipartite"](spark, SF)
           .orderBy("rank").collect()]
    assert got == exp


def test_bfs_hops_matches_python(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    from collections import defaultdict
    orders = defaultdict(set)
    for r in li:
        if r["l_quantity"] > 25:
            orders[r["l_orderkey"]].add(r["l_partkey"])
    adj = defaultdict(set)
    src = None
    for parts in orders.values():
        ps = sorted(parts)
        for i, x in enumerate(ps):
            for y in ps[i + 1:]:
                adj[x].add(y)
                adj[y].add(x)
        if ps and len(ps) >= 2:
            m = min(ps)
            src = m if src is None else min(src, m)
    dist = {src: 0}
    frontier = [src]
    for k in range(1, 5):
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = k
                    nxt.append(v)
        frontier = nxt
    from collections import Counter
    exp = Counter(dist.values())
    got = {r["hop"]: r["n_nodes"] for r in
           QUERIES["q_bfs_hops"](spark, SF).collect()}
    assert got == dict(exp)


def test_weighted_reservoir_matches_python(spark):
    import hashlib
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    keyed = []
    for r in docs:
        if not r["n_chars"] or r["n_chars"] <= 0:
            continue
        h = int(hashlib.md5(f"wrs:{r['doc_id']}".encode())
                .hexdigest()[:8], 16)
        u = (1 + h % 999999) / 1e6
        k = math.floor(math.log(u) / r["n_chars"] * 1e12 + 0.5)
        keyed.append((k, r["doc_id"]))
    exp = sorted(keyed, key=lambda t: (-t[0], t[1]))[:50]
    got = [(r["key_e12"], r["doc_id"]) for r in
           QUERIES["q_weighted_reservoir"](spark, SF)
           .orderBy("rank").collect()]
    assert got == exp


def test_weighted_reservoir_prefers_heavy_docs(spark):
    """Sanity: mean weight of the sample should exceed the corpus mean
    (probability proportional to weight)."""
    out = QUERIES["q_weighted_reservoir"](spark, SF).collect()
    docs = [r["n_chars"] for r in
            spark.read.parquet(f"{SF}/documents.parquet").collect()
            if r["n_chars"] and r["n_chars"] > 0]
    assert sum(r["w"] for r in out) / len(out) > sum(docs) / len(docs)


def test_largest_remainder_exact_budget(spark):
    out = QUERIES["q_largest_remainder"](spark, SF).collect()
    assert sum(r["alloc"] for r in out) == 10000
    # proportionality: alloc within 1 of the exact share
    tot = sum(r["n_docs"] for r in out)
    for r in out:
        exact = 10000 * r["n_docs"] / tot
        assert abs(r["alloc"] - exact) < 1.0


# ------------------------------------------------------------- batch 5

def _daily_series(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    from collections import defaultdict
    daily = defaultdict(int)
    for r in ev:
        if r["ts"] is None or r["value"] is None:
            continue
        daily[(r["event_type"], r["ts"].date())] += \
            math.floor(r["value"] * 100 + 0.5)
    series = defaultdict(dict)
    for (et, d), tot in daily.items():
        series[et][d.toordinal()] = tot
    return series


def test_mann_kendall_matches_python(spark):
    series = _daily_series(spark)
    got = {r["event_type"]: r
           for r in QUERIES["q_mann_kendall"](spark, SF).collect()}
    from collections import Counter
    for et, sd in series.items():
        days = sorted(sd)
        vs = [sd[d] for d in days]
        n = len(vs)
        s = sum((vs[j] > vs[i]) - (vs[j] < vs[i])
                for i in range(n) for j in range(i + 1, n))
        ties = Counter(vs)
        tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
        assert got[et]["s"] == s and got[et]["n_days"] == n
        var = (n * (n - 1) * (2 * n + 5) - tie_term) / 18
        if n >= 3 and var > 0:
            cc = (s > 0) - (s < 0)
            assert got[et]["z_mk"] == pytest.approx(
                (s - cc) / math.sqrt(var), abs=2e-6)


def test_sen_slope_matches_python(spark):
    series = _daily_series(spark)
    got = {r["event_type"]: r
           for r in QUERIES["q_sen_slope"](spark, SF).collect()}
    for et, sd in series.items():
        days = sorted(sd)
        slopes = []
        for i in range(len(days)):
            for j in range(i + 1, len(days)):
                di, dj = days[i], days[j]
                slopes.append(math.floor(
                    (sd[dj] - sd[di]) * 10000 / (dj - di) + 0.5))
        if not slopes:
            continue
        slopes.sort()
        med = slopes[(len(slopes) + 1) // 2 - 1]  # lower median
        assert got[et]["n_pairs"] == len(slopes)
        assert got[et]["sen_slope_e4"] == med


def test_cohens_d_matches_python(spark):
    import statistics
    cust = spark.read.parquet(f"{SF}/customer.parquet").collect()
    g1 = [math.floor(r["c_acctbal"] * 100 + 0.5) for r in cust
          if r["c_mktsegment"] == "BUILDING" and r["c_acctbal"] is not None]
    g2 = [math.floor(r["c_acctbal"] * 100 + 0.5) for r in cust
          if r["c_mktsegment"] == "MACHINERY" and r["c_acctbal"] is not None]
    got = QUERIES["q_cohens_d"](spark, SF).collect()[0]
    assert (got["n1"], got["n2"]) == (len(g1), len(g2))
    sp = math.sqrt(((len(g1) - 1) * statistics.variance(g1)
                    + (len(g2) - 1) * statistics.variance(g2))
                   / (len(g1) + len(g2) - 2))
    d = (statistics.mean(g1) - statistics.mean(g2)) / sp
    assert got["cohens_d"] == pytest.approx(d, abs=2e-6)
    assert got["hedges_g"] == pytest.approx(
        d * (1 - 3 / (4 * (len(g1) + len(g2)) - 9)), abs=2e-6)


def test_levene_bf_matches_python(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    from collections import defaultdict
    groups = defaultdict(list)
    for r in ev:
        if r["value"] is not None:
            groups[r["event_type"]].append(
                math.floor(r["value"] * 100 + 0.5))
    zs = []
    for et, xs in groups.items():
        xs.sort()
        med = xs[(len(xs) + 1) // 2 - 1]
        zs.extend((et, abs(x - med)) for x in xs)
    n = len(zs)
    k = len(groups)
    mu = sum(z for _, z in zs) / n
    from collections import defaultdict as dd2
    gz = dd2(list)
    for et, z in zs:
        gz[et].append(z)
    ssb = sum(len(g) * (sum(g) / len(g) - mu) ** 2 for g in gz.values())
    ssw = sum((z - sum(g) / len(g)) ** 2
              for g in gz.values() for z in g)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    got = QUERIES["q_levene_bf"](spark, SF).collect()[0]
    assert got["n"] == n and got["k"] == k
    assert got["f_bf"] == pytest.approx(f, rel=1e-4)
