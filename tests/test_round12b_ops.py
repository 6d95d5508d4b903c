"""Round-12 continuation operators: log-rank survival test, Pettitt
rank changepoint.

Each statistic is pinned against an independent brute-force Python
implementation on small fixtures (the oracle and the Spark side share
the algebraic rearrangement — the second algorithm checks the
rearrangement itself), plus degenerate guards.
"""

from __future__ import annotations

import math

import pytest

from access_mopper_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _events_fixture(tmp_path, rows):
    """rows: list of (user_id, iso_ts, event_type)."""
    import pandas as pd
    pdf = pd.DataFrame({
        "event_id": range(len(rows)),
        "ts": pd.to_datetime([t for _, t, _ in rows]),
        "user_id": [u for u, _, _ in rows],
        "event_type": [e for _, _, e in rows],
        "value": [1.0] * len(rows),
        "props": [None] * len(rows),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")
    return str(d)


# --------------------------------------------------------------- logrank

def _brute_logrank(lifetimes):
    """lifetimes: list of (arm, lt_days, censored). Returns (o1, e1, v, z)."""
    times = sorted({t for _, t, c in lifetimes if c == 0})
    o1 = e1 = v = 0.0
    for t in times:
        at_risk = [(a, lt, c) for a, lt, c in lifetimes if lt >= t]
        n = len(at_risk)
        n1 = sum(1 for a, _, _ in at_risk if a == 1)
        d = sum(1 for _, lt, c in at_risk if lt == t and c == 0)
        d1 = sum(1 for a, lt, c in at_risk if lt == t and c == 0 and a == 1)
        if d < 1 or n < 2:
            continue
        o1 += d1
        e1 += n1 * d / n
        v += n1 * (n - n1) * d * (n - d) / (n * n * (n - 1))
    z = (o1 - e1) / math.sqrt(v) if v > 0 else None
    return o1, e1, v, z


def test_logrank_matches_brute(spark, tmp_path):
    # arm 1 (odd uids) churns fast, arm 0 (even uids) lives long;
    # users 20/21 active on the global last day -> censored.
    rows = []
    for uid, span in [(1, 0), (3, 1), (5, 1), (7, 2), (9, 3),
                      (2, 4), (4, 5), (6, 6), (8, 6), (10, 7)]:
        rows.append((uid, "2024-01-01 08:00:00", "a"))
        rows.append((uid, f"2024-01-{1 + span:02d} 18:00:00", "a"))
    rows.append((20, "2024-01-01 09:00:00", "a"))
    rows.append((20, "2024-01-10 09:00:00", "a"))
    rows.append((21, "2024-01-02 09:00:00", "a"))
    rows.append((21, "2024-01-10 09:00:00", "a"))
    d = _events_fixture(tmp_path, rows)
    got = QUERIES["q_logrank_test"](spark, d).collect()[0]

    spans = {1: 0, 3: 1, 5: 1, 7: 2, 9: 3, 2: 4, 4: 5, 6: 6, 8: 6, 10: 7,
             20: 9, 21: 8}
    gmax = 9  # day index of 2024-01-10 relative to 2024-01-01
    last_day = {u: (1 if u in (20, 21) else spans[u]) for u in spans}
    lifetimes = []
    for u, sp in spans.items():
        d1 = 9 if u in (20, 21) else sp
        censored = 1 if d1 > gmax - 3 else 0
        lifetimes.append((u % 2, sp, censored))
    del last_day
    o1, e1, v, z = _brute_logrank(lifetimes)
    assert got["n1_users"] == sum(1 for a, _, _ in lifetimes if a == 1)
    assert got["n0_users"] == sum(1 for a, _, _ in lifetimes if a == 0)
    assert got["o1"] == o1
    assert got["e1"] == pytest.approx(e1, abs=5e-6)
    assert got["v_hyper"] == pytest.approx(v, abs=5e-6)
    assert got["z_logrank"] == pytest.approx(z, abs=5e-6)


def test_logrank_zero_variance_is_null(spark, tmp_path):
    # every user in arm 0 (even uids): n1 == 0 at every time -> V == 0.
    rows = []
    for uid, span in [(2, 0), (4, 1), (6, 2), (8, 3)]:
        rows.append((uid, "2024-01-01 08:00:00", "a"))
        rows.append((uid, f"2024-01-{1 + span:02d} 18:00:00", "a"))
    # push the global max far enough out that nobody above is censored
    rows.append((10, "2024-01-01 08:00:00", "a"))
    rows.append((10, "2024-01-09 08:00:00", "a"))
    d = _events_fixture(tmp_path, rows)
    got = QUERIES["q_logrank_test"](spark, d).collect()[0]
    assert got["n1_users"] == 0
    assert got["o1"] == 0
    assert got["z_logrank"] is None


# --------------------------------------------------------------- pettitt

def _brute_pettitt(xs):
    """xs: daily values in day order. Returns (k, tau_idx, p)."""
    nd = len(xs)
    best_k, best_t = -1, None
    for t in range(nd - 1):
        u = 0
        for i in range(t + 1):
            for j in range(t + 1, nd):
                u += (xs[j] > xs[i]) - (xs[j] < xs[i])
        if abs(u) > best_k:
            best_k, best_t = abs(u), t
    p = min(1.0, 2 * math.exp(-6 * best_k * best_k / (nd ** 3 + nd ** 2)))
    return best_k, best_t, p


def test_pettitt_matches_brute(spark, tmp_path):
    # level shift after day 4: [2,3,2,3,2, 7,8,7,9,8]
    counts = [2, 3, 2, 3, 2, 7, 8, 7, 9, 8]
    rows = []
    for di, c in enumerate(counts):
        for k in range(c):
            rows.append((1, f"2024-02-{1 + di:02d} {8 + k}:00:00", "a"))
    d = _events_fixture(tmp_path, rows)
    got = {r["event_type"]: r
           for r in QUERIES["q_pettitt_test"](spark, d).collect()}["a"]
    k, tau_idx, p = _brute_pettitt(counts)
    assert got["n_days"] == len(counts)
    assert got["k_stat"] == k
    assert str(got["tau_day"]) == f"2024-02-{1 + tau_idx:02d}"
    assert got["stat_micro"] == (6 * k * k * 10**6) // (
        len(counts) ** 3 + len(counts) ** 2)
    assert got["p_approx"] == pytest.approx(p, abs=2e-6)


def test_pettitt_constant_series_capped_p(spark, tmp_path):
    rows = []
    for di in range(5):
        for k in range(3):
            rows.append((1, f"2024-03-{1 + di:02d} {9 + k}:00:00", "b"))
    d = _events_fixture(tmp_path, rows)
    got = {r["event_type"]: r
           for r in QUERIES["q_pettitt_test"](spark, d).collect()}["b"]
    assert got["k_stat"] == 0
    assert str(got["tau_day"]) == "2024-03-01"
    assert got["stat_micro"] == 0
    assert got["p_approx"] == 1.0


def test_pettitt_single_day_series_drops_out(spark, tmp_path):
    rows = [(1, "2024-04-01 08:00:00", "solo"),
            (1, "2024-04-01 09:00:00", "solo"),
            (1, "2024-04-01 08:30:00", "multi"),
            (1, "2024-04-02 08:30:00", "multi")]
    d = _events_fixture(tmp_path, rows)
    out = {r["event_type"]
           for r in QUERIES["q_pettitt_test"](spark, d).collect()}
    assert out == {"multi"}


# -------------------------------------------------------------- isotonic

def _brute_pav(pairs):
    """pairs: [(weight, total_pos)] in bin order -> fitted rates via
    classic iterative pool-adjacent-violators."""
    blocks = [[w, s] for w, s in pairs]  # [weight, pos_sum]
    merged = True
    while merged:
        merged = False
        out = []
        for b in blocks:
            out.append(list(b))
            while len(out) >= 2 and (out[-2][1] / out[-2][0]
                                     > out[-1][1] / out[-1][0]):
                w2, s2 = out.pop()
                out[-1][0] += w2
                out[-1][1] += s2
                merged = True
        blocks = out
    fit = []
    for w, s in blocks:
        fit += [s / w] * 1  # one value per block; expand by weight below
    # expand back to per-bin values
    rates = []
    bi = 0
    for w, s in blocks:
        # how many original bins were merged into this block: recover by
        # walking the original pairs
        acc_w = 0
        while acc_w < w:
            acc_w += pairs[bi][0]
            rates.append(s / w)
            bi += 1
    return rates


def test_isotonic_pav_matches_brute(spark, tmp_path):
    import hashlib
    import pandas as pd
    rows = []
    for i in range(240):
        pk, sk = (i * 13) % 50 + 1, (i * 7) % 40 + 1
        rows.append((i + 1, (i % 4) + 1, pk, sk))
    ldf = pd.DataFrame(rows, columns=["l_orderkey", "l_linenumber",
                                      "l_partkey", "l_suppkey"])
    d = tmp_path / "sf"
    d.mkdir()
    ldf.to_parquet(d / "lineitem.parquet")
    got = {r["bin"]: r
           for r in QUERIES["q_isotonic_pav"](spark, str(d)).collect()}

    # replicate the md5 lane + binning in pure python
    bins = {}
    for ok, ln, pk, sk in rows:
        prob = (pk * 37 + sk) % 10001
        lane = int(hashlib.md5(f"cal:{ok}:{ln}".encode())
                   .hexdigest()[:8], 16) % 10000
        label = 1 if lane < prob else 0
        b = min(prob * 20 // 10000, 19)
        w, s = bins.get(b, (0, 0))
        bins[b] = (w + 1, s + label)
    order = sorted(bins)
    fit = _brute_pav([bins[b] for b in order])
    assert set(got) == set(order)
    for b, f in zip(order, fit):
        assert got[b]["nb"] == bins[b][0]
        assert got[b]["pos"] == bins[b][1]
        assert got[b]["emp_rate"] == pytest.approx(
            bins[b][1] / bins[b][0], abs=2e-6)
        assert got[b]["iso_rate"] == pytest.approx(f, abs=2e-6)
    # fitted sequence is nondecreasing in bin order
    seq = [got[b]["iso_rate"] for b in order]
    assert all(a <= c + 1e-12 for a, c in zip(seq, seq[1:]))


def test_isotonic_pav_pools_inversion(spark, tmp_path):
    # hand-built inversion: find keys that land in two adjacent bins
    # with rates inverted; PAV must pool them to the weighted mean.
    import hashlib
    import pandas as pd
    rows = []
    # bin 0: prob_bp < 500 -> partkey*37+suppkey small; make all labels 1
    # bin 19: prob high -> labels 0.  Search keys to force labels.
    want = {0: (3, 1), 19: (3, 0)}  # (count, label) per bin
    found = {0: [], 19: []}
    ok = 0
    pk_sk = [(pk, sk) for pk in range(1, 300) for sk in range(1, 20)]
    for pk, sk in pk_sk:
        prob = (pk * 37 + sk) % 10001
        b = min(prob * 20 // 10000, 19)
        if b not in want or len(found[b]) >= want[b][0]:
            continue
        lbl_want = want[b][1]
        # try order keys until the lane gives the wanted label
        for cand in range(ok + 1, ok + 2000):
            lane = int(hashlib.md5(f"cal:{cand}:1".encode())
                       .hexdigest()[:8], 16) % 10000
            if (1 if lane < prob else 0) == lbl_want:
                found[b].append((cand, 1, pk, sk))
                ok = cand
                break
        if all(len(found[b]) == want[b][0] for b in want):
            break
    assert all(len(found[b]) == want[b][0] for b in want)
    ldf = pd.DataFrame(found[0] + found[19],
                       columns=["l_orderkey", "l_linenumber",
                                "l_partkey", "l_suppkey"])
    d = tmp_path / "sf"
    d.mkdir()
    ldf.to_parquet(d / "lineitem.parquet")
    got = {r["bin"]: r
           for r in QUERIES["q_isotonic_pav"](spark, str(d)).collect()}
    # bin0 rate 1.0 > bin19 rate 0.0 -> pooled to 3/6 on both
    assert got[0]["iso_rate"] == pytest.approx(0.5, abs=2e-6)
    assert got[19]["iso_rate"] == pytest.approx(0.5, abs=2e-6)


# ----------------------------------------------------------------- stump

def test_decision_stump_matches_brute(spark, tmp_path):
    import pandas as pd
    # high-value events concentrated after hour 11
    rows = []
    for h, n, pos in [(2, 10, 1), (5, 8, 2), (11, 12, 3),
                      (14, 10, 8), (20, 10, 9)]:
        for k in range(n):
            rows.append((h, 90.0 if k < pos else 10.0))
    pdf = pd.DataFrame({
        "event_id": range(len(rows)),
        "ts": pd.to_datetime([f"2024-01-01 {h:02d}:15:00"
                              for h, _ in rows]),
        "user_id": [1] * len(rows),
        "event_type": ["a"] * len(rows),
        "value": [v for _, v in rows],
        "props": [None] * len(rows),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")
    got = QUERIES["q_decision_stump"](spark, str(d)).collect()[0]

    per_h = {}
    for h, v in rows:
        n, p = per_h.get(h, (0, 0))
        per_h[h] = (n + 1, p + (1 if v >= 50.0 else 0))
    hours = sorted(per_h)
    n = sum(v[0] for v in per_h.values())
    pos = sum(v[1] for v in per_h.values())
    best = None
    for thr in hours[:-1]:
        nl = sum(v[0] for h, v in per_h.items() if h <= thr)
        pl = sum(v[1] for h, v in per_h.items() if h <= thr)
        nr, pr = n - nl, pos - pl
        child = pl * (nl - pl) / nl + pr * (nr - pr) / nr
        if best is None or child < best[1] - 1e-12:
            best = (thr, child, nl, pl, nr, pr)
    thr, child, nl, pl, nr, pr = best
    root = pos * (n - pos) / n
    assert got["thr_hour"] == thr == 11
    assert (got["n_left"], got["pos_left"]) == (nl, pl)
    assert (got["n_right"], got["pos_right"]) == (nr, pr)
    assert got["gini_root"] == pytest.approx(2 * root / n, abs=2e-6)
    assert got["gini_children"] == pytest.approx(2 * child / n, abs=2e-6)
    assert got["gini_gain"] == pytest.approx(2 * (root - child) / n,
                                             abs=2e-6)


def test_decision_stump_tie_breaks_earliest_hour(spark, tmp_path):
    import pandas as pd
    # perfectly symmetric: hours 1 and 3 give identical splits of a
    # flat series -> every candidate has equal impurity; earliest wins
    rows = [(1, 90.0), (1, 10.0), (3, 90.0), (3, 10.0),
            (5, 90.0), (5, 10.0)]
    pdf = pd.DataFrame({
        "event_id": range(len(rows)),
        "ts": pd.to_datetime([f"2024-01-01 {h:02d}:15:00"
                              for h, _ in rows]),
        "user_id": [1] * len(rows),
        "event_type": ["a"] * len(rows),
        "value": [v for _, v in rows],
        "props": [None] * len(rows),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")
    got = QUERIES["q_decision_stump"](spark, str(d)).collect()[0]
    assert got["thr_hour"] == 1
    assert got["gini_gain"] == pytest.approx(0.0, abs=2e-6)


# ------------------------------------------------------ cluster validity

def _emb_fixture(tmp_path, vecs_labels):
    import pandas as pd
    pdf = pd.DataFrame({
        "vec_id": range(len(vecs_labels)),
        "embedding": [[float(x) for x in v] for v, _ in vecs_labels],
        "label": [l for _, l in vecs_labels],
    })
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "embeddings.parquet")
    return str(d)


def _quant(v, scale=10**4):
    import math as _m
    return [int(_m.floor(x * scale + 0.5)) for x in v]


def test_calinski_harabasz_matches_brute(spark, tmp_path):
    import math as _m
    # two tight, well-separated clusters + one medium cluster
    vecs = ([([0.1, 0.1], 0)] * 3 + [([0.12, 0.08], 0)] * 2
            + [([0.9, 0.9], 1)] * 3 + [([0.88, 0.95], 1)] * 2
            + [([0.5, 0.1], 2)] * 4)
    d = _emb_fixture(tmp_path, vecs)
    got = QUERIES["q_calinski_harabasz"](spark, d).collect()[0]

    q = [( _quant(v), l) for v, l in vecs]
    n = len(q)
    labels = sorted({l for _, l in q})
    k = len(labels)
    dims = len(q[0][0])
    # integer-DIV centroids (truncation toward -inf for floor semantics:
    # Spark DIV/DuckDB // truncate toward zero; all coords positive here)
    cent, glob = {}, []
    for di in range(dims):
        glob.append(sum(v[di] for v, _ in q) // n)
    w_ss = b_ss = 0
    for l in labels:
        mem = [v for v, ll in q if ll == l]
        c = [sum(v[di] for v in mem) // len(mem) for di in range(dims)]
        cent[l] = c
        w_ss += sum((v[di] - c[di]) ** 2 for v in mem for di in range(dims))
        b_ss += len(mem) * sum((c[di] - glob[di]) ** 2
                               for di in range(dims))
    ch = (b_ss / (k - 1)) / (w_ss / (n - k))
    assert got["n_points"] == n
    assert got["k_clusters"] == k
    assert got["w_ss"] == w_ss
    assert got["b_ss"] == b_ss
    assert got["ch_index"] == pytest.approx(ch, abs=2e-6)


def test_calinski_harabasz_single_cluster_null(spark, tmp_path):
    vecs = [([0.1, 0.2], 7)] * 5
    d = _emb_fixture(tmp_path, vecs)
    got = QUERIES["q_calinski_harabasz"](spark, d).collect()[0]
    assert got["k_clusters"] == 1
    assert got["ch_index"] is None


def test_davies_bouldin_matches_brute(spark, tmp_path):
    import math as _m
    vecs = ([([0.1, 0.1], 0)] * 3 + [([0.14, 0.06], 0)] * 2
            + [([0.9, 0.9], 1)] * 3 + [([0.86, 0.94], 1)] * 2
            + [([0.5, 0.1], 2)] * 3 + [([0.46, 0.14], 2)] * 2)
    d = _emb_fixture(tmp_path, vecs)
    got = QUERIES["q_davies_bouldin"](spark, d).collect()[0]

    q = [(_quant(v), l) for v, l in vecs]
    labels = sorted({l for _, l in q})
    dims = len(q[0][0])
    cent, s_q = {}, {}
    for l in labels:
        mem = [v for v, ll in q if ll == l]
        c = [sum(v[di] for v in mem) // len(mem) for di in range(dims)]
        cent[l] = c
        dq = [int(_m.floor(_m.sqrt(sum((v[di] - c[di]) ** 2
                                       for di in range(dims))) + 0.5))
              for v in mem]
        s_q[l] = sum(dq) // len(dq)
    r_e6 = {}
    for li in labels:
        best = None
        for lj in labels:
            if lj == li:
                continue
            m_q = int(_m.floor(_m.sqrt(sum(
                (cent[li][di] - cent[lj][di]) ** 2
                for di in range(dims))) + 0.5))
            if m_q <= 0:
                continue
            rr = (s_q[li] + s_q[lj]) * 10**6 // m_q
            best = rr if best is None else max(best, rr)
        if best is not None:
            r_e6[li] = best
    exp_db = sum(r_e6.values()) / (len(r_e6) * 10**6)
    assert got["k_scored"] == len(r_e6)
    assert got["sum_r_e6"] == sum(r_e6.values())
    assert got["db_index"] == pytest.approx(exp_db, abs=2e-6)


def test_davies_bouldin_orders_partition_quality(spark, tmp_path):
    # tight+separated partition scores LOWER than a smeared one
    tight = ([([0.0, 0.0], 0)] * 4 + [([1.0, 1.0], 1)] * 4)
    smear = ([([0.0, 0.0], 0), ([0.9, 0.9], 0), ([0.1, 0.1], 0),
              ([0.8, 0.8], 0)]
             + [([1.0, 1.0], 1), ([0.1, 0.2], 1), ([0.9, 1.0], 1),
                ([0.2, 0.1], 1)])
    d1 = _emb_fixture(tmp_path, tight)
    got1 = QUERIES["q_davies_bouldin"](spark, d1).collect()[0]
    import shutil
    shutil.rmtree(tmp_path / "sf")
    d2 = _emb_fixture(tmp_path, smear)
    got2 = QUERIES["q_davies_bouldin"](spark, d2).collect()[0]
    assert got1["db_index"] < got2["db_index"]


# ----------------------------------------------------------------- heaps

def _docs_fixture(tmp_path, texts):
    import pandas as pd
    pdf = pd.DataFrame({
        "doc_id": range(len(texts)),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["s"] * len(texts),
        "n_chars": [len(t) if t else 0 for t in texts],
    })
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "documents.parquet")
    return str(d)


def test_heaps_exponent_matches_brute(spark, tmp_path):
    import math as _m
    # 32 docs -> width 2, 16 buckets; growing vocabulary
    texts = []
    for i in range(32):
        toks = [f"w{j}" for j in range(i + 1)] + ["the", "a"]
        texts.append(" ".join(toks))
    d = _docs_fixture(tmp_path, texts)
    got = QUERIES["q_heaps_exponent"](spark, d).collect()[0]

    width = max(1, (31 + 1 + 15) // 16)
    per_b, first = {}, {}
    for i, t in enumerate(texts):
        b = i // width
        ws = t.split()
        per_b[b] = per_b.get(b, 0) + len(ws)
        for w in ws:
            if w not in first:
                first[w] = b
    buckets = sorted(per_b)
    pts = []
    cum_t = cum_v = 0
    for b in buckets:
        cum_t += per_b[b]
        cum_v += sum(1 for w, fb in first.items() if fb == b)
        if cum_t > 0 and cum_v > 0:
            pts.append((_m.log(cum_t), _m.log(cum_v)))
    n = len(pts)
    sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts); sxx = sum(x * x for x, _ in pts)
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    lnk = (sy - beta * sx) / n
    assert got["n_used"] == n
    assert got["total_tokens"] == sum(per_b.values())
    assert got["vocab_size"] == len(first)
    assert got["heaps_beta"] == pytest.approx(beta, abs=1e-5)
    assert got["heaps_ln_k"] == pytest.approx(lnk, abs=1e-5)
    # a growing corpus has 0 < beta <= 1
    assert 0.0 < got["heaps_beta"] <= 1.0


def test_heaps_exponent_single_point_null(spark, tmp_path):
    d = _docs_fixture(tmp_path, ["alpha beta gamma"])
    got = QUERIES["q_heaps_exponent"](spark, d).collect()[0]
    assert got["n_used"] == 1
    assert got["heaps_beta"] is None
    assert got["heaps_ln_k"] is None


# ----------------------------------------------------- capture-recapture

def test_capture_recapture_matches_brute(spark, tmp_path):
    # window 00:00 -> 10:00; midpoint 05:00.  Overlap users 1,2;
    # first-only 3,4,5; second-only 6.
    rows = [(1, "2024-01-01 00:00:00", "a"), (1, "2024-01-01 09:00:00", "a"),
            (2, "2024-01-01 01:00:00", "a"), (2, "2024-01-01 08:00:00", "a"),
            (3, "2024-01-01 02:00:00", "a"),
            (4, "2024-01-01 03:00:00", "a"),
            (5, "2024-01-01 04:59:59", "a"),
            (6, "2024-01-01 10:00:00", "a")]
    d = _events_fixture(tmp_path, rows)
    got = QUERIES["q_capture_recapture"](spark, d).collect()[0]
    n1, n2, m = 5, 3, 2
    assert (got["n1"], got["n2"], got["m_both"]) == (n1, n2, m)
    assert got["n_seen"] == 6
    assert got["n_hat_chapman"] == (n1 + 1) * (n2 + 1) // (m + 1) - 1
    var = ((n1 + 1) * (n2 + 1) * (n1 - m) * (n2 - m)
           / ((m + 1) ** 2 * (m + 2)))
    assert got["se_chapman"] == pytest.approx(math.sqrt(var), abs=2e-6)


def test_capture_recapture_no_overlap(spark, tmp_path):
    rows = [(1, "2024-01-01 00:00:00", "a"),
            (2, "2024-01-01 01:00:00", "a"),
            (3, "2024-01-01 23:00:00", "a"),
            (4, "2024-01-01 22:00:00", "a")]
    d = _events_fixture(tmp_path, rows)
    got = QUERIES["q_capture_recapture"](spark, d).collect()[0]
    assert got["m_both"] == 0
    assert got["n_hat_chapman"] == 3 * 3 // 1 - 1  # finite, Chapman +1s
    assert got["se_chapman"] is not None


# ------------------------------------------------------------------ pacf

def test_pacf_matches_brute_ar1(spark, tmp_path):
    import pandas as pd
    # deterministic AR(1)-ish daily pattern: value v_d = 100 + 50*phi^d
    # wobble; build per-day single events so daily cents = series value.
    series = []
    x = 400.0
    for d in range(30):
        x = 120.0 + 0.6 * x + (7.0 if d % 3 == 0 else -5.0)
        series.append(round(x, 2))
    rows = []
    for d, v in enumerate(series):
        rows.append((1, f"2024-03-{1 + d:02d} 10:00:00", "a", v))
    pdf = pd.DataFrame({
        "event_id": range(len(rows)),
        "ts": pd.to_datetime([t for _, t, _, _ in rows]),
        "user_id": [1] * len(rows),
        "event_type": [e for _, _, e, _ in rows],
        "value": [v for _, _, _, v in rows],
        "props": [None] * len(rows),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")
    got = {r["event_type"]: r
           for r in QUERIES["q_pacf_daily"](spark, str(d)).collect()}["a"]

    cents = [int(math.floor(v * 100 + 0.5)) for v in series]

    def pearson_lag(xs, lag):
        pairs = [(xs[i], xs[i + lag]) for i in range(len(xs) - lag)]
        n = len(pairs)
        sx = sum(x for x, _ in pairs); sy = sum(y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
        return ((n * sxy - sx * sy)
                / (math.sqrt(n * sxx - sx * sx)
                   * math.sqrt(n * syy - sy * sy)))

    r1 = pearson_lag(cents, 1)
    r2 = pearson_lag(cents, 2)
    r3 = pearson_lag(cents, 3)
    phi22 = (r2 - r1 * r1) / (1 - r1 * r1)
    phi21 = r1 - phi22 * r1
    pacf3 = ((r3 - phi21 * r2 - phi22 * r1)
             / (1 - phi21 * r1 - phi22 * r2))
    assert got["pacf1"] == pytest.approx(r1, abs=5e-6)
    assert got["pacf2"] == pytest.approx(phi22, abs=5e-6)
    assert got["pacf3"] == pytest.approx(pacf3, abs=5e-6)
    # AR(1) signature: |pacf2|, |pacf3| well below |pacf1|
    assert abs(got["pacf2"]) < abs(got["pacf1"])


def test_pacf_constant_series_null(spark, tmp_path):
    rows = [(1, f"2024-03-{1 + d:02d} 10:00:00", "b") for d in range(8)]
    d = _events_fixture(tmp_path, rows)  # value fixed at 1.0
    got = {r["event_type"]: r
           for r in QUERIES["q_pacf_daily"](spark, d).collect()}["b"]
    assert got["pacf1"] is None
    assert got["pacf2"] is None
    assert got["pacf3"] is None


# ---------------------------------------------------------------- raking

def test_raking_matches_brute(spark, tmp_path):
    import pandas as pd
    # 2 types x 2 dows with skewed counts
    # dow is epoch-day mod 7 (portable convention); computed below
    base = pd.Timestamp("2024-01-01")
    rows = []
    spec = [("a", 0, 30), ("a", 1, 10), ("b", 0, 5), ("b", 1, 15)]
    for et, dshift, cnt in spec:
        for k in range(cnt):
            rows.append((et, base + pd.Timedelta(days=dshift,
                                                 hours=k % 20)))
    pdf = pd.DataFrame({
        "event_id": range(len(rows)),
        "ts": [t for _, t in rows],
        "user_id": [1] * len(rows),
        "event_type": [e for e, _ in rows],
        "value": [1.0] * len(rows),
        "props": [None] * len(rows),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")
    out = {(r["event_type"], r["dow"]): r
           for r in QUERIES["q_raking_ipf"](spark, str(d)).collect()}

    epoch_day = (base - pd.Timestamp("1970-01-01")).days
    cells = {(et, (epoch_day + dshift) % 7): cnt
             for et, dshift, cnt in spec}
    n = sum(cells.values())
    row_t = n / len({et for et, _ in cells})
    col_t = n / len({dw for _, dw in cells})
    w = {k: float(v) for k, v in cells.items()}
    for rnd in range(2):
        rs = {}
        for (et, dw), v in w.items():
            rs[et] = rs.get(et, 0.0) + v
        w = {(et, dw): v * (row_t / rs[et]) for (et, dw), v in w.items()}
        cs = {}
        for (et, dw), v in w.items():
            cs[dw] = cs.get(dw, 0.0) + v
        w = {(et, dw): v * (col_t / cs[dw]) for (et, dw), v in w.items()}
    assert set(out) == set(cells)
    for key, cnt in cells.items():
        assert out[key]["n_obs"] == cnt
        assert out[key]["raked_w"] == pytest.approx(w[key], abs=5e-6)
        assert out[key]["cell_factor"] == pytest.approx(w[key] / cnt,
                                                        abs=5e-6)
    # after the final column scale, column margins hit the target
    for dw in {dw for _, dw in cells}:
        got_c = sum(out[(et, d2)]["raked_w"] for (et, d2) in cells
                    if d2 == dw)
        assert got_c == pytest.approx(col_t, abs=1e-4)


# ---------------------------------------------------------- jonckheere

def test_jonckheere_matches_brute(spark, tmp_path):
    import pandas as pd
    # values increase across 6-hour blocks -> strong positive trend
    spec = [(3, [10.0, 12.0, 11.0]), (9, [13.0, 15.0, 12.0]),
            (15, [16.0, 18.0, 14.0]), (21, [19.0, 21.0, 18.0])]
    rows = []
    for h, vals in spec:
        for v in vals:
            rows.append((h, v))
    pdf = pd.DataFrame({
        "event_id": range(len(rows)),
        "ts": pd.to_datetime([f"2024-01-01 {h:02d}:10:00"
                              for h, _ in rows]),
        "user_id": [1] * len(rows),
        "event_type": ["a"] * len(rows),
        "value": [v for _, v in rows],
        "props": [None] * len(rows),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")
    got = QUERIES["q_jonckheere_terpstra"](spark, str(d)).collect()[0]

    groups = [[int(v * 100 + 0.5) for v in vals] for _, vals in spec]
    jt2 = 0
    for a in range(4):
        for b in range(a + 1, 4):
            for x in groups[a]:
                for y in groups[b]:
                    jt2 += 2 * (x < y) + (x == y)
    ns = [len(g) for g in groups]
    n = sum(ns)
    e4 = n * n - sum(m * m for m in ns)
    var = (n * n * (2 * n + 3)
           - sum(m * m * (2 * m + 3) for m in ns)) / 72
    z = (2 * jt2 - e4) / (4 * math.sqrt(var))
    assert got["n_total"] == n
    assert got["jt2"] == jt2
    assert got["e4"] == e4
    assert got["z_jt"] == pytest.approx(z, abs=5e-6)
    assert got["z_jt"] > 2  # monotone fixture must read as a trend


def test_jonckheere_flat_series_z_zero(spark, tmp_path):
    import pandas as pd
    rows = [(h, 10.0) for h in (3, 9, 15, 21) for _ in range(3)]
    pdf = pd.DataFrame({
        "event_id": range(len(rows)),
        "ts": pd.to_datetime([f"2024-01-01 {h:02d}:10:00"
                              for h, _ in rows]),
        "user_id": [1] * len(rows),
        "event_type": ["a"] * len(rows),
        "value": [v for _, v in rows],
        "props": [None] * len(rows),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")
    got = QUERIES["q_jonckheere_terpstra"](spark, str(d)).collect()[0]
    # all ties: jt2 = sum over pairs of n_a*n_b (each tie counts 1)
    assert got["jt2"] == sum(3 * 3 for _ in range(6))
    assert got["z_jt"] == pytest.approx(0.0, abs=5e-6)


# --------------------------------------------------------- price index

def test_price_index_matches_brute(spark, tmp_path):
    import pandas as pd
    # part 1: price doubles month 2; part 2: price stable; part 3 only
    # in month 2 (excluded from matched sample)
    li = [
        # (orderkey, partkey, qty, extprice, shipdate)
        (1, 1, 2.0, 20.0, "2024-01-05"),   # unit $10
        (2, 1, 1.0, 10.0, "2024-01-20"),
        (3, 2, 4.0, 20.0, "2024-01-10"),   # unit $5
        (4, 1, 3.0, 60.0, "2024-02-05"),   # unit $20
        (5, 2, 2.0, 10.0, "2024-02-15"),   # unit $5
        (6, 3, 1.0, 99.0, "2024-02-20"),   # no base -> dropped
    ]
    ldf = pd.DataFrame(li, columns=["l_orderkey", "l_partkey",
                                    "l_quantity", "l_extendedprice",
                                    "l_shipdate"])
    ldf["l_shipdate"] = pd.to_datetime(ldf["l_shipdate"]).dt.date
    d = tmp_path / "sf"
    d.mkdir()
    ldf.to_parquet(d / "lineitem.parquet")
    out = {str(r["month"])[:7]: r
           for r in QUERIES["q_price_index"](spark, str(d)).collect()}

    # base month Jan: p1 = 3000c/3 = 1000c/unit q0=3 c0=3000;
    #                 p2 = 2000c/4 = 500c/unit  q0=4 c0=2000
    # Feb: part1 sc=6000 sq=3 -> lasp_c = 6000/3*3 = 6000;
    #      part2 sc=1000 sq=2 -> lasp_c = 1000/2*4 = 2000
    jan, feb = out["2024-01"], out["2024-02"]
    assert jan["n_parts"] == 2 and feb["n_parts"] == 2
    assert jan["laspeyres_bp"] == 10000  # base invariant
    assert jan["paasche_bp"] == 10000
    lasp = (6000 + 2000) * 10000 // (3000 + 2000)
    # paasche den: p0*qt = 1000*3 + 500*2 = 4000; num = 6000+1000
    paas = (6000 + 1000) * 10000 // (3000 + 1000)
    assert feb["laspeyres_bp"] == lasp
    assert feb["paasche_bp"] == paas
    assert feb["fisher_bp"] == int(math.floor(
        math.sqrt(lasp * paas) + 0.5))
    # price rose -> all indices above par
    assert feb["laspeyres_bp"] > 10000


# ----------------------------------------------------------------- hurst

def _daily_count_fixture(tmp_path, counts, start="2024-01-01"):
    import pandas as pd
    base = pd.Timestamp(start)
    rows = []
    for d, c in enumerate(counts):
        for k in range(c):
            rows.append(base + pd.Timedelta(days=d, minutes=k))
    pdf = pd.DataFrame({
        "event_id": range(len(rows)),
        "ts": rows,
        "user_id": [1] * len(rows),
        "event_type": ["a"] * len(rows),
        "value": [1.0] * len(rows),
        "props": [None] * len(rows),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")
    return str(d)


def _brute_rs(counts, w):
    """mean R/S over complete w-blocks with the query's e6 snapping."""
    out = []
    for b0 in range(0, len(counts) - w + 1, w):
        blk = counts[b0:b0 + w]
        sb = sum(blk)
        sxx = sum(x * x for x in blk)
        if w * sxx - sb * sb <= 0:
            continue
        zw = []
        cum = 0
        for t, x in enumerate(blk, start=1):
            cum += x
            zw.append(w * cum - t * sb)
        rw = max(max(zw), 0) - min(min(zw), 0)
        s_pop = math.sqrt(w * sxx - sb * sb)
        out.append(int(math.floor(rw / s_pop * 1e6 + 0.5)))
    return out


def test_hurst_matches_brute(spark, tmp_path):
    # 36 days of alternating-with-drift volume
    counts = [5 + (d % 4) + (3 if (d // 8) % 2 else 0) for d in range(36)]
    d = _daily_count_fixture(tmp_path, counts)
    got = QUERIES["q_hurst_exponent"](spark, d).collect()[0]
    assert got["n_days"] == 36

    pts = []
    for w in (4, 8, 16, 32):
        rs = _brute_rs(counts, w)
        if rs and sum(rs) > 0:
            pts.append((math.log(w), math.log(sum(rs) / (len(rs) * 1e6))))
            if w == 8:
                exp8 = sum(rs) / (len(rs) * 1e6)
                assert got["mean_rs_w8"] == pytest.approx(exp8, abs=2e-6)
    n = len(pts)
    assert got["n_pts"] == n
    sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts); sxx = sum(x * x for x, _ in pts)
    h = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert got["hurst_h"] == pytest.approx(h, abs=1e-5)
    assert 0.0 < got["hurst_h"] < 1.2


def test_hurst_constant_series_no_points(spark, tmp_path):
    d = _daily_count_fixture(tmp_path, [5] * 16)
    got = QUERIES["q_hurst_exponent"](spark, d).collect()[0]
    # zero variance in every block -> no rs points -> NULL fit
    assert got["n_pts"] == 0
    assert got["hurst_h"] is None


# ---------------------------------------------------------------- gumbel

def test_gumbel_matches_brute(spark, tmp_path):
    counts = [3, 9, 4, 2, 8, 5, 6,      # week 0 max 9
              4, 12, 5, 3, 6, 7, 5,     # week 1 max 12
              2, 7, 15, 4, 3, 6, 5,     # week 2 max 15
              5, 6, 4, 8, 10, 3, 2]     # week 3 max 10
    # align to epoch-week boundary: 2024-01-01 epoch day 19723;
    # 19723 % 7 = 4 -> weeks split mid-fixture; compute brute from the
    # same epoch-week grouping instead of assuming alignment.
    d = _daily_count_fixture(tmp_path, counts)
    got = QUERIES["q_gumbel_maxima"](spark, d).collect()[0]

    epoch0 = 19723  # 2024-01-01
    weeks = {}
    for i, c in enumerate(counts):
        wb = (epoch0 + i) // 7
        weeks[wb] = max(weeks.get(wb, 0), c)
    ms = list(weeks.values())
    n = len(ms)
    s = sum(ms); sxx = sum(m * m for m in ms)
    var_s = (n * sxx - s * s) / (n * (n - 1))
    beta = math.sqrt(var_s) * math.sqrt(6) / math.pi
    mu = s / n - 0.5772156649015329 * beta
    assert got["n_blocks"] == n
    assert got["max_daily"] == max(ms)
    assert got["gumbel_beta"] == pytest.approx(beta, abs=5e-6)
    assert got["gumbel_mu"] == pytest.approx(mu, abs=5e-6)
    # location below the max, above the min, beta positive
    assert min(ms) < got["gumbel_mu"] < max(ms)
    assert got["gumbel_beta"] > 0


def test_gumbel_single_block_null(spark, tmp_path):
    d = _daily_count_fixture(tmp_path, [4, 5, 6])
    got = QUERIES["q_gumbel_maxima"](spark, d).collect()[0]
    if got["n_blocks"] < 2:
        assert got["gumbel_mu"] is None
    else:  # fixture straddled an epoch-week boundary: still fitted
        assert got["gumbel_beta"] is not None


# -------------------------------------------------------------- cochran q

def test_cochran_q_matches_brute(spark, tmp_path):
    import hashlib
    texts = [("x" * (50 + 37 * i))[:50 + 37 * i] for i in range(12)]
    d = _docs_fixture(tmp_path, texts)
    got = QUERIES["q_cochran_q"](spark, d).collect()[0]

    def vote(r, doc_id, true_flag):
        lane = int(hashlib.md5(f"flag{r}:{doc_id}".encode())
                   .hexdigest()[:8], 16) % 10
        if lane < 2:
            return int(hashlib.md5(f"bit{r}:{doc_id}".encode())
                       .hexdigest()[:8], 16) % 2
        return true_flag

    table = []
    for doc_id, t in enumerate(texts):
        tf = 1 if len(t) < 200 else 0
        table.append([vote(r, doc_id, tf) for r in (1, 2, 3)])
    c = [sum(row[j] for row in table) for j in range(3)]
    ri = [sum(row) for row in table]
    s = sum(ri)
    sr2 = sum(x * x for x in ri)
    num = 2 * (3 * sum(x * x for x in c) - s * s)
    den = 3 * s - sr2
    assert got["n_items"] == len(texts)
    assert (got["c1"], got["c2"], got["c3"]) == tuple(c)
    if den > 0:
        assert got["q_stat"] == pytest.approx(num / den, abs=2e-6)
    else:
        assert got["q_stat"] is None
    assert got["df"] == 2


# ------------------------------------------------------------- page trend

def test_page_trend_matches_brute(spark, tmp_path):
    import pandas as pd
    # users spend progressively more later in the day
    rows = []
    for uid in range(1, 7):
        for seg, hour in [(0, 3), (1, 11), (2, 19)]:
            v = 10.0 + 5.0 * seg + (uid % 3)  # increasing in seg
            rows.append((uid, f"2024-01-01 {hour:02d}:00:00", v))
    pdf = pd.DataFrame({
        "event_id": range(len(rows)),
        "ts": pd.to_datetime([t for _, t, _ in rows]),
        "user_id": [u for u, _, _ in rows],
        "event_type": ["a"] * len(rows),
        "value": [v for _, _, v in rows],
        "props": [None] * len(rows),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")
    got = QUERIES["q_page_trend"](spark, str(d)).collect()[0]
    b = 6
    # every user ranks 1,2,3 -> R2 per seg: 2,4,6; L2 = 1*12+2*24+3*36
    assert got["n_blocks"] == b
    assert got["l2"] == 1 * (2 * b) + 2 * (4 * b) + 3 * (6 * b)
    assert got["e_l2"] == 24 * b
    z = (got["l2"] - 24 * b) / (2 * math.sqrt(2 * b))
    assert got["z_page"] == pytest.approx(z, abs=2e-6)
    assert got["z_page"] > 2  # monotone fixture: strong positive trend


def test_page_trend_incomplete_blocks_dropped(spark, tmp_path):
    import pandas as pd
    rows = [(1, "2024-01-01 03:00:00", 5.0),
            (1, "2024-01-01 11:00:00", 6.0),   # user 1 missing seg 2
            (2, "2024-01-01 03:00:00", 5.0),
            (2, "2024-01-01 11:00:00", 7.0),
            (2, "2024-01-01 19:00:00", 9.0)]
    pdf = pd.DataFrame({
        "event_id": range(len(rows)),
        "ts": pd.to_datetime([t for _, t, _ in rows]),
        "user_id": [u for u, _, _ in rows],
        "event_type": ["a"] * len(rows),
        "value": [v for _, _, v in rows],
        "props": [None] * len(rows),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")
    got = QUERIES["q_page_trend"](spark, str(d)).collect()[0]
    assert got["n_blocks"] == 1


# -------------------------------------------------------- mantel-haenszel

def test_mantel_haenszel_matches_brute(spark, tmp_path):
    import hashlib
    import pandas as pd
    rows = []
    for i in range(200):
        h = (i * 7) % 24
        v = 90.0 if (i % 3 == 0) else 10.0
        rows.append((i, f"2024-01-01 {h:02d}:30:00", v))
    pdf = pd.DataFrame({
        "event_id": [i for i, _, _ in rows],
        "ts": pd.to_datetime([t for _, t, _ in rows]),
        "user_id": [1] * len(rows),
        "event_type": ["a"] * len(rows),
        "value": [v for _, _, v in rows],
        "props": [None] * len(rows),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")
    got = QUERIES["q_mantel_haenszel"](spark, str(d)).collect()[0]

    cells = {}
    for i, _, v in rows:
        stratum = ((i * 7) % 24) // 6
        arm = int(hashlib.md5(f"mh:{i}".encode()).hexdigest()[:8],
                  16) % 2
        y = 1 if int(v * 100 + 0.5) >= 5000 else 0
        key = stratum
        a, b, c, dd, n = cells.get(key, (0, 0, 0, 0, 0))
        if arm == 1 and y == 1:
            a += 1
        elif arm == 1:
            b += 1
        elif y == 1:
            c += 1
        else:
            dd += 1
        cells[key] = (a, b, c, dd, n + 1)
    s_ad = sum(int(math.floor(a * dd / n * 1e6 + 0.5))
               for a, b, c, dd, n in cells.values())
    s_bc = sum(int(math.floor(b * c / n * 1e6 + 0.5))
               for a, b, c, dd, n in cells.values())
    assert got["n_strata"] == len(cells)
    assert got["s_ad"] == s_ad
    assert got["s_bc"] == s_bc
    assert got["or_mh"] == pytest.approx(s_ad / s_bc, abs=2e-6)


# ----------------------------------------------------- growth accounting

def test_growth_accounting_matches_brute(spark, tmp_path):
    # users: 1 active d0,d1,d3 (retained d1, churn at d2, resurrect d3)
    #        2 active d0 only (churns at d1)
    #        3 joins d1, active d1,d2
    rows = [(1, "2024-05-01 10:00:00", "a"), (1, "2024-05-02 10:00:00", "a"),
            (1, "2024-05-04 10:00:00", "a"),
            (2, "2024-05-01 11:00:00", "a"),
            (3, "2024-05-02 09:00:00", "a"), (3, "2024-05-03 09:00:00", "a"),
            (3, "2024-05-03 17:00:00", "a")]
    d = _events_fixture(tmp_path, rows)
    out = {r["day_idx"]: r
           for r in QUERIES["q_growth_accounting"](spark, d).collect()}
    base = min(out)  # day index of 2024-05-01
    d0, d1, d2, d3 = base, base + 1, base + 2, base + 3
    assert (out[d0]["dau"], out[d0]["new_users"]) == (2, 2)
    assert out[d0]["retained"] == 0 and out[d0]["churned"] == 0
    assert (out[d1]["dau"], out[d1]["new_users"]) == (2, 1)
    assert out[d1]["retained"] == 1          # user 1
    assert out[d1]["resurrected"] == 0
    assert out[d1]["churned"] == 2 - 1       # user 2
    assert (out[d2]["dau"], out[d2]["retained"]) == (1, 1)  # user 3
    assert out[d2]["churned"] == 2 - 1       # user 1 dropped
    assert (out[d3]["dau"], out[d3]["resurrected"]) == (1, 1)  # user 1 back
    assert out[d3]["retained"] == 0
    assert out[d3]["churned"] == 1           # user 3 dropped
    # identity: dau = new + retained + resurrected on every day
    for r in out.values():
        assert r["dau"] == r["new_users"] + r["retained"] + r["resurrected"]


def test_srm_check_brute_and_flag(spark, tmp_path):
    import hashlib
    rows = [(i, f"2024-01-01 {i % 24:02d}:00:00", "a") for i in range(300)]
    import pandas as pd
    pdf = pd.DataFrame({
        "event_id": [i for i, _, _ in rows],
        "ts": pd.to_datetime([t for _, t, _ in rows]),
        "user_id": [1] * len(rows),
        "event_type": ["a"] * len(rows),
        "value": [1.0] * len(rows),
        "props": [None] * len(rows),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")
    got = QUERIES["q_srm_check"](spark, str(d)).collect()[0]
    n1 = sum(int(hashlib.md5(f"mh:{i}".encode()).hexdigest()[:8], 16) % 2
             for i in range(300))
    n0 = 300 - n1
    chi = (n1 - n0) ** 2 / 300
    assert (got["n0"], got["n1"]) == (n0, n1)
    assert got["chi2_srm"] == pytest.approx(chi, abs=2e-6)
    assert got["srm_flag"] == (1 if chi > 3.841458820694124 else 0)


# ------------------------------------------------------------ stickiness

def test_dau_stickiness_matches_brute(spark, tmp_path):
    # user 1 every day of 10; user 2 every other day; user 3 once
    rows = []
    for d in range(10):
        rows.append((1, f"2024-06-{1 + d:02d} 08:00:00", "a"))
        if d % 2 == 0:
            rows.append((2, f"2024-06-{1 + d:02d} 09:00:00", "a"))
    rows.append((3, "2024-06-05 12:00:00", "a"))
    d = _events_fixture(tmp_path, rows)
    out = {r["day_idx"]: r
           for r in QUERIES["q_dau_stickiness"](spark, d).collect()}
    base = min(out)
    active = {}
    for u, t, _ in rows:
        di = int(t[8:10]) - 1
        active.setdefault(di, set()).add(u)
    for di, users in active.items():
        wau = set()
        for dj in range(max(0, di - 6), di + 1):
            wau |= active.get(dj, set())
        got = out[base + di]
        assert got["dau"] == len(users)
        assert got["wau"] == len(wau)
        assert got["stickiness_bp"] == len(users) * 10000 // len(wau)
    # stickiness is a share: never above par
    assert all(r["stickiness_bp"] <= 10000 for r in out.values())


# ------------------------------------------------------------- shrinkage

def test_eb_shrinkage_pulls_toward_prior(spark, tmp_path):
    import pandas as pd
    # two cells with extreme rates on tiny n, many cells at 50%
    rows = []
    uid = 0
    for cell in range(20):
        uid = cell
        n = 3 if cell < 2 else 50
        hi = n if cell == 0 else (0 if cell == 1 else n // 2)
        for k in range(n):
            rows.append((uid + 20, 90.0 if k < hi else 10.0))
    pdf = pd.DataFrame({
        "event_id": range(len(rows)),
        "ts": pd.to_datetime(["2024-01-01 10:00:00"] * len(rows)),
        "user_id": [u for u, _ in rows],
        "event_type": ["a"] * len(rows),
        "value": [v for _, v in rows],
        "props": [None] * len(rows),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")
    out = {(r["event_type"], r["cell"]): r
           for r in QUERIES["q_eb_shrinkage"](spark, str(d)).collect()}
    r_hi = out[("a", 0)]   # 3/3 raw
    r_lo = out[("a", 1)]   # 0/3 raw
    assert r_hi["raw_rate"] == pytest.approx(1.0, abs=1e-6)
    assert r_lo["raw_rate"] == pytest.approx(0.0, abs=1e-6)
    # shrinkage pulls extremes toward the interior, ordering preserved
    assert r_hi["eb_rate"] < 1.0 and r_lo["eb_rate"] > 0.0
    assert r_hi["eb_rate"] > r_lo["eb_rate"]
    # big-n cells barely move
    big = out[("a", 5)]
    assert abs(big["eb_rate"] - big["raw_rate"]) < 0.05


def test_eb_shrinkage_matches_brute_formula(spark, tmp_path):
    import pandas as pd
    rows = []
    spec = {0: (10, 7), 1: (20, 5), 2: (30, 12), 3: (40, 9)}
    for cell, (n, s) in spec.items():
        for k in range(n):
            rows.append((cell, 90.0 if k < s else 10.0))
    pdf = pd.DataFrame({
        "event_id": range(len(rows)),
        "ts": pd.to_datetime(["2024-01-01 10:00:00"] * len(rows)),
        "user_id": [u for u, _ in rows],
        "event_type": ["a"] * len(rows),
        "value": [v for _, v in rows],
        "props": [None] * len(rows),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")
    out = {r["cell"]: r
           for r in QUERIES["q_eb_shrinkage"](spark, str(d)).collect()}
    k = len(spec)
    ps = [s / n for n, s in spec.values()]
    sp, spp = sum(ps), sum(p * p for p in ps)
    sinv = sum(1 / n for n, _ in spec.values())
    mu = sp / k
    excess = (spp / k - mu * mu) - mu * (1 - mu) * (sinv / k)
    mv = mu * (1 - mu)
    m = mv / excess - 1 if excess > 0 and mv / excess - 1 > 0 else 20.0
    for cell, (n, s) in spec.items():
        assert out[cell]["eb_rate"] == pytest.approx(
            (s + mu * m) / (n + m), abs=5e-6)


# ------------------------------------------------------------------ dunn

def test_dunn_posthoc_matches_brute(spark, tmp_path):
    import pandas as pd
    groups = {"a": [10, 10, 20, 30], "b": [30, 40, 40, 50],
              "c": [50, 60, 70, 70]}
    rows = [(g, float(v)) for g, vs in groups.items() for v in vs]
    pdf = pd.DataFrame({
        "event_id": range(len(rows)),
        "ts": pd.to_datetime(["2024-01-01 10:00:00"] * len(rows)),
        "user_id": [1] * len(rows),
        "event_type": [g for g, _ in rows],
        "value": [v for _, v in rows],
        "props": [None] * len(rows),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")
    out = {(r["g1"], r["g2"]): r
           for r in QUERIES["q_dunn_posthoc"](spark, str(d)).collect()}

    allv = sorted(v for vs in groups.values() for v in vs)
    n = len(allv)

    def midrank(v):
        lo = sum(1 for x in allv if x < v)
        eq = sum(1 for x in allv if x == v)
        return lo + (eq + 1) / 2

    mr = {g: sum(midrank(v) for v in vs) / len(vs)
          for g, vs in groups.items()}
    from collections import Counter
    t3 = sum(c ** 3 - c for c in Counter(allv).values())
    for (g1, g2), r in out.items():
        n1, n2 = len(groups[g1]), len(groups[g2])
        diff = mr[g1] - mr[g2]
        sd = math.sqrt((n * (n + 1) / 12 - t3 / (12 * (n - 1)))
                       * (1 / n1 + 1 / n2))
        assert r["mean_rank_diff"] == pytest.approx(diff, abs=2e-6)
        assert r["z_dunn"] == pytest.approx(diff / sd, abs=2e-6)
    # ordered fixture: a < b < c in mean rank
    assert out[("a", "b")]["z_dunn"] < 0
    assert out[("a", "c")]["z_dunn"] < out[("a", "b")]["z_dunn"]


# -------------------------------------------------------- weighted kappa

def test_weighted_kappa_matches_brute(spark, tmp_path):
    import hashlib
    texts = ["y" * (60 + 41 * i) for i in range(15)]
    d = _docs_fixture(tmp_path, texts)
    got = QUERIES["q_weighted_kappa"](spark, d).collect()[0]

    def vote(r, doc_id, tc):
        lane = int(hashlib.md5(f"rate{r}:{doc_id}".encode())
                   .hexdigest()[:8], 16) % 10
        if lane < 2:
            return int(hashlib.md5(f"cat{r}:{doc_id}".encode())
                       .hexdigest()[:8], 16) % 3
        return tc

    o = {}
    for doc_id, t in enumerate(texts):
        n = len(t)
        tc = 0 if n < 120 else (1 if n < 300 else 2)
        c1, c2 = vote(1, doc_id, tc), vote(2, doc_id, tc)
        o[(c1, c2)] = o.get((c1, c2), 0) + 1
    n = sum(o.values())
    ri = {i: sum(v for (a, _), v in o.items() if a == i) for i in range(3)}
    cj = {j: sum(v for (_, b), v in o.items() if b == j) for j in range(3)}
    wo = sum(abs(a - b) * v for (a, b), v in o.items())
    we_n = sum(abs(i - j) * ri[i] * cj[j]
               for i in range(3) for j in range(3))
    assert got["n_items"] == n
    assert got["sum_w_observed"] == wo
    assert got["sum_w_expected_x_n"] == we_n
    assert got["kappa_w"] == pytest.approx(1 - n * wo / we_n, abs=2e-6)


def test_weighted_kappa_mostly_agreeing_panel_scores_high(spark, tmp_path):
    # both raters take the true-cat lane ~80% of the time, so with
    # varied true categories the chance-corrected agreement must be
    # strongly positive (each disagreeing pair needs a noise lane)
    texts = ["z" * (60 + 53 * (i % 9)) for i in range(60)]
    d = _docs_fixture(tmp_path, texts)
    got = QUERIES["q_weighted_kappa"](spark, d).collect()[0]
    assert got["n_items"] == 60
    assert got["kappa_w"] is not None and got["kappa_w"] > 0.5


# ------------------------------------------------------------ youden cut

def test_youden_cut_matches_brute(spark, tmp_path):
    import hashlib
    import pandas as pd
    rows = []
    for i in range(300):
        pk, sk = (i * 11) % 70 + 1, (i * 5) % 30 + 1
        rows.append((i + 1, (i % 5) + 1, pk, sk))
    ldf = pd.DataFrame(rows, columns=["l_orderkey", "l_linenumber",
                                      "l_partkey", "l_suppkey"])
    d = tmp_path / "sf"
    d.mkdir()
    ldf.to_parquet(d / "lineitem.parquet")
    got = QUERIES["q_youden_cut"](spark, str(d)).collect()[0]

    bins = {}
    for ok, ln, pk, sk in rows:
        prob = (pk * 37 + sk) % 10001
        lane = int(hashlib.md5(f"cal:{ok}:{ln}".encode())
                   .hexdigest()[:8], 16) % 10000
        label = 1 if lane < prob else 0
        b = min(prob * 20 // 10000, 19)
        n, p = bins.get(b, (0, 0))
        bins[b] = (n + 1, p + label)
    nt = sum(n for n, _ in bins.values())
    pt = sum(p for _, p in bins.values())
    best = None
    for cut in sorted(bins):
        cum_n = sum(n for b, (n, _) in bins.items() if b >= cut)
        cum_p = sum(p for b, (_, p) in bins.items() if b >= cut)
        tp, fp = cum_p, cum_n - cum_p
        j = tp * (nt - pt) - fp * pt
        if best is None or j > best[1]:
            best = (cut, j, tp, fp)
    cut, j, tp, fp = best
    assert got["cut_bin"] == cut
    assert got["j_cross"] == j
    assert (got["tp"], got["fp"]) == (tp, fp)
    assert got["youden_j"] == pytest.approx(
        tp / pt - fp / (nt - pt), abs=2e-6)
    # calibrated-by-construction scores: optimal cut is interior
    assert got["youden_j"] >= 0


# ------------------------------------------------------- holm-bonferroni

def test_holm_step_down_matches_brute(spark, tmp_path):
    import pandas as pd
    # 3 types x 2 hours; one cell strongly shifted, one mildly, rest flat
    rows = []
    for et, h, vals in [
        ("a", 1, [99.0] * 30),          # strong shift
        ("a", 2, [55.0] * 30),          # mild
        ("b", 1, [50.0] * 30),
        ("b", 2, [51.0] * 30),
        ("c", 1, [49.0] * 30),
        ("c", 2, [50.0] * 30),
    ]:
        for v in vals:
            rows.append((et, f"2024-01-01 {h:02d}:05:00", v))
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
    out = {(r["event_type"], r["h"]): r
           for r in QUERIES["q_holm_bonferroni"](spark, str(d)).collect()}

    cents = {}
    for et, t, v in rows:
        h = int(t[11:13])
        cents.setdefault((et, h), []).append(int(v * 100 + 0.5))
    allc = [c for vs in cents.values() for c in vs]
    n = len(allc)
    mu = sum(allc) / n
    var = sum(c * c for c in allc) / n - mu * mu
    ps = {}
    for key, vs in cents.items():
        d_ = sum(vs) / len(vs) - mu
        z2 = len(vs) * d_ * d_ / var
        ps[key] = int(math.floor(1 / (1 + z2) * 1e9 + 0.5))
    order = sorted(ps, key=lambda k: (ps[k], k))
    m = len(order)
    ks = None
    for i, key in enumerate(order, start=1):
        if ps[key] * (m - i + 1) > 50_000_000:
            ks = i
            break
    for i, key in enumerate(order, start=1):
        exp_rej = (i < ks) if ks is not None else True
        assert out[key]["rejected"] == exp_rej, key
        assert out[key]["p_e9"] == ps[key]
    # the strong cell is rejected; the flat cells are not
    assert out[("a", 1)]["rejected"] is True
    assert out[("b", 2)]["rejected"] is False
    # Holm rejects a subset of BH at the same alpha (step-down vs step-up)
    bh = {(r["event_type"], r["h"]): r["rejected"]
          for r in QUERIES["q_benjamini_hochberg"](spark, str(d)).collect()}
    for key in out:
        if out[key]["rejected"]:
            assert bh[key]


# -------------------------------------------------------------- cmh test

def test_cmh_matches_brute(spark, tmp_path):
    import hashlib
    import pandas as pd
    rows = []
    for i in range(400):
        h = (i * 13) % 24
        v = 95.0 if (i % 4 == 0) else 20.0
        rows.append((i, f"2024-01-01 {h:02d}:45:00", v))
    pdf = pd.DataFrame({
        "event_id": [i for i, _, _ in rows],
        "ts": pd.to_datetime([t for _, t, _ in rows]),
        "user_id": [1] * len(rows),
        "event_type": ["a"] * len(rows),
        "value": [v for _, _, v in rows],
        "props": [None] * len(rows),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")
    got = QUERIES["q_cmh_test"](spark, str(d)).collect()[0]

    cells = {}
    for i, _, v in rows:
        st = ((i * 13) % 24) // 6
        arm = int(hashlib.md5(f"mh:{i}".encode()).hexdigest()[:8], 16) % 2
        y = 1 if int(v * 100 + 0.5) >= 5000 else 0
        a, n1, m1, n = cells.get(st, (0, 0, 0, 0))
        cells[st] = (a + (arm == 1 and y == 1), n1 + (arm == 1),
                     m1 + (y == 1), n + 1)
    sa = sum(a for a, _, _, _ in cells.values())
    se = sum(int(math.floor(n1 * m1 / n * 1e6 + 0.5))
             for _, n1, m1, n in cells.values() if n >= 2)
    sv = sum(int(math.floor(n1 / n * ((n - n1) / n) * m1
                            * ((n - m1) / (n - 1)) * 1e6 + 0.5))
             for _, n1, m1, n in cells.values() if n >= 2)
    assert got["n_strata"] == len(cells)
    assert (got["sa"], got["se"], got["sv"]) == (sa, se, sv)
    chi2 = (sa * 1e6 - se) ** 2 / (1e6 * sv)
    assert got["chi2_cmh"] == pytest.approx(chi2, abs=2e-6)


# ------------------------------------------------------ cross-correlation

def test_cross_correlation_detects_lead(spark, tmp_path):
    import pandas as pd
    # 'click' series leads 'buy' by exactly 1 day
    base = [3, 9, 2, 8, 4, 10, 1, 7, 5, 6]
    rows = []
    for d, c in enumerate(base):
        for k in range(c):
            rows.append(("click", f"2024-07-{1 + d:02d} 08:00:00",
                         10.0 + c))
    for d, c in enumerate(base):
        for k in range(3):
            rows.append(("buy", f"2024-07-{2 + d:02d} 09:00:00",
                         10.0 + c))
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
    out = {(r["et_x"], r["et_y"], r["lag"]): r["ccf"]
           for r in QUERIES["q_cross_correlation"](spark,
                                                   str(d)).collect()}
    # click's daily mean equals buy's mean shifted by +1 day:
    # x=click at lag +1 aligns x_t with y_{t+1} -> near-perfect corr
    assert out[("click", "buy", 1)] == pytest.approx(1.0, abs=1e-4)
    # at lag 0 the alignment is broken (permuted series)
    assert abs(out[("click", "buy", 0)]) < 0.9


def test_cross_correlation_matches_brute_pearson(spark, tmp_path):
    import pandas as pd
    xs = [5, 1, 4, 2, 8, 3]
    ys = [2, 7, 3, 9, 4, 6]
    rows = []
    for d, v in enumerate(xs):
        rows.append(("a", f"2024-07-{1 + d:02d} 08:00:00", float(v)))
    for d, v in enumerate(ys):
        rows.append(("b", f"2024-07-{1 + d:02d} 09:00:00", float(v)))
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
    out = {(r["et_x"], r["et_y"], r["lag"]): r["ccf"]
           for r in QUERIES["q_cross_correlation"](spark,
                                                   str(d)).collect()}
    xc = [v * 100 for v in xs]
    yc = [v * 100 for v in ys]

    def pearson(pairs):
        n = len(pairs)
        sx = sum(x for x, _ in pairs); sy = sum(y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
        den = math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
        return (n * sxy - sx * sy) / den

    for lag in (-2, 0, 2):
        if lag >= 0:
            pairs = list(zip(xc[:len(xc) - lag], yc[lag:]))
        else:
            pairs = list(zip(xc[-lag:], yc[:len(yc) + lag]))
        assert out[("a", "b", lag)] == pytest.approx(pearson(pairs),
                                                     abs=2e-6)


# ---------------------------------------------------------------- granger

def test_granger_detects_directional_lead(spark, tmp_path):
    import pandas as pd
    # x drives y with lag 1: y_t = x_{t-1} (+tiny own noise); x is a
    # fixed pseudo-random walk.  x->y F should dwarf y->x F.
    xs = [4, 9, 2, 7, 5, 11, 3, 8, 6, 10, 1, 12, 5, 9, 2]
    ys = [0] + [xs[i - 1] + (i % 3) for i in range(1, len(xs))]
    rows = []
    for d, v in enumerate(xs):
        rows.append(("x", f"2024-08-{1 + d:02d} 08:00:00", float(v)))
    for d, v in enumerate(ys):
        rows.append(("y", f"2024-08-{1 + d:02d} 09:00:00", float(v + 1)))
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
    out = {(r["et_x"], r["et_y"]): r
           for r in QUERIES["q_granger_1lag"](spark, str(d)).collect()}
    fxy = out[("x", "y")]["f_granger"]   # does x help predict y?  yes
    fyx = out[("y", "x")]["f_granger"]   # reverse: no
    assert fxy is not None and fyx is not None
    assert fxy > 10 * max(fyx, 0.1)


def test_granger_matches_brute_ols(spark, tmp_path):
    import pandas as pd
    xs = [3, 8, 5, 9, 4, 7, 6, 10, 2, 8]
    ys = [5, 4, 9, 3, 8, 6, 7, 5, 9, 4]
    rows = []
    for d, v in enumerate(xs):
        rows.append(("a", f"2024-08-{1 + d:02d} 08:00:00", float(v)))
    for d, v in enumerate(ys):
        rows.append(("b", f"2024-08-{1 + d:02d} 09:00:00", float(v)))
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
    out = {(r["et_x"], r["et_y"]): r
           for r in QUERIES["q_granger_1lag"](spark, str(d)).collect()}

    yt = [y * 100 for y in ys[1:]]
    z1 = [y * 100 for y in ys[:-1]]
    z2 = [x * 100 for x in xs[:-1]]
    n = len(yt)
    cyy = n * sum(v * v for v in yt) - sum(yt) ** 2
    c11 = n * sum(v * v for v in z1) - sum(z1) ** 2
    c22 = n * sum(v * v for v in z2) - sum(z2) ** 2
    c12 = n * sum(a * b for a, b in zip(z1, z2)) - sum(z1) * sum(z2)
    c1y = n * sum(a * b for a, b in zip(z1, yt)) - sum(z1) * sum(yt)
    c2y = n * sum(a * b for a, b in zip(z2, yt)) - sum(z2) * sum(yt)
    det = c11 * c22 - c12 * c12
    rss0 = cyy - c1y * c1y / c11
    beta = (c1y * c22 - c2y * c12) / det
    gam = (c2y * c11 - c1y * c12) / det
    rss1 = cyy - beta * c1y - gam * c2y
    f = (rss0 - rss1) * (n - 3) / rss1
    assert out[("a", "b")]["n_obs"] == n
    assert out[("a", "b")]["f_granger"] == pytest.approx(f, rel=1e-4)


# --------------------------------------------------------- period detect

def test_period_detect_finds_planted_cycle(spark, tmp_path):
    # 36 days with a strong period-4 cycle
    counts = [12 if d % 4 == 0 else 3 for d in range(36)]
    d = _daily_count_fixture(tmp_path, counts)
    out = {r["p"]: r
           for r in QUERIES["q_period_detect"](spark, d).collect()}
    assert set(out) == set(range(2, 11))
    assert out[4]["is_best"] is True
    assert sum(1 for r in out.values() if r["is_best"]) == 1
    # folded multiples also score high but below the fundamental
    assert out[4]["strength"] > out[7]["strength"]
    assert out[8]["strength"] > out[7]["strength"]  # harmonic of 4

    # brute for p=4
    n = len(counts)
    s = sum(counts); ss = sum(x * x for x in counts)
    phases = {}
    for di, x in enumerate(counts):
        ph = di % 4
        nph, sph = phases.get(ph, (0, 0))
        phases[ph] = (nph + 1, sph + x)
    ssb = sum(sp * sp / np for np, sp in phases.values()) - s * s / n
    sst = ss - s * s / n
    assert out[4]["strength"] == pytest.approx(ssb / sst, abs=2e-6)


def test_period_detect_constant_series_null(spark, tmp_path):
    d = _daily_count_fixture(tmp_path, [5] * 20)
    out = QUERIES["q_period_detect"](spark, d).collect()
    assert all(r["strength"] is None or r["strength"] == 0.0
               for r in out)


# --------------------------------------------------------- burst episodes

def test_burst_episodes_matches_brute(spark, tmp_path):
    import pandas as pd
    # median 5; bursts need 5x > 30 i.e. x >= 7: days 3-4 (8,9), day 8 (10)
    counts = [5, 5, 5, 8, 9, 5, 5, 4, 10, 5, 6, 5]
    rows = []
    for di, c in enumerate(counts):
        for k in range(c):
            rows.append((1, f"2024-09-{1 + di:02d} {8 + k}:00:00", "a"))
    d = _events_fixture(tmp_path, rows)
    out = {(r["event_type"], r["start_di"]): r
           for r in QUERIES["q_burst_episodes"](spark, d).collect()}
    assert len(out) == 2
    eps = sorted(out.values(), key=lambda r: r["start_di"])
    e1, e2 = eps
    assert e1["end_di"] - e1["start_di"] == 1     # days 3-4 run
    assert (e1["n_days"], e1["peak"], e1["total_events"]) == (2, 9, 17)
    assert e2["end_di"] - e2["start_di"] == 0     # day 8 solo
    assert (e2["n_days"], e2["peak"], e2["total_events"]) == (1, 10, 10)
    assert e1["median_daily"] == 5


def test_burst_episodes_flat_series_empty(spark, tmp_path):
    d = _daily_count_fixture(tmp_path, [6] * 10)
    assert QUERIES["q_burst_episodes"](spark, d).count() == 0


# ------------------------------------------------------------ stream srm

def test_stream_srm_equals_batch_srm(spark, tmp_path):
    import pandas as pd
    rows = [(i, f"2024-01-01 {i % 24:02d}:00:00", "t%d" % (i % 2))
            for i in range(200)]
    pdf = pd.DataFrame({
        "event_id": [i for i, _, _ in rows],
        "ts": pd.to_datetime([t for _, t, _ in rows]),
        "user_id": [1] * len(rows),
        "event_type": [e for _, _, e in rows],
        "value": [1.0] * len(rows),
        "props": [None] * len(rows),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")
    stream = {r["event_type"]: r
              for r in QUERIES["q_stream_srm"](spark, str(d)).collect()}
    batch = {r["event_type"]: r
             for r in QUERIES["q_srm_check"](spark, str(d)).collect()}
    assert set(stream) == set(batch)
    for et in batch:
        for col in ("n0", "n1", "chi2_srm", "srm_flag"):
            assert stream[et][col] == batch[et][col], (et, col)


# --------------------------------------------------------------- median ci

def test_median_ci_matches_brute(spark, tmp_path):
    import pandas as pd
    vals = [3, 7, 1, 9, 4, 6, 2, 8, 5, 10, 4, 6, 3, 7, 5,
            2, 9, 1, 8, 6, 5, 4, 7, 3, 6]
    rows = [(1, f"2024-01-01 {i % 24:02d}:00:00", float(v))
            for i, v in enumerate(vals)]
    pdf = pd.DataFrame({
        "event_id": range(len(rows)),
        "ts": pd.to_datetime([t for _, t, _ in rows]),
        "user_id": [1] * len(rows),
        "event_type": ["a"] * len(rows),
        "value": [v for _, _, v in rows],
        "props": [None] * len(rows),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")
    got = {r["event_type"]: r
           for r in QUERIES["q_median_ci"](spark, str(d)).collect()}["a"]
    cents = sorted(int(v * 100 + 0.5) for v in vals)
    n = len(cents)
    k_med = (5000 * n + 9999) // 10000
    l = max(1, int(math.floor(n / 2 - 1.96 * math.sqrt(n) / 2)))
    u = n - l + 1
    assert got["n"] == n
    assert (got["l_rank"], got["u_rank"]) == (l, u)
    assert got["median_cents"] == cents[k_med - 1]
    assert got["ci_lo_cents"] == cents[l - 1]
    assert got["ci_hi_cents"] == cents[u - 1]
    assert got["ci_lo_cents"] <= got["median_cents"] <= got["ci_hi_cents"]


# --------------------------------------------------------------- bowley

def test_bowley_skewness_matches_brute(spark, tmp_path):
    import pandas as pd
    # right-skewed values
    vals = [1, 1, 2, 2, 2, 3, 3, 4, 5, 8, 13, 21]
    rows = [(1, f"2024-01-01 {i % 24:02d}:00:00", float(v))
            for i, v in enumerate(vals)]
    pdf = pd.DataFrame({
        "event_id": range(len(rows)),
        "ts": pd.to_datetime([t for _, t, _ in rows]),
        "user_id": [1] * len(rows),
        "event_type": ["a"] * len(rows),
        "value": [v for _, _, v in rows],
        "props": [None] * len(rows),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")
    got = {r["event_type"]: r
           for r in QUERIES["q_bowley_skewness"](spark,
                                                 str(d)).collect()}["a"]
    cents = sorted(int(v * 100 + 0.5) for v in vals)
    n = len(cents)
    q = {bp: cents[(bp * n + 9999) // 10000 - 1]
         for bp in (2500, 5000, 7500)}
    assert (got["q1_cents"], got["q2_cents"], got["q3_cents"]) == (
        q[2500], q[5000], q[7500])
    exp = (q[7500] + q[2500] - 2 * q[5000]) / (q[7500] - q[2500])
    assert got["bowley_skew"] == pytest.approx(exp, abs=2e-6)
    assert got["bowley_skew"] > 0  # right-skewed fixture


def test_bowley_zero_iqr_null(spark, tmp_path):
    rows = [(1, "2024-01-01 10:00:00", "b")] * 12
    d = _events_fixture(tmp_path, rows)
    got = {r["event_type"]: r
           for r in QUERIES["q_bowley_skewness"](spark, d).collect()}["b"]
    assert got["bowley_skew"] is None


# ------------------------------------------------------------ wasserstein

def _two_type_fixture(tmp_path, vals_a, vals_b):
    import pandas as pd
    rows = ([("a", float(v)) for v in vals_a]
            + [("b", float(v)) for v in vals_b])
    pdf = pd.DataFrame({
        "event_id": range(len(rows)),
        "ts": pd.to_datetime(["2024-01-01 10:00:00"] * len(rows)),
        "user_id": [1] * len(rows),
        "event_type": [e for e, _ in rows],
        "value": [v for _, v in rows],
        "props": [None] * len(rows),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")
    return str(d)


def test_wasserstein_matches_scipy_free_brute(spark, tmp_path):
    va = [1, 2, 2, 3, 5, 8]
    vb = [2, 3, 3, 4, 9, 9]
    d = _two_type_fixture(tmp_path, va, vb)
    got = QUERIES["q_wasserstein_1d"](spark, d).collect()[0]
    # brute W1 between empirical distributions over the cents grid
    ca = sorted(int(v * 100 + 0.5) for v in va)
    cb = sorted(int(v * 100 + 0.5) for v in vb)
    na, nbn = len(ca), len(cb)
    ys = sorted(set(ca) | set(cb))
    w1 = 0
    for i in range(len(ys) - 1):
        fa = sum(1 for x in ca if x <= ys[i])
        fb = sum(1 for x in cb if x <= ys[i])
        w1 += abs(fa * nbn - fb * na) * (ys[i + 1] - ys[i])
    assert (got["et_a"], got["et_b"]) == ("a", "b")
    assert got["mass"] == w1
    assert got["w1_cents"] == pytest.approx(w1 / (na * nbn), abs=2e-6)
    # shift invariance sanity: identical distributions -> 0
    import shutil
    shutil.rmtree(tmp_path / "sf")
    d2 = _two_type_fixture(tmp_path, va, va)
    got2 = QUERIES["q_wasserstein_1d"](spark, d2).collect()[0]
    assert got2["mass"] == 0 and got2["w1_cents"] == 0.0


def test_wasserstein_pure_shift_equals_shift(spark, tmp_path):
    va = [1, 2, 3, 4]
    vb = [3, 4, 5, 6]  # every value shifted +2.00 -> W1 = 200 cents
    d = _two_type_fixture(tmp_path, va, vb)
    got = QUERIES["q_wasserstein_1d"](spark, d).collect()[0]
    assert got["w1_cents"] == pytest.approx(200.0, abs=2e-6)


# ---------------------------------------------------------------- overlap

def test_overlap_and_tv_match_brute(spark, tmp_path):
    va = [1, 1, 2, 3, 3, 3]
    vb = [1, 2, 2, 2, 4, 4]
    d = _two_type_fixture(tmp_path, va, vb)
    got = QUERIES["q_distribution_overlap"](spark, d).collect()[0]
    from collections import Counter
    ca = Counter(int(v * 100 + 0.5) for v in va)
    cb = Counter(int(v * 100 + 0.5) for v in vb)
    na, nbn = len(va), len(vb)
    ov = sum(min(ca.get(y, 0) * nbn, cb.get(y, 0) * na)
             for y in set(ca) | set(cb))
    assert got["overlap_bp"] == ov * 10000 // (na * nbn)
    assert got["tv_bp"] == 10000 - got["overlap_bp"]
    # disjoint supports -> overlap 0, TV 10000
    import shutil
    shutil.rmtree(tmp_path / "sf")
    d2 = _two_type_fixture(tmp_path, [1, 2], [5, 6])
    got2 = QUERIES["q_distribution_overlap"](spark, d2).collect()[0]
    assert (got2["overlap_bp"], got2["tv_bp"]) == (0, 10000)


# ----------------------------------------------------------------- shapley

def test_shapley_matches_brute(spark, tmp_path):
    import pandas as pd
    from itertools import combinations
    # users with controlled touch sets and conversion
    spec = [
        # (uid, touches, converted) — click is the strong channel
        (1, ("click",), 1), (2, ("click",), 1), (3, ("click",), 0),
        (4, ("view",), 0), (5, ("view",), 0), (6, ("view",), 1),
        (7, ("signup",), 0),
        (8, ("click", "view"), 1), (9, ("click", "view"), 1),
        (10, ("view", "signup"), 0),
        (11, ("click", "view", "signup"), 1),
        (12, (), 0), (13, (), 0),
    ]
    rows = []
    for uid, touches, conv in spec:
        for i, t in enumerate(touches):
            rows.append((uid, f"2024-01-01 {8 + i:02d}:00:00", t))
        if conv:
            rows.append((uid, "2024-01-01 20:00:00", "purchase"))
        if not touches and not conv:
            rows.append((uid, "2024-01-01 07:00:00", "error"))
    d = _events_fixture(tmp_path, rows)
    got = {r["channel"]: r
           for r in QUERIES["q_shapley_attribution"](spark, d).collect()}

    chans = ("click", "view", "signup")
    vmap = {}
    for uid, touches, conv in spec:
        key = frozenset(touches)
        n, c = vmap.get(key, (0, 0))
        vmap[key] = (n + 1, c + conv)

    def v(S):
        n, c = vmap.get(frozenset(S), (0, 0))
        return c / n if n > 0 else 0.0

    import math as _m
    for ch in chans:
        others = [c for c in chans if c != ch]
        phi = 0.0
        for r in range(3):
            for S in combinations(others, r):
                w = (_m.factorial(len(S)) * _m.factorial(3 - len(S) - 1)
                     / _m.factorial(3))
                phi += w * (v(set(S) | {ch}) - v(S))
        assert got[ch]["phi_shapley"] == pytest.approx(phi, abs=2e-6), ch
    # the strong channel earns the most credit
    assert (got["click"]["phi_shapley"] > got["view"]["phi_shapley"]
            > got["signup"]["phi_shapley"])
    assert got["click"]["n_touched"] == 6


def test_shapley_efficiency_identity(spark, tmp_path):
    # sum of phis == v(grand coalition) - v(empty) when every coalition
    # along the chain is observed
    rows = []
    uid = 0
    for touches, conv_rate_n in [((), (0, 4)), (("click",), (2, 4)),
                                 (("view",), (1, 4)), (("signup",), (1, 4)),
                                 (("click", "view"), (3, 4)),
                                 (("click", "signup"), (2, 4)),
                                 (("view", "signup"), (2, 4)),
                                 (("click", "view", "signup"), (4, 4))]:
        conv, n = conv_rate_n
        for j in range(n):
            uid += 1
            for i, t in enumerate(touches):
                rows.append((uid, f"2024-01-01 {8 + i:02d}:00:00", t))
            if j < conv:
                rows.append((uid, "2024-01-01 20:00:00", "purchase"))
            elif not touches:
                rows.append((uid, "2024-01-01 07:00:00", "error"))
    d = _events_fixture(tmp_path, rows)
    out = QUERIES["q_shapley_attribution"](spark, d).collect()
    total = sum(r["phi_shapley"] for r in out)
    assert total == pytest.approx(1.0 - 0.0, abs=5e-6)  # v(C)=1, v({})=0
