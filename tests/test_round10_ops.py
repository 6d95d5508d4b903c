"""Round-10 operators: directed containment pairs, confusable-skeleton
dedup, degree assortativity.

The registry gate (tools/check_correctness.py) proves oracle parity;
these tests pin the SEMANTIC invariants the oracle can't express:
containment fires on the subset shape Jaccard misses, the skeleton is
invariant under homoglyph respelling, and the assortativity agrees
with an independent float implementation.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


LONG = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon")
SUB = "alpha beta gamma delta epsilon zeta eta theta"  # prefix subset


@pytest.fixture(scope="module")
def containment(spark):
    from access_mopper_spark.operators.dedup import containment_pairs
    rows = [
        (1, LONG),
        (2, SUB),                 # word 3-grams of 2 are a subset of 1's
        (3, "completely unrelated text about spark adaptive execution"),
        (4, None),                # NULL text: never a candidate
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # band_size=1 (each hash its own band): containment targets are
    # LOW-Jaccard by nature (J = |sub|/|sup| = 0.33 here), so single-
    # hash bands are the right index config for this workload — the
    # registry row keeps the (6,2) near-dup config and documents that
    # its recall comes from near-dup families
    out = containment_pairs(df, "text", "doc_id", n_hashes=6, band_size=1,
                            shingle_k=3, containment_bp_threshold=8000)
    return {(r["id_sub"], r["id_sup"]): r["containment_bp"]
            for r in out.collect()}


def test_subset_direction_fires_at_10000(containment):
    # every word 3-gram of SUB appears in LONG -> containment exactly 1.0
    assert containment[(2, 1)] == 10000


def test_superset_direction_below_threshold(containment):
    # LONG's shingles are mostly NOT in SUB -> the (1, 2) direction
    # must not reach 8000 bp (this is the asymmetry Jaccard collapses)
    assert (1, 2) not in containment


def test_null_text_never_pairs(containment):
    assert not any(4 in k for k in containment)


def test_jaccard_misses_the_subset_pair(spark):
    # the motivating case: near_dup_pairs (Jaccard >= 0.5) does NOT
    # report the subset pair containment_pairs exists for
    from access_mopper_spark.operators.dedup import near_dup_pairs
    df = spark.createDataFrame([(1, LONG), (2, SUB)], ["doc_id", "text"])
    jac = near_dup_pairs(df, "text", "doc_id", n_hashes=6, band_size=2,
                         shingle_k=3, jaccard_threshold=0.5)
    assert jac.count() == 0


def test_confusable_skeleton_folds_homoglyphs(spark):
    from access_mopper_spark.functions.text import confusable_skeleton
    rows = [
        (1, "paypal account verify"),
        # Cyrillic а/у/с/е/о lookalikes + NBSP separator + trailing run
        (2, "раypаl аccount   verify "),
        (3, "PAYPAL ACCOUNT VERIFY"),
        (4, "different text entirely"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["sk"] for r in df.select(
        "doc_id", confusable_skeleton(F.col("text")).alias("sk")).collect()}
    assert got[1] == got[2] == got[3] == "paypal account verify"
    assert got[4] != got[1]


def test_confusable_skeleton_sql_matches_spark(spark):
    # the oracle builder and the Column implementation must agree on
    # hostile inputs (this is the pair the registry gate hashes)
    import duckdb

    from access_mopper_spark.functions.text import (confusable_skeleton,
                                                    confusable_skeleton_sql)
    texts = ["раypаl аccount", "MIXED Саѕе Теxt",
             "tabs\there\nand  runs", "ideographic　space",
             "plain ascii", "ωμέγα not mapped"]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["sk"] for r in df.select(
        "doc_id", confusable_skeleton(F.col("text")).alias("sk")).collect()}
    con = duckdb.connect()
    for i, t in enumerate(texts):
        want = con.execute(
            f"SELECT {confusable_skeleton_sql('?')}", [t]).fetchone()[0]
        assert got[i] == want, (t, got[i], want)


def test_degree_assortativity_matches_numpy(spark, tmp_path):
    # independent float implementation over the same co-purchase graph
    import numpy as np

    from access_mopper_spark.queries import QUERIES
    sf_dir = "/root/testdata/sf0.001"
    row = QUERIES["q_degree_assortativity"](spark, sf_dir).collect()[0]

    from access_mopper_spark.sources.readers import load_table
    li = (load_table(spark, sf_dir, "lineitem")
          .where(F.col("l_quantity") > 25)
          .select("l_orderkey", "l_partkey").collect())
    from collections import defaultdict
    by_order = defaultdict(set)
    for r in li:
        by_order[r["l_orderkey"]].add(r["l_partkey"])
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    deg = defaultdict(int)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    xs, ys = [], []
    for a, b in edges:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    assert row["m_directed"] == len(xs)
    want = np.corrcoef(np.array(xs, dtype=float),
                       np.array(ys, dtype=float))[0, 1]
    assert row["assortativity"] == pytest.approx(want, abs=2e-6)


def test_assortativity_null_on_degenerate_graph(spark):
    # all degrees equal -> zero variance -> NULL guard (not NaN/inf)
    from access_mopper_spark.queries._core import QUERIES  # noqa: F401
    df = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 30), (2, 40)],
        ["l_orderkey", "l_partkey"])
    # reuse the query body shape inline: a 2-edge graph where every
    # node has degree 1
    e1 = df.select("l_orderkey", F.col("l_partkey").alias("a"))
    e2 = df.select("l_orderkey", F.col("l_partkey").alias("b"))
    pairs = (e1.join(e2, "l_orderkey").where(F.col("a") < F.col("b"))
               .select("a", "b").distinct())
    deg = (pairs.select(F.col("a").alias("node"))
                .unionAll(pairs.select(F.col("b").alias("node")))
                .groupBy("node").agg(F.count("*").cast("long").alias("d")))
    direct = (pairs.select(F.col("a").alias("x"), F.col("b").alias("y"))
                   .unionAll(pairs.select(F.col("b").alias("x"),
                                          F.col("a").alias("y"))))
    j = (direct.join(deg.select(F.col("node").alias("x"),
                                F.col("d").alias("xd")), "x")
               .join(deg.select(F.col("node").alias("y"),
                                F.col("d").alias("yd")), "y"))
    s = j.agg(F.count("*").cast("long").alias("m"),
              F.sum("xd").alias("sx"), F.sum("yd").alias("sy"),
              F.sum(F.col("xd") * F.col("yd")).alias("sxy"),
              F.sum(F.col("xd") * F.col("xd")).alias("sxx"),
              F.sum(F.col("yd") * F.col("yd")).alias("syy")).collect()[0]
    md = float(s["m"])
    vx = md * s["sxx"] - float(s["sx"]) ** 2
    assert vx == 0.0  # degenerate by construction -> query emits NULL


def test_ks_drift_matches_python(spark):
    # independent float-free ECDF implementation on sf0.001
    import math
    from collections import defaultdict

    from access_mopper_spark.queries import QUERIES
    from access_mopper_spark.sources.readers import load_table
    sf_dir = "/root/testdata/sf0.001"
    got = {r["event_type"]: r for r in
           QUERIES["q_ks_drift"](spark, sf_dir).collect()}

    rows = (load_table(spark, sf_dir, "events")
            .selectExpr("event_type",
                        "CAST(FLOOR(value*100 + 0.5) AS LONG) AS cents",
                        "unix_micros(ts) AS us")
            .where("value IS NOT NULL AND ts IS NOT NULL").collect())
    mid = (min(r["us"] for r in rows) + max(r["us"] for r in rows)) // 2
    by_type = defaultdict(lambda: ([], []))
    for r in rows:
        by_type[r["event_type"]][0 if r["us"] <= mid else 1].append(r["cents"])
    for t, (e, l) in by_type.items():
        n1, n2 = len(e), len(l)
        support = sorted(set(e) | set(l))
        d_num = 0
        c1 = c2 = 0
        from bisect import bisect_right
        e.sort(); l.sort()
        for v in support:
            c1 = bisect_right(e, v)
            c2 = bisect_right(l, v)
            d_num = max(d_num, abs(c1 * n2 - c2 * n1))
        assert got[t]["n_early"] == n1 and got[t]["n_late"] == n2
        assert got[t]["d_num"] == d_num, t
        want = d_num / (n1 * n2)
        assert got[t]["d_stat"] == pytest.approx(want, abs=1e-6)


def test_mannwhitney_matches_python(spark):
    from collections import defaultdict

    from access_mopper_spark.queries import QUERIES
    from access_mopper_spark.sources.readers import load_table
    sf_dir = "/root/testdata/sf0.001"
    got = {r["c_nationkey"]: r for r in
           QUERIES["q_mannwhitney_u"](spark, sf_dir).collect()}
    rows = (load_table(spark, sf_dir, "customer")
            .selectExpr("c_nationkey", "c_mktsegment",
                        "CAST(FLOOR(c_acctbal*100 + 0.5) AS LONG) AS cents")
            .where("c_mktsegment IN ('BUILDING','MACHINERY')"
                   " AND c_acctbal IS NOT NULL").collect())
    by_nation = defaultdict(list)
    for r in rows:
        by_nation[r["c_nationkey"]].append(
            (r["cents"], 1 if r["c_mktsegment"] == "BUILDING" else 0))
    for nk, vals in by_nation.items():
        vals.sort()
        # textbook average ranks (1-based), doubled to stay integral
        n = len(vals)
        i = 0
        r1x2 = 0
        n1 = sum(s for _, s in vals)
        while i < n:
            j = i
            while j < n and vals[j][0] == vals[i][0]:
                j += 1
            dar = (i + 1 + j) # 2*avg_rank = (i+1) + j  (1-based min+max)
            for k in range(i, j):
                if vals[k][1] == 1:
                    r1x2 += dar
            i = j
        u_x2 = r1x2 - n1 * (n1 + 1)
        assert got[nk]["n_building"] == n1
        assert got[nk]["u_building_x2"] == u_x2, nk


def test_chao1_and_good_turing_fixture(spark, tmp_path):
    # 'a a b c' -> S=3, f1=2, f2=1, chao1 = 3 + 4/2 = 5.0
    #           -> N=4, singleton types=2, p0 = 2/4 = 5000 bp
    import os
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    df = spark.createDataFrame(
        [(1, "a a b", "en", "s1", 5), (2, "c", "en", "s1", 1)],
        ["doc_id", "text", "lang", "source", "n_chars"])
    df.coalesce(1).write.mode("overwrite").parquet(d + "/__tmp")
    import glob
    import shutil
    shutil.move(glob.glob(d + "/__tmp/part-*.parquet")[0],
                d + "/documents.parquet")
    shutil.rmtree(d + "/__tmp")
    from access_mopper_spark.queries import QUERIES
    c = QUERIES["q_chao1_richness"](spark, d).collect()[0]
    assert (c["s_obs"], c["f1"], c["f2"]) == (3, 2, 1)
    assert c["chao1"] == pytest.approx(5.0)
    g = QUERIES["q_good_turing_mass"](spark, d).collect()[0]
    assert (g["n_tokens"], g["n_singletons"], g["p0_bp"]) == (4, 2, 5000)


def test_cuped_matches_numpy(spark):
    import numpy as np
    from collections import defaultdict

    from access_mopper_spark.queries import QUERIES
    from access_mopper_spark.sources.readers import load_table
    sf_dir = "/root/testdata/sf0.001"
    got = {r["arm"]: r for r in
           QUERIES["q_cuped_adjustment"](spark, sf_dir).collect()}
    rows = (load_table(spark, sf_dir, "events")
            .selectExpr("user_id",
                        "CAST(FLOOR(value*100 + 0.5) AS LONG) AS cents",
                        "unix_micros(ts) AS us")
            .where("value IS NOT NULL AND ts IS NOT NULL").collect())
    mid = (min(r["us"] for r in rows) + max(r["us"] for r in rows)) // 2
    per = defaultdict(lambda: [0, 0])
    for r in rows:
        per[r["user_id"]][0 if r["us"] <= mid else 1] += r["cents"]
    users = sorted(per)
    x = np.array([per[u][0] for u in users], dtype=float)
    y = np.array([per[u][1] for u in users], dtype=float)
    theta = ((len(x) * (x * y).sum() - x.sum() * y.sum())
             / (len(x) * (x * x).sum() - x.sum() ** 2))
    for arm in (0, 1):
        sel = np.array([u % 2 == arm for u in users])
        mean_y = y[sel].mean()
        adj = mean_y - theta * (x[sel].mean() - x.mean())
        assert got[arm]["n_users"] == int(sel.sum())
        assert got[arm]["mean_y"] == pytest.approx(mean_y, abs=1e-5)
        assert got[arm]["mean_y_adj"] == pytest.approx(adj, abs=1e-5)
        assert got[arm]["theta"] == pytest.approx(theta, abs=1e-6)


def test_winsorized_mean_matches_python(spark):
    from collections import defaultdict

    from access_mopper_spark.queries import QUERIES
    from access_mopper_spark.sources.readers import load_table
    sf_dir = "/root/testdata/sf0.001"
    got = {r["event_type"]: r for r in
           QUERIES["q_winsorized_mean"](spark, sf_dir).collect()}
    rows = (load_table(spark, sf_dir, "events")
            .selectExpr("event_type",
                        "CAST(FLOOR(value*100 + 0.5) AS LONG) AS cents")
            .where("value IS NOT NULL").collect())
    by_type = defaultdict(list)
    for r in rows:
        by_type[r["event_type"]].append(r["cents"])
    for t, vals in by_type.items():
        vals.sort()
        n = len(vals)
        p5 = vals[(n + 19) // 20 - 1]      # smallest value with cum >= ceil(n/20)
        p95 = vals[(19 * n + 19) // 20 - 1]
        wsum = sum(min(max(v, p5), p95) for v in vals)
        assert got[t]["n_rows"] == n
        assert got[t]["p5_cents"] == p5 and got[t]["p95_cents"] == p95, t
        assert got[t]["wsum_cents"] == wsum
        assert got[t]["wmean_cents"] == pytest.approx(wsum / n, abs=1e-6)


def test_local_clustering_matches_python(spark):
    from collections import defaultdict
    from itertools import combinations

    from access_mopper_spark.queries import QUERIES
    from access_mopper_spark.sources.readers import load_table
    sf_dir = "/root/testdata/sf0.001"
    got = {r["node"]: r for r in
           QUERIES["q_local_clustering"](spark, sf_dir).collect()}
    li = (load_table(spark, sf_dir, "lineitem")
          .where(F.col("l_quantity") > 25)
          .select("l_orderkey", "l_partkey").collect())
    by_order = defaultdict(set)
    for r in li:
        by_order[r["l_orderkey"]].add(r["l_partkey"])
    adj = defaultdict(set)
    for parts in by_order.values():
        for a, b in combinations(sorted(parts), 2):
            adj[a].add(b)
            adj[b].add(a)
    assert set(got) == set(adj)
    for v, nbrs in adj.items():
        tri = sum(1 for a, b in combinations(sorted(nbrs), 2)
                  if b in adj[a])
        d = len(nbrs)
        assert got[v]["triangles"] == tri, v
        assert got[v]["d"] == d
        if d >= 2:
            assert got[v]["lcc_bp"] == (tri * 20000) // (d * (d - 1))
        else:
            assert got[v]["lcc_bp"] is None


def test_audience_overlap_matches_python(spark):
    from collections import defaultdict

    from access_mopper_spark.queries import QUERIES
    from access_mopper_spark.sources.readers import load_table
    sf_dir = "/root/testdata/sf0.001"
    got = {(r["type_a"], r["type_b"]): r for r in
           QUERIES["q_audience_overlap"](spark, sf_dir).collect()}
    rows = (load_table(spark, sf_dir, "events")
            .where(F.col("user_id").isNotNull())
            .select("event_type", "user_id").distinct().collect())
    users = defaultdict(set)
    for r in rows:
        users[r["event_type"]].add(r["user_id"])
    types = sorted(users)
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            ib = len(users[a] & users[b])
            if ib == 0 and (a, b) not in got:
                continue
            r = got[(a, b)]
            un = len(users[a] | users[b])
            assert (r["n_a"], r["n_b"], r["n_both"]) == (
                len(users[a]), len(users[b]), ib)
            assert r["jaccard_bp"] == (ib * 10000) // un


def test_rbo_matches_python(spark):
    from access_mopper_spark.queries import QUERIES
    from access_mopper_spark.queries.round10_ops import (_RBO_K, _RBO_QUERY,
                                                         _RBO_W)
    from access_mopper_spark.sources.readers import load_table
    import math
    sf_dir = "/root/testdata/sf0.001"
    row = QUERIES["q_rbo_rankings"](spark, sf_dir).collect()[0]

    docs = [(r["doc_id"], r["text"]) for r in
            load_table(spark, sf_dir, "documents")
            .select("doc_id", "text").collect()]
    import re
    def toks(t):
        return [w for w in re.sub(r"[ \t\n\r]+", " ", t or "").strip(" ")
                .split(" ")]
    dls = {d: len(toks(t)) for d, t in docs}
    n = len(docs)
    avgdl = sum(dls.values()) / n
    tf = {}
    for d, t in docs:
        for w in toks(t):
            if w in _RBO_QUERY:
                tf[(d, w)] = tf.get((d, w), 0) + 1
    df = {}
    for (d, w) in tf:
        df[w] = df.get(w, 0) + 1

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    bm25, tfidf = {}, {}
    for (d, w), f in tf.items():
        idf = math.log(1 + (n - df[w] + 0.5) / (df[w] + 0.5))
        bm25[d] = bm25.get(d, 0.0) + idf * f * 2.2 / (
            f + 1.2 * (1 - 0.75 + 0.75 * dls[d] / avgdl))
        tfidf[d] = tfidf.get(d, 0.0) + f * math.log(n / df[w])
    ra = {d: i + 1 for i, (d, _) in enumerate(
        sorted(bm25.items(), key=lambda kv: (-r6(kv[1]), kv[0]))[:_RBO_K])}
    rb = {d: i + 1 for i, (d, _) in enumerate(
        sorted(tfidf.items(), key=lambda kv: (-r6(kv[1]), kv[0]))[:_RBO_K])}
    ms = [max(ra[d], rb[d]) for d in set(ra) & set(rb)]
    rbo_e12 = sum(w * sum(1 for m in ms if m <= d) for d, w in _RBO_W)
    assert row["n_common"] == len(ms)
    assert row["rbo_e12"] == rbo_e12
    assert row["overlap_at_k"] == sum(1 for m in ms if m <= _RBO_K)


def test_rbo_identical_lists_upper_bound():
    # X_d = d for identical lists: truncated RBO@20(p=.9) must match
    # the closed-form prefix sum of the embedded weights exactly
    from access_mopper_spark.queries.round10_ops import _RBO_W
    assert sum(w * d for d, w in _RBO_W) == 878423345429


def test_quantile_drift_matches_python(spark):
    from collections import defaultdict

    from access_mopper_spark.queries import QUERIES
    from access_mopper_spark.sources.readers import load_table
    sf_dir = "/root/testdata/sf0.001"
    got = {(r["event_type"], r["q_pct"]): r for r in
           QUERIES["q_quantile_drift"](spark, sf_dir).collect()}
    rows = (load_table(spark, sf_dir, "events")
            .selectExpr("event_type",
                        "CAST(FLOOR(value*100 + 0.5) AS LONG) AS cents",
                        "unix_micros(ts) AS us")
            .where("value IS NOT NULL AND ts IS NOT NULL").collect())
    mid = (min(r["us"] for r in rows) + max(r["us"] for r in rows)) // 2
    by = defaultdict(lambda: ([], []))
    for r in rows:
        by[r["event_type"]][0 if r["us"] <= mid else 1].append(r["cents"])
    for t, (e, l) in by.items():
        e.sort(); l.sort()
        for q in (10, 25, 50, 75, 90):
            pe = e[(q * len(e) + 99) // 100 - 1] if e else None
            pl = l[(q * len(l) + 99) // 100 - 1] if l else None
            r = got[(t, q)]
            assert r["p_early"] == pe and r["p_late"] == pl, (t, q)
            assert r["delta_cents"] == pl - pe


def test_segmented_trend_matches_numpy(spark):
    import numpy as np
    from collections import defaultdict

    from access_mopper_spark.queries import QUERIES
    from access_mopper_spark.sources.readers import load_table
    sf_dir = "/root/testdata/sf0.001"
    got = {r["event_type"]: r for r in
           QUERIES["q_segmented_trend"](spark, sf_dir).collect()}
    rows = (load_table(spark, sf_dir, "events")
            .selectExpr("event_type",
                        "CAST(FLOOR(value*100 + 0.5) AS LONG) AS y",
                        "unix_micros(ts) AS us")
            .where("value IS NOT NULL AND ts IS NOT NULL").collect())
    mn = min(r["us"] for r in rows)
    mid = (mn + max(r["us"] for r in rows)) // 2
    by = defaultdict(lambda: ([], []))
    for r in rows:
        by[r["event_type"]][0 if r["us"] <= mid else 1].append(
            ((r["us"] - mn) // 3600000000, r["y"]))
    for t, halves in by.items():
        slopes = []
        for pts in halves:
            x = np.array([p[0] for p in pts], dtype=float)
            y = np.array([p[1] for p in pts], dtype=float)
            n = len(x)
            den = n * (x * x).sum() - x.sum() ** 2
            slopes.append((n * (x * y).sum() - x.sum() * y.sum()) / den
                          if den > 0 else None)
        assert got[t]["n_early"] == len(halves[0])
        assert got[t]["slope_early"] == pytest.approx(slopes[0], abs=1e-5)
        assert got[t]["slope_late"] == pytest.approx(slopes[1], abs=1e-5)
        assert got[t]["slope_delta"] == pytest.approx(
            slopes[1] - slopes[0], abs=1e-5)


def test_hhi_fixture(spark, tmp_path):
    # shares 3/4 and 1/4 -> HHI = 9/16 + 1/16 = 0.625 -> 6250 bp
    import glob
    import os
    import shutil
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    df = spark.createDataFrame(
        [(i, "t", "en", "s1" if i < 3 else "s2", 1) for i in range(4)],
        ["doc_id", "text", "lang", "source", "n_chars"])
    df.coalesce(1).write.mode("overwrite").parquet(d + "/__tmp")
    shutil.move(glob.glob(d + "/__tmp/part-*.parquet")[0],
                d + "/documents.parquet")
    shutil.rmtree(d + "/__tmp")
    from access_mopper_spark.queries import QUERIES
    r = QUERIES["q_hhi_concentration"](spark, d).collect()[0]
    assert (r["n_sources"], r["n_docs"]) == (2, 4)
    assert r["hhi_bp"] == 6250
    assert r["top_share_bp"] == 7500


def test_ess_weights_fixture(spark, tmp_path):
    # weights (1, 1, 2): ESS = 16/6 = 2.6667, ratio = 8888 bp
    import glob
    import os
    import shutil
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    df = spark.createDataFrame(
        [(1, "t", "en", "s1", 1), (2, "t", "en", "s1", 1),
         (3, "t", "en", "s1", 2)],
        ["doc_id", "text", "lang", "source", "n_chars"])
    df.coalesce(1).write.mode("overwrite").parquet(d + "/__tmp")
    shutil.move(glob.glob(d + "/__tmp/part-*.parquet")[0],
                d + "/documents.parquet")
    shutil.rmtree(d + "/__tmp")
    from access_mopper_spark.queries import QUERIES
    r = QUERIES["q_ess_weights"](spark, d).collect()[0]
    assert (r["n_docs"], r["sum_w"], r["sum_w2"]) == (3, 4, 6)
    assert r["ess"] == pytest.approx(16 / 6, abs=1e-6)
    assert r["ess_ratio_bp"] == int(16 / 6 * 10000 / 3)


def test_coverage_topk_fixture(spark, tmp_path):
    # counts 6,2,1,1 (N=10): k50 -> top1 (6 >= 5); k90 -> top3 (9 >= 9)
    import glob
    import os
    import shutil
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    rows = []
    i = 0
    for src, cnt in [("a", 6), ("b", 2), ("c", 1), ("d", 1)]:
        for _ in range(cnt):
            rows.append((i, "t", "en", src, 1))
            i += 1
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"])
    df.coalesce(1).write.mode("overwrite").parquet(d + "/__tmp")
    shutil.move(glob.glob(d + "/__tmp/part-*.parquet")[0],
                d + "/documents.parquet")
    shutil.rmtree(d + "/__tmp")
    from access_mopper_spark.queries import QUERIES
    r = QUERIES["q_coverage_topk"](spark, d).collect()[0]
    assert (r["n_sources"], r["n_docs"], r["k50"], r["k90"]) == (4, 10, 1, 3)
