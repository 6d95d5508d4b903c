"""Web-curation operators: URL canonicalization, registered-domain
extraction, per-host document caps.

These are the first stages of every large-scale web corpus pipeline
(CommonCrawl-style): normalize each document's URL so exact-dup and
host-level policies key on a canonical form, group by the *registered
domain* (not the full host, so ``cdn1.example.com`` and
``www.example.com`` share a budget), and cap the number of documents any
one domain contributes (deterministically, so reruns keep the same
docs).

Everything is pure Column math (JVM codegen, no UDFs) — these run per
document over billions of rows.  The per-host cap is a rank-pushed
window (WindowGroupLimit): with cap k the shuffle carries at most k rows
per domain past the partial limit, so a 100 TB corpus with a
pathological megasite does not funnel that site through one task's
full sort.

The reference engine has no web stage (its inputs are model output
files); these operators extend the engine for the training-data
pipeline surface (build brief: dedup/curation ops are first-class).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: Query parameters that never change page content — stripped during
#: canonicalization (click/campaign trackers).
TRACKING_PARAMS = ("utm_", "fbclid", "gclid", "msclkid", "mc_eid", "igshid")

#: Multi-label public suffixes the 2-label heuristic would split wrong.
#: (A full public-suffix list is a broadcast dim in production; this
#: built-in core keeps the operator dependency-free.)
MULTI_LABEL_TLDS = ("co.uk", "org.uk", "ac.uk", "gov.uk", "com.au",
                    "net.au", "org.au", "co.jp", "co.nz", "co.in",
                    "com.br", "com.cn", "com.mx", "co.za")


def url_scheme(url: Column) -> Column:
    """Lower-cased scheme (``https``), '' when the URL has none."""
    return F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))


def _url_hostport(url: Column) -> Column:
    """Authority with any ``user:pass@`` userinfo stripped (userinfo is
    everything up to the LAST '@' per RFC 3986 — the host may not
    contain one) — 'https://user:pass@h/x' keyed on 'user' before this
    (r8 ADVICE)."""
    auth = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    return F.regexp_replace(auth, r"^.*@", "")


def url_host(url: Column) -> Column:
    """Lower-cased host with userinfo and any ``:port`` removed.
    Bracketed IPv6 literals keep their brackets: '[::1]:8080' →
    '[::1]' (the ':' inside the brackets is not a port separator)."""
    hp = _url_hostport(url)
    return F.lower(
        F.when(hp.startswith("["),
               F.regexp_extract(hp, r"^(\[[^\]]*\])", 1))
         .otherwise(F.regexp_extract(hp, r"^([^:]*)", 1)))


def url_port(url: Column) -> Column:
    """Explicit port as a string ('' when absent); userinfo-safe and
    IPv6-safe (':' inside '[…]' never reads as a port)."""
    return F.regexp_extract(_url_hostport(url), r":([0-9]+)$", 1)


def url_path(url: Column) -> Column:
    """Path component (no query/fragment); '' → '/' and a single
    trailing slash on a non-root path is dropped."""
    p = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    p = F.when(p == "", F.lit("/")).otherwise(p)
    return F.when((F.length(p) > 1) & p.endswith("/"),
                  F.substring(p, 1, F.length(p) - 1)).otherwise(p)


def url_query_canonical(url: Column) -> Column:
    """Query string with tracking params dropped and the remaining
    ``k=v`` pairs sorted (byte order) — '' when nothing survives."""
    q = F.regexp_extract(url, r"\?([^#]*)", 1)
    parts = F.split(q, "&")

    def keep(p):
        cond = (p != "")
        for t in TRACKING_PARAMS:
            if t.endswith("_"):
                cond = cond & ~p.startswith(t)
            else:
                cond = cond & ~(p == t) & ~p.startswith(t + "=")
        return cond
    kept = F.array_sort(F.filter(parts, keep))
    return F.when(q == "", F.lit("")).otherwise(F.array_join(kept, "&"))


def canonicalize_url(url: Column) -> Column:
    """Canonical form: lower scheme+host, default ports stripped
    (https:443 / http:80), tracking params dropped, surviving params
    sorted, fragment removed, non-root trailing slash dropped.
    NULL-safe: NULL url → NULL."""
    scheme, host, port = url_scheme(url), url_host(url), url_port(url)
    keep_port = (
        (port != "")
        & ~((scheme == "https") & (port == "443"))
        & ~((scheme == "http") & (port == "80"))
    )
    qc = url_query_canonical(url)
    return F.concat(
        scheme, F.lit("://"), host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        url_path(url),
        F.when(qc == "", F.lit("")).otherwise(F.concat(F.lit("?"), qc)),
    )


def registered_domain(host: Column) -> Column:
    """Registrable domain: last 2 labels, or 3 when the 2-label suffix
    is a known multi-label TLD (``a.b.co.uk`` → ``b.co.uk``)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    two = F.concat_ws(".", F.slice(labels, F.greatest(n - 1, F.lit(1)).cast("int"), 2))
    three = F.concat_ws(".", F.slice(labels, F.greatest(n - 2, F.lit(1)).cast("int"), 3))
    is_multi = F.lit(False)
    for t in MULTI_LABEL_TLDS:
        is_multi = is_multi | (two == t)
    return F.when(is_multi & (n >= 3), three).otherwise(two)


def per_host_cap(df: DataFrame, url_col: str, cap: int,
                 id_col: str) -> DataFrame:
    """Keep at most ``cap`` documents per registered domain, chosen by a
    deterministic pseudo-random order (md5 of the canonical URL, id
    tiebreak) so reruns and engine changes keep the same sample.

    Plan shape: one shuffle on the domain key with a rank-pushed window
    (WindowGroupLimit) — each map task forwards at most ``cap`` rows per
    domain, so hot megasites never sort their full row set in one task.
    Output adds ``domain`` and ``canonical_url``.
    """
    canon = canonicalize_url(F.col(url_col))
    keyed = df.withColumn("canonical_url", canon) \
              .withColumn("domain", registered_domain(url_host(F.col(url_col))))
    w = Window.partitionBy("domain").orderBy(
        F.md5(F.col("canonical_url")), F.col(id_col))
    return (keyed
            .withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= cap)
            .drop("__rk"))
