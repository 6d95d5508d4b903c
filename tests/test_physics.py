"""Physics kernels vs the reference's check values.

``rho_from_theta`` is the Jackett & McDougall (2006) 25-term rational
polynomial used verbatim by the reference (original/subroutines/
app_functions.py:683-714); the published check value rho(25, 35, 2000 db)
= 1031.65056056576 kg/m3 pins the exact coefficient set — the previous
round shipped a near-miss set the oracle couldn't catch (ADVICE r1).
``fix_packing_division`` follows app_functions.py:735-738: divide FIRST,
then replace zero results with half the min positive result.
"""

import numpy as np
from pyspark.sql import functions as F

from access_mopper_spark.functions.physics import (
    fix_packing_division,
    rho_from_theta,
    sw_press,
)


def _rho_np(th, s, p):
    """Independent numpy evaluation of the reference's coefficient set."""
    th2 = th * th
    sqrts = np.sqrt(s)
    anum = (
        9.9984085444849347e02
        + th * (7.3471625860981584e00
                + th * (-5.3211231792841769e-02 + th * 3.6492439109814549e-04))
        + s * (2.5880571023991390e00
               - th * 6.7168282786692355e-03
               + s * 1.9203202055760151e-03)
        + p * (1.1798263740430364e-02
               + th2 * 9.8920219266399117e-08
               + s * 4.6996642771754730e-06
               - p * (2.5862187075154352e-08 + th2 * 3.2921414007960662e-12))
    )
    aden = (
        1.0
        + th * (7.2815210113327091e-03
                + th * (-4.4787265461983921e-05
                        + th * (3.3851002965802430e-07 + th * 1.3651202389758572e-10)))
        + s * (1.7632126669040377e-03
               - th * (8.8066583251206474e-06 + th2 * 1.8832689434804897e-10)
               + sqrts * (5.7463776745432097e-06 + th2 * 1.4716275472242334e-09))
        + p * (6.7103246285651894e-06
               - (p * th) * (th2 * 2.4461698007024582e-17 + p * 9.1534417604289062e-18))
    )
    return anum / aden


def test_rho_check_value_published(spark):
    """The J&M 2006 appendix check point — catches any coefficient drift."""
    df = spark.range(1).select(
        rho_from_theta(F.lit(25.0), F.lit(35.0), F.lit(2000.0)).alias("rho"))
    got = df.first()["rho"]
    assert abs(got - 1031.65056056576) < 1e-8


def test_rho_matches_reference_kernel_grid(spark):
    """Column math == numpy evaluation across a (theta, salt, press) grid,
    including the p == 0 branch the reference handles via pmask."""
    pts = [(th, s, p)
           for th in (-2.0, 0.0, 4.0, 10.0, 25.0, 35.0)
           for s in (0.0, 5.0, 34.7, 35.0, 40.0)
           for p in (0.0, 10.0, 500.0, 2000.0, 6000.0)]
    df = spark.createDataFrame(pts, ["th", "s", "p"]).select(
        "th", "s", "p", rho_from_theta(F.col("th"), F.col("s"), F.col("p")).alias("rho"))
    for r in df.collect():
        want = _rho_np(r["th"], r["s"], r["p"])
        assert abs(r["rho"] - want) <= 1e-9 * max(1.0, abs(want)), (r["th"], r["s"], r["p"])


def test_fix_packing_division_reference_semantics(spark):
    """vout==0 rows get 0.5*min(vout[vout>0]); nonzero quotients pass
    through untouched — post-division replacement, not denominator fixup."""
    rows = [(0.0, 2.0), (4.0, 2.0), (1.0, 4.0), (0.0, 8.0), (10.0, 5.0)]
    df = spark.createDataFrame(rows, ["num", "den"])
    mp = df.agg(F.min(F.when(F.col("num") / F.col("den") > 0,
                             F.col("num") / F.col("den"))).alias("mp"))
    out = (df.crossJoin(F.broadcast(mp))
             .select("num", "den",
                     fix_packing_division(F.col("num"), F.col("den"),
                                          F.col("mp")).alias("v"))
             .collect())
    got = {(r["num"], r["den"]): r["v"] for r in out}
    # min positive quotient is 1/4 = 0.25 -> zeros become 0.125
    assert got[(0.0, 2.0)] == 0.125
    assert got[(0.0, 8.0)] == 0.125
    assert got[(4.0, 2.0)] == 2.0
    assert got[(1.0, 4.0)] == 0.25
    assert got[(10.0, 5.0)] == 2.0


def test_fix_packing_division_den_zero_contract(spark):
    """den==0 is OUTSIDE the documented domain (physics.py docstring):
    the reference's numpy yields ±inf there and keeps the row; Spark
    under ANSI mode (the Spark 4 default this engine runs with) RAISES
    [DIVIDE_BY_ZERO].  Pin both halves of the contract so the
    divergence stays visible and callers keep guarding (q_safe_division
    guards via a strictly positive denominator column)."""
    import pytest
    from pyspark.errors import ArithmeticException

    bad = spark.createDataFrame([(1.0, 0.0)], ["num", "den"])
    with pytest.raises(ArithmeticException, match="DIVIDE_BY_ZERO"):
        bad.select(fix_packing_division(F.col("num"), F.col("den"),
                                        F.lit(0.25)).alias("v")).collect()

    ok = spark.createDataFrame([(3.0, 2.0), (0.0, 8.0)], ["num", "den"])
    got = {(r["num"], r["den"]): r["v"] for r in ok.select(
        "num", "den", fix_packing_division(F.col("num"), F.col("den"),
                                           F.lit(0.25)).alias("v")).collect()}
    assert got[(3.0, 2.0)] == 1.5        # in-domain rows untouched
    assert got[(0.0, 8.0)] == 0.125      # zero RESULT replaced (0.5 * minpos)


def test_sw_press_matches_reference_formula(spark):
    """sw_press (app_functions.py:716-733) vs direct numpy evaluation."""
    pts = [(float(d), float(la)) for d in (0, 100, 1000, 5000) for la in (-60, 0, 30, 89)]
    df = spark.createDataFrame(pts, ["depth", "lat"]).select(
        "depth", "lat", sw_press(F.col("depth"), F.col("lat")).alias("p"))
    for r in df.collect():
        x = np.sin(abs(r["lat"]) * np.pi / 180.0)
        c1 = 5.92e-3 + x ** 2 * 5.25e-3
        want = ((1 - c1) - np.sqrt((1 - c1) ** 2 - 8.84e-6 * r["depth"])) / 4.42e-6
        assert abs(r["p"] - want) <= 1e-9 * max(1.0, abs(want))
