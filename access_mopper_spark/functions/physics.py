"""Physics formulae from the reference as pure Column math — no UDFs.

These are the reference's scalar numeric kernels: the 25-term EOS
polynomial ``rho_from_theta`` (original/subroutines/app_functions.py:
683-714), seawater pressure ``sw_press`` (:716-733), the packing-safe
division (:735-738), and the constants block (calculations.py:45-52).
Pure Column expressions stay inside whole-stage codegen — at 100 TB these
evaluate at memory bandwidth, which is exactly why they must NOT become
Python UDFs."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# constants (calculations.py:45-52)
ICE_DENSITY = 900.0        # rho_i
SNOW_DENSITY = 330.0       # rho_s
WATER_DENSITY = 1000.0     # rho_w
SEAWATER_DENSITY = 1026.0  # rho_sw


def rho_from_theta(theta: Column, salt: Column, press: Column) -> Column:
    """In-situ density from potential temperature / salinity / pressure —
    the Jackett & McDougall (2006) 25-term rational polynomial exactly as
    the reference evaluates it (app_functions.py:683-714), same
    coefficients and same term grouping.  The reference's ``pmask``
    (zeroing the pressure terms when p == 0) is a no-op here because every
    pressure term is a multiple of p, so p == 0 already contributes 0.

    Check value (Jackett et al. 2006, and the reference's own kernel):
    rho(theta=25 degC, s=35 psu, p=2000 db) = 1031.65056056576 kg/m3,
    asserted by tests/test_physics.py."""
    t, s, p = theta, salt, press
    t2 = t * t
    zs = F.sqrt(s)
    num = (
        9.9984085444849347e02
        + t * (7.3471625860981584e00
               + t * (-5.3211231792841769e-02 + t * 3.6492439109814549e-04))
        + s * (2.5880571023991390e00
               - t * 6.7168282786692355e-03
               + s * 1.9203202055760151e-03)
        + p * (1.1798263740430364e-02
               + t2 * 9.8920219266399117e-08
               + s * 4.6996642771754730e-06
               - p * (2.5862187075154352e-08 + t2 * 3.2921414007960662e-12))
    )
    den = (
        1.0
        + t * (7.2815210113327091e-03
               + t * (-4.4787265461983921e-05
                      + t * (3.3851002965802430e-07 + t * 1.3651202389758572e-10)))
        + s * (1.7632126669040377e-03
               - t * (8.8066583251206474e-06 + t2 * 1.8832689434804897e-10)
               + zs * (5.7463776745432097e-06 + t2 * 1.4716275472242334e-09))
        + p * (6.7103246285651894e-06
               - (p * t) * (t2 * 2.4461698007024582e-17 + p * 9.1534417604289062e-18))
    )
    return num / den


def sw_press(depth: Column, lat: Column) -> Column:
    """Seawater pressure from depth+latitude (app_functions.py:716-733):
    p = (1-c1)·d + c2·d² with latitude-dependent c1."""
    x = F.sin(F.abs(lat) * 3.141592653589793 / 180.0)
    c1 = 5.92e-3 + (x * x) * 5.25e-3
    return ((1 - c1) - F.sqrt((1 - c1) * (1 - c1) - 8.84e-6 * depth)) / 4.42e-6


def fix_packing_division(num: Column, den: Column, min_positive_quotient: Column) -> Column:
    """Packing-safe division (app_functions.py:735-738).  The reference
    divides first and then replaces zero RESULTS (``vout == 0``) with half
    the smallest positive result: ``vout[vout==0] = 0.5*min(vout[vout>0])``.
    ``min_positive_quotient`` is that global aggregate — the caller
    computes it once (1-row agg) and broadcasts it back as a scalar.

    Contract: callers must guarantee ``den != 0``.  The reference's numpy
    ``num/den`` yields ±inf at den==0 (nonzero, so kept as-is); Spark
    diverges either way — ANSI mode (the Spark 4 default, and what this
    engine runs) RAISES SparkArithmeticException [DIVIDE_BY_ZERO], while
    non-ANSI yields NULL.  A zero denominator is therefore outside this
    function's domain: filter or mask first (the sole in-repo caller,
    q_safe_division, divides by a strictly positive price column).
    Pinned by tests/test_physics.py::test_fix_packing_division_den_zero_contract."""
    vout = num / den
    return F.when(vout == 0, min_positive_quotient * 0.5).otherwise(vout)


def wind_speed(u: Column, v: Column) -> Column:
    """((u² + v²))^0.5 — the mapping corpus's wind-speed calc (§2.8)."""
    return F.sqrt(u * u + v * v)


def sisnconc_from_thickness(sisnthick: Column) -> Column:
    """1 − exp(−0.2·330·thickness) (sisnconc, calculations.py:740-753)."""
    return 1 - F.exp(-0.2 * SNOW_DENSITY * sisnthick)
