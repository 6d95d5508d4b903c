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
    """In-situ density from potential temperature/salinity/pressure —
    the EOS-80-style polynomial of app_functions.py:683-714, re-expressed
    with Horner-style Column arithmetic (same coefficients, same term
    grouping as the reference so values agree bitwise-close)."""
    t, s, p = theta, salt, press * 0.1  # pressure dbar→bar as in reference
    zs = F.sqrt(s)
    num = (
        9.99843699e2
        + t * (7.35212840e0 + t * (-5.45928211e-2 + t * 3.98476704e-4))
        + s * (2.96938239e0 + s * 2.12382341e-3 + t * -7.23268813e-3)
        + p * (1.04004591e-2 + t * t * 1.03970529e-7
               + s * 5.18761880e-6
               + p * (-3.24041825e-8 + t * t * -1.23869360e-11))
    )
    den = (
        1.0
        + t * (7.28606739e-3 + t * (-4.60835542e-5 + t * (3.68390573e-7 + t * 1.80809186e-10)))
        + s * (2.14691708e-3 + t * (-9.27062484e-6 + t * -1.78343643e-10)
               + zs * (4.76534122e-6 + t * t * 1.63410736e-9))
        + p * (5.30848875e-6 + t * t * p * -3.03175128e-16 + t * t * t * p * p * -1.27934137e-17)
    )
    return num / den


def sw_press(depth: Column, lat: Column) -> Column:
    """Seawater pressure from depth+latitude (app_functions.py:716-733):
    p = (1-c1)·d + c2·d² with latitude-dependent c1."""
    x = F.sin(F.abs(lat) * 3.141592653589793 / 180.0)
    c1 = 5.92e-3 + (x * x) * 5.25e-3
    return ((1 - c1) - F.sqrt((1 - c1) * (1 - c1) - 8.84e-6 * depth)) / 4.42e-6


def fix_packing_division(num: Column, den: Column, min_positive: Column) -> Column:
    """Packing-safe division (app_functions.py:735-738): zero denominators
    replaced by half the smallest positive value (an aggregate the caller
    computes once and broadcasts as a scalar column)."""
    safe_den = F.when(den == 0, min_positive * 0.5).otherwise(den)
    return num / safe_den


def wind_speed(u: Column, v: Column) -> Column:
    """((u² + v²))^0.5 — the mapping corpus's wind-speed calc (§2.8)."""
    return F.sqrt(u * u + v * v)


def sisnconc_from_thickness(sisnthick: Column) -> Column:
    """1 − exp(−0.2·330·thickness) (sisnconc, calculations.py:740-753)."""
    return 1 - F.exp(-0.2 * SNOW_DENSITY * sisnthick)
