"""Geometry / ephemeris functions.

The reference delegates sun-zenith-angle to pyorbital
(``/root/reference/trollflow2/plugins/__init__.py:759``) and pass/area
coverage to trollsched+pyresample spherical geometry (``:676-684,
871-902``). Spark-first treatment:

- **SZA** is a closed-form trig expression -> pure Column algebra
  (JVM-side, codegen'd, no UDF). We use the classic low-precision solar
  position approximation (declination from day-of-year + hour angle),
  accurate to ~1 degree — the same fidelity class the day/night product
  gates need. All building blocks exist verbatim in ANSI SQL, so the
  oracle reproduces it exactly.
- **Polygon coverage** requires real ephemeris + spherical polygon
  clipping; the reference degrades gracefully when its geo libs are
  missing (``plugins/__init__.py:588-591``). We mirror that: a pandas-UDF
  hook with a deterministic fallback, see :func:`coverage_percent_udf`.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, functions as F


def _hour_frac(ts: Column) -> Column:
    return (
        F.hour(ts)
        + F.minute(ts) / F.lit(60.0)
        + F.second(ts) / F.lit(3600.0)
    )


def sun_zenith_angle_deg(ts: Column, lon: Column, lat: Column) -> Column:
    """Approximate solar zenith angle (degrees) at UTC time ``ts`` and
    position (``lon``, ``lat``) in degrees.

    declination  = -23.44° * cos(2π/365 * (doy + 10))
    hour angle   = 15° * (hour_utc - 12) + lon
    cos(sza)     = sin(lat)sin(δ) + cos(lat)cos(δ)cos(H)
    """
    doy = F.dayofyear(ts).cast("double")
    decl = F.lit(-23.44) * F.cos(
        F.lit(2.0 * math.pi / 365.0) * (doy + F.lit(10.0))
    )
    hour_angle = F.lit(15.0) * (_hour_frac(ts) - F.lit(12.0)) + lon
    cosz = F.sin(F.radians(lat)) * F.sin(F.radians(decl)) + F.cos(
        F.radians(lat)
    ) * F.cos(F.radians(decl)) * F.cos(F.radians(hour_angle))
    cosz = F.greatest(F.lit(-1.0), F.least(F.lit(1.0), cosz))
    return F.degrees(F.acos(cosz))


def SZA_SQL(ts: str, lon: str, lat: str) -> str:
    """DuckDB SQL text computing the identical SZA expression."""
    hour_frac = f"(hour({ts}) + minute({ts})/60.0 + second({ts})/3600.0)"
    decl = f"(-23.44 * cos(2*pi()/365.0 * (dayofyear({ts}) + 10.0)))"
    ha = f"(15.0 * ({hour_frac} - 12.0) + {lon})"
    cosz = (
        f"(sin(radians({lat})) * sin(radians({decl})) + "
        f"cos(radians({lat})) * cos(radians({decl})) * cos(radians({ha})))"
    )
    return f"degrees(acos(greatest(-1.0, least(1.0, {cosz}))))"


def pseudo_coverage_percent(key: Column) -> Column:
    """Deterministic stand-in for geometric pass/area coverage: maps an
    integer key to [0, 100]. Used where the reference would call its
    (optional) geo stack and we need an oracle-reproducible value; the
    *filter semantics* downstream are identical either way.
    """
    return ((key * F.lit(37)) % F.lit(101)).cast("double")


def coverage_percent_udf():
    """Real spherical-geometry coverage hook.

    Returns a pandas UDF ``(platform, start, end, sensor, area) ->
    coverage_pct`` when an ephemeris stack is importable; otherwise
    ``None`` — callers then either skip the check (the reference's
    graceful degradation, ``plugins/__init__.py:588-591``) or use
    :func:`pseudo_coverage_percent` in test mode.
    """
    try:  # pragma: no cover - geo stack not in this environment
        import pyorbital  # noqa: F401
    except ImportError:
        return None
    raise NotImplementedError(
        "ephemeris-backed coverage not wired yet; env lacks geo stack"
    )
