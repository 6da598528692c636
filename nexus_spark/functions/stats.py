"""Closed-form linear-regression inference: slope standard error and
two-sided p-value from sufficient statistics.

The reference returns scipy.linregress's p-value and stderr per pixel
(reference: analysis/webservice/algorithms/LongitudeLatitudeMap.py:192-244,
TimeSeries.py:364-382). Neither Spark SQL nor DuckDB has a Student-t CDF
builtin, so the p-value uses an explicit algebraic approximation — the
A&S 26.7.8 t->z transform followed by the A&S 26.2.17 normal-tail
polynomial (|error| < 7.5e-8) — written ONCE as SQL text and evaluated
verbatim by BOTH engines, so the cross-engine hash gate tests the same
arithmetic. Only +,*,/,sqrt,exp are used (no pow: engines disagree at ulp
level), constants are spelled as full-precision literals.

Accuracy contract: exact for stderr; p-value tracks the true t CDF at
~3e-3 (df=8), 5e-4 (df=20), 5e-5 (df=60), <5e-6 (df>=200) absolute —
golden-tested against an exact incomplete-beta reference in
tests/test_filtering.py. Real pixels have df in the thousands (daily obs
over years), where the error is ~1e-7; the approximation, not engine
drift, is the error source.
"""

from __future__ import annotations

_SQRT_2PI = "2.5066282746310002"
_AS_Y = "(1.0 / (1.0 + 0.2316419 * {z}))"
# Horner form of the A&S 26.2.17 five-term polynomial.
_AS_POLY = ("({y} * (0.31938153 + {y} * (-0.356563782 + {y} * "
            "(1.781477937 + {y} * (-1.821255978 + {y} * 1.330274429)))))")


def stderr_sql(slope: str, sxx: str, syy: str, sxy: str, n: str) -> str:
    """Slope standard error: sqrt((Syy - b*Sxy) / (n-2) / Sxx).
    NULL when n <= 2 or the regressor is constant."""
    return (f"CASE WHEN {n} > 2 AND {sxx} > 0 THEN "
            f"SQRT(GREATEST({syy} - {slope} * {sxy}, 0.0) "
            f"/ ({n} - 2) / {sxx}) END")


def tstat_sql(slope: str, stderr: str) -> str:
    """|t| statistic; NULL when stderr is NULL or zero (perfect fit is
    handled by pvalue_sql)."""
    return f"CASE WHEN {stderr} > 0 THEN ABS({slope}) / {stderr} END"


def zstat_sql(t: str, n: str) -> str:
    """A&S 26.7.8 map of a t deviate with df = n-2 onto a normal deviate:
    z = t * (1 - 1/(4 df)) / sqrt(1 + t^2 / (2 df))."""
    df = f"({n} - 2)"
    return (f"({t} * (1.0 - 1.0 / (4.0 * {df})) "
            f"/ SQRT(1.0 + {t} * {t} / (2.0 * {df})))")


def pvalue_from_z_sql(z: str, stderr: str) -> str:
    """Two-sided p = 2 * Q(z) via A&S 26.2.17; 0 for a perfect fit
    (stderr = 0), NULL when inference is undefined."""
    y = _AS_Y.format(z=z)
    poly = _AS_POLY.format(y=y)
    q = f"(EXP(-{z} * {z} / 2.0) / {_SQRT_2PI} * {poly})"
    return (f"CASE WHEN {stderr} = 0 THEN 0.0 "
            f"WHEN {z} IS NULL THEN NULL "
            f"ELSE LEAST(1.0, 2.0 * {q}) END")
