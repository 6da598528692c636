"""Golden tests for the numpy Butterworth implementation (scipy parity is
the contract: reference Filtering.py:87-97 used scipy.signal). scipy is not
installed here, so golden values below were computed against known
closed-form/behavioral properties of the filter."""

from __future__ import annotations

import numpy as np
import pytest

from nexus_spark.functions.filtering import (butter_lowpass, filtfilt,
                                             lfilter, low_pass_filter)


def test_butter_coeffs_order1():
    # Analytic order-1 butterworth at wn=0.5: b = [1/2, 1/2] (tan(pi/4)=1),
    # a = [1, 0] — classic half-band averager.
    b, a = butter_lowpass(1, 0.5)
    assert np.allclose(b, [0.5, 0.5], atol=1e-12)
    assert np.allclose(a, [1.0, 0.0], atol=1e-12)


def test_butter_dc_gain_is_unity():
    for order in (1, 2, 4, 9):
        for wn in (0.1, 0.3, 0.7):
            b, a = butter_lowpass(order, wn)
            assert np.isclose(b.sum() / a.sum(), 1.0, atol=1e-9), (order, wn)


def test_butter_cutoff_gain_is_half_power():
    # |H(e^{j*pi*wn})| = 1/sqrt(2) at the cutoff by construction.
    for order in (2, 5, 9):
        wn = 0.4
        b, a = butter_lowpass(order, wn)
        w = np.pi * wn
        z = np.exp(-1j * w)
        h = np.polyval(b[::-1], z) / np.polyval(a[::-1], z)
        assert np.isclose(abs(h), 1 / np.sqrt(2), atol=1e-9), order


def test_lfilter_matches_direct_convolution_fir():
    rng = np.random.RandomState(42)
    x = rng.randn(100)
    b = np.array([0.25, 0.5, 0.25])
    y, _ = lfilter(b, np.array([1.0]), x)
    expected = np.convolve(x, b)[: len(x)]
    assert np.allclose(y, expected, atol=1e-12)


def test_filtfilt_zero_phase_preserves_constant():
    b, a = butter_lowpass(4, 0.3)
    x = np.full(200, 3.7)
    y = filtfilt(b, a, x, padlen=30)
    assert np.allclose(y, 3.7, atol=1e-8)


def test_low_pass_removes_high_freq_keeps_low():
    n = 512
    t = np.arange(n)
    slow = np.sin(2 * np.pi * t / 256)       # ~2 cycles
    fast = 0.5 * np.sin(2 * np.pi * t / 4)   # n/4 cycles — way above cutoff
    out = low_pass_filter(slow + fast, cutoff=12.0, order=9)
    # High-frequency energy should be crushed, slow signal preserved.
    resid_fast = out - slow
    assert np.abs(resid_fast[40:-40]).max() < 0.05
    assert np.corrcoef(out[40:-40], slow[40:-40])[0, 1] > 0.999


def test_filtfilt_padlen_validation():
    b, a = butter_lowpass(2, 0.5)
    with pytest.raises(ValueError):
        filtfilt(b, a, np.ones(5), padlen=10)


# --------------------------------------------------------------------------
# regression-inference closed form (functions/stats.py)
# --------------------------------------------------------------------------

def _bi_raw(a, b, x, eps=1e-15, maxiter=500):
    import math

    lbeta = math.lgamma(a) + math.lgamma(b) - math.lgamma(a + b)
    front = math.exp(a * math.log(x) + b * math.log(1.0 - x) - lbeta) / a
    f, c, d = 1.0, 1.0, 0.0
    for i in range(maxiter):
        m = i // 2
        if i == 0:
            num = 1.0
        elif i % 2 == 0:
            num = m * (b - m) * x / ((a + 2 * m - 1) * (a + 2 * m))
        else:
            num = -(a + m) * (a + b + m) * x / ((a + 2 * m) * (a + 2 * m + 1))
        d = 1.0 + num * d
        d = 1.0 / (d if abs(d) > 1e-300 else 1e-300)
        c = 1.0 + num / (c if abs(c) > 1e-300 else 1e-300)
        f *= c * d
        if abs(1.0 - c * d) < eps:
            break
    return front * (f - 1.0)


def _betainc(a, b, x):
    """Regularized incomplete beta I_x(a, b): Lentz continued fraction,
    with the symmetry identity outside its fast-convergence region —
    the exact reference for the Student-t p-value."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    if x < (a + 1.0) / (a + b + 2.0):
        return _bi_raw(a, b, x)
    return 1.0 - _bi_raw(b, a, 1.0 - x)


def _t_sf_two_sided(t, df):
    return _betainc(df / 2.0, 0.5, df / (df + t * t))


def test_pvalue_sql_matches_exact_t_cdf(spark):
    """The shared SQL approximation (A&S t->z + normal tail) must track the
    exact t CDF within measured tiers: 5e-3 at df=8, 1e-3 at df=20,
    1e-4 at df=60, 1e-5 at df>=200 (real pixels have df in the
    thousands, where the error is ~1e-7)."""
    from nexus_spark.functions.stats import pvalue_from_z_sql, zstat_sql

    cases = [(t, df) for t in (0.0, 0.5, 1.0, 1.96, 2.5, 3.2, 4.0)
             for df in (8, 20, 60, 200, 1000)]
    df_in = spark.createDataFrame(
        [(float(t), int(df) + 2) for t, df in cases], "t double, n int")
    z = zstat_sql("t", "n")
    got = (df_in.selectExpr("t", "n", f"{z} AS _z")
           .selectExpr("t", "n",
                       pvalue_from_z_sql("_z", "1.0") + " AS p")
           .collect())
    tol = {8: 5e-3, 20: 1e-3, 60: 1e-4, 200: 1e-5, 1000: 1e-6}
    for row in got:
        df = row["n"] - 2
        exact = _t_sf_two_sided(row["t"], df)
        assert abs(row["p"] - exact) < tol[df], (row["t"], df, row["p"], exact)


def test_stderr_sql_matches_closed_form(spark):
    """stderr from (slope, Sxx, Syy, Sxy, n) equals the direct residual
    formula on a small regression computed in numpy."""
    import numpy as np

    from nexus_spark.functions.stats import stderr_sql

    rng = np.random.RandomState(7)
    x = np.arange(40, dtype=float)
    y = 0.3 * x + 2.0 + rng.randn(40)
    n = len(x)
    sxx = float(((x - x.mean()) ** 2).sum())
    syy = float(((y - y.mean()) ** 2).sum())
    sxy = float(((x - x.mean()) * (y - y.mean())).sum())
    slope = sxy / sxx
    resid = y - (slope * x + (y.mean() - slope * x.mean()))
    want = float(np.sqrt((resid ** 2).sum() / (n - 2) / sxx))
    df_in = spark.createDataFrame(
        [(slope, sxx, syy, sxy, n)],
        "slope double, sxx double, syy double, sxy double, n int")
    got = df_in.selectExpr(
        stderr_sql("slope", "sxx", "syy", "sxy", "n") + " AS se").first()["se"]
    assert abs(got - want) < 1e-9 * max(1.0, want)
