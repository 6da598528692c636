"""Series filters: seasonal-cycle removal + Butterworth low-pass.

Reference semantics (reference: analysis/webservice/Filtering.py):
- ``applySeasonalCycleFilter`` subtracts the mean of every 12th sample
  (month-of-series climatology) when the series has > 12 points (:40-51);
- ``applyLowPassFilter`` is a zero-phase Butterworth (order 9, cutoff 12/nyq)
  via filtfilt with padlen = min(30, 3*(order+1), n-1) rules (:87-97).

Seasonal filters are window functions (distributed, scale-free). The low-pass
is inherently sequential over one already-aggregated time series (N = days in
range, thousands at most) → computed with numpy on the collected series, the
one legitimate driver-side step. scipy is not available in this environment,
so butter/filtfilt are implemented here from the standard published DSP
formulas (bilinear transform of the analog Butterworth prototype; odd-padded
forward-backward IIR filtering).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------- seasonal

def seasonal_cycle_filter(df: DataFrame, value_col: str, time_col: str,
                          partition_cols: list[str] | None = None,
                          out_col: str = "deseasoned") -> DataFrame:
    """value − mean(value of same calendar month) per partition.

    Window-function form of Filtering.applySeasonalCycleFilter — no collect,
    scales to any number of series.
    """
    parts = [F.month(F.col(time_col))] + [F.col(c) for c in (partition_cols or [])]
    w = Window.partitionBy(*parts)
    return df.withColumn(out_col, F.col(value_col) - F.avg(value_col).over(w))


def deseason_by_sequence(df: DataFrame, value_col: str, seq_col: str,
                         partition_cols: list[str] | None = None,
                         period: int = 12, out_col: str = "deseasoned") -> DataFrame:
    """Hovmöller-style deseason: subtract mean over (seq % period)
    (reference: HofMoellerSpark.py:110-130)."""
    parts = [F.pmod(F.col(seq_col), F.lit(period))] + [
        F.col(c) for c in (partition_cols or [])
    ]
    w = Window.partitionBy(*parts)
    return df.withColumn(out_col, F.col(value_col) - F.avg(value_col).over(w))


# ---------------------------------------------------------- butterworth/np

def butter_lowpass(order: int, wn: float) -> tuple[np.ndarray, np.ndarray]:
    """Digital Butterworth low-pass (b, a) — scipy.signal.butter parity.

    Standard design: analog prototype poles on the unit circle, frequency
    pre-warp, bilinear transform. wn is the cutoff as a fraction of Nyquist
    (scipy convention).
    """
    if not 0 < wn < 1:
        raise ValueError("wn must be in (0, 1)")
    # Analog prototype poles: exp(i*pi*(2k+n-1)/(2n)), k=1..n (LHP).
    k = np.arange(1, order + 1)
    theta = np.pi * (2 * k + order - 1) / (2 * order)
    poles_a = np.exp(1j * theta)
    # Pre-warped cutoff for fs=2 (scipy convention): warped = 2*fs*tan(pi*wn/fs/2)
    fs = 2.0
    warped = 2 * fs * np.tan(np.pi * wn / fs)
    poles_a = poles_a * warped
    gain_a = warped ** order
    # Bilinear transform z = (2fs + s)/(2fs - s).
    poles_z = (2 * fs + poles_a) / (2 * fs - poles_a)
    gain_z = np.real(gain_a / np.prod(2 * fs - poles_a))
    zeros_z = -np.ones(order)  # analog zeros at infinity → z = -1
    b = gain_z * np.real(np.poly(zeros_z))
    a = np.real(np.poly(poles_z))
    return b, a


def lfilter(b: np.ndarray, a: np.ndarray, x: np.ndarray,
            zi: np.ndarray | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Direct-form-II-transposed IIR filter (scipy.signal.lfilter parity)."""
    b = np.asarray(b, dtype=float) / a[0]
    a = np.asarray(a, dtype=float) / a[0]
    n = max(len(a), len(b))
    b = np.pad(b, (0, n - len(b)))
    a = np.pad(a, (0, n - len(a)))
    z = np.zeros(n - 1) if zi is None else zi.astype(float).copy()
    y = np.empty_like(x, dtype=float)
    for i, xi in enumerate(x):
        yi = b[0] * xi + (z[0] if n > 1 else 0.0)
        for j in range(n - 2):
            z[j] = b[j + 1] * xi + z[j + 1] - a[j + 1] * yi
        if n > 1:
            z[n - 2] = b[n - 1] * xi - a[n - 1] * yi
        y[i] = yi
    return y, z


def _lfilter_zi(b: np.ndarray, a: np.ndarray) -> np.ndarray:
    """Steady-state initial conditions for unit step (scipy lfilter_zi)."""
    b = np.asarray(b, dtype=float) / a[0]
    a = np.asarray(a, dtype=float) / a[0]
    n = max(len(a), len(b))
    b = np.pad(b, (0, n - len(b)))
    a = np.pad(a, (0, n - len(a)))
    # Solve (I - A^T) zi = B where A is the companion matrix of `a`
    # (A^T has -a[1:] down its first column and identity on the
    # superdiagonal — the DF2T state-update matrix).
    at = np.zeros((n - 1, n - 1))
    at[:, 0] = -a[1:]
    at[:-1, 1:] = np.eye(n - 2)
    bsum = b[1:] - a[1:] * b[0]
    return np.linalg.solve(np.eye(n - 1) - at, bsum)


def filtfilt(b: np.ndarray, a: np.ndarray, x: np.ndarray,
             padlen: int | None = None) -> np.ndarray:
    """Zero-phase forward-backward filter with odd extension (scipy parity)."""
    x = np.asarray(x, dtype=float)
    ntaps = max(len(a), len(b))
    if padlen is None:
        padlen = 3 * ntaps
    if padlen >= len(x):
        raise ValueError("padlen must be less than len(x)")
    if padlen > 0:
        ext = np.concatenate([
            2 * x[0] - x[padlen:0:-1], x, 2 * x[-1] - x[-2:-padlen - 2:-1]
        ])
    else:
        ext = x
    zi = _lfilter_zi(b, a)
    y, _ = lfilter(b, a, ext, zi * ext[0])
    y, _ = lfilter(b, a, y[::-1], zi * y[-1])
    y = y[::-1]
    if padlen > 0:
        y = y[padlen:-padlen]
    return y


def low_pass_filter(values: np.ndarray, cutoff: float = 12.0,
                    order: int = 9) -> np.ndarray:
    """Reference low-pass: butter(9, 12/nyq) + filtfilt, padlen rule
    min(30, 3*(order+1), n-1) (reference: Filtering.py:87-97)."""
    n = len(values)
    nyq = 0.5 * n
    wn = min(cutoff / nyq, 0.99)
    b, a = butter_lowpass(order, wn)
    padlen = min(30, 3 * (order + 1), n - 1)
    return filtfilt(b, a, np.asarray(values, dtype=float), padlen=padlen)
