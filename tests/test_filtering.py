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
