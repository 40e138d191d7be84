"""Native C++ helpers vs NumPy fallbacks."""

import numpy as np
import pytest

from fftvis_tpu import native
from fftvis_tpu.nufft.kernels import ESKernel


def test_native_builds():
    # This environment has g++; the library should build.
    assert native.have_native()


@pytest.mark.parametrize("force_fallback", [False, True])
def test_bin_points(force_fallback, monkeypatch):
    if force_fallback:
        monkeypatch.setattr(native, "_load", lambda: None)
    rng = np.random.default_rng(0)
    nf = (64, 96)
    tile = (16, 32)
    n = 500
    uy = rng.uniform(0, nf[0], n)
    ux = rng.uniform(0, nf[1], n)
    perm, offsets = native.bin_points_2d(uy, ux, nf, tile)

    assert sorted(perm.tolist()) == list(range(n))
    nty, ntx = 4, 3
    assert offsets.shape == (nty * ntx + 1,)
    assert offsets[0] == 0 and offsets[-1] == n
    # Every point in its tile's segment.
    for t in range(nty * ntx):
        seg = perm[offsets[t] : offsets[t + 1]]
        ty, tx = t // ntx, t % ntx
        assert np.all((uy[seg] // tile[0]).astype(int) == ty)
        assert np.all((ux[seg] // tile[1]).astype(int) == tx)


def test_bin_matches_fallback():
    rng = np.random.default_rng(1)
    nf, tile, n = (40, 40), (8, 8), 200
    uy, ux = rng.uniform(0, 40, n), rng.uniform(0, 40, n)
    p1, o1 = native.bin_points_2d(uy, ux, nf, tile)
    # NumPy fallback (stable) must agree exactly with the C++ counting sort.
    import unittest.mock as mock

    with mock.patch.object(native, "_load", return_value=None):
        p2, o2 = native.bin_points_2d(uy, ux, nf, tile)
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(o1, o2)


def test_es_taps_match():
    rng = np.random.default_rng(2)
    k = ESKernel.from_eps(1e-9, 2.0)
    v = rng.uniform(-5, 50, 64)
    k0a, va = native.es_taps(v, k.w, k.beta)
    import unittest.mock as mock

    with mock.patch.object(native, "_load", return_value=None):
        k0b, vb = native.es_taps(v, k.w, k.beta)
    np.testing.assert_array_equal(k0a, k0b)
    np.testing.assert_allclose(va, vb, rtol=1e-13)


def test_direct_dft_accum():
    rng = np.random.default_rng(3)
    d, n, m = 2, 40, 9
    x = rng.normal(size=(d, n))
    w = rng.normal(size=n) + 1j * rng.normal(size=n)
    b = rng.normal(size=(d, m))
    got = native.direct_dft_accum(x, w, b)
    want = w @ np.exp(1j * (x.T @ b))
    np.testing.assert_allclose(got, want, rtol=1e-12)
