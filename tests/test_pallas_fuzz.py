"""Randomized equivalence fuzz for the Pallas kernels (interpret mode).

Random geometries, tile shapes, channel counts, clustering patterns, and
chunk sizes, checked against the XLA reference lowerings. Bounded for CI;
crank FFTVIS_FUZZ_ITERS for a soak run.

Mirrors the reference's randomized cross-validation habit (ref
tests/test_cpu_simulate.py's parameter matrices) applied to the kernel
layer, where the failure modes are silent (a dropped chunk or mis-masked
lane changes values without crashing).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # randomized soak: dedicated CI job

import jax.numpy as jnp

from fftvis_tpu.nufft.kernels import ESKernel
from fftvis_tpu.nufft.pallas_interp import PallasInterp, pallas_interp_ok
from fftvis_tpu.nufft.pallas_spread import (
    pallas_spread_ok,
    spread_pallas_tiled,
)
from fftvis_tpu.nufft.transform import _TiledInterp, _spread_scatter, plan_type3

ITERS = int(os.environ.get("FFTVIS_FUZZ_ITERS", "12"))


@pytest.mark.parametrize("it", range(ITERS))
def test_fuzz_spread(it):
    rng = np.random.default_rng(1000 + it)
    nf = (
        8 * int(rng.integers(4, 20)),
        8 * int(rng.integers(4, 20)),
    )
    ty = 8 * int(rng.integers(1, 5))
    sx = 8 * int(rng.integers(1, 5))
    C = int(rng.integers(1, 4))
    n = int(rng.integers(3, 1500))
    eps = float(rng.choice([1e-4, 1e-6, 5e-7]))
    kern = ESKernel.from_eps(eps, sigma=2.0)
    if not pallas_spread_ok(nf, kern.w, ty, sx, 2 * C, n, np.float32):
        pytest.skip("gate rejects this geometry")
    style = rng.integers(0, 3)
    if style == 0:  # uniform
        uy = rng.uniform(0, nf[0], n)
        ux = rng.uniform(0, nf[1], n)
    elif style == 1:  # rim-clustered (horizon pile-up analogue)
        th = rng.uniform(0, 2 * np.pi, n)
        uy = (nf[0] / 2 + (nf[0] / 2 - 1e-3) * np.sin(th)) % nf[0]
        ux = (nf[1] / 2 + (nf[1] / 2 - 1e-3) * np.cos(th)) % nf[1]
    else:  # one hot corner tile
        uy = np.abs(rng.normal(0, 1.5, n)) % nf[0]
        ux = np.abs(rng.normal(0, 1.5, n)) % nf[1]
    w = rng.normal(size=(C, n)) + 1j * rng.normal(size=(C, n))
    u = [jnp.asarray(uy, jnp.float32), jnp.asarray(ux, jnp.float32)]
    wts = jnp.asarray(w, jnp.complex64)
    got = np.asarray(
        spread_pallas_tiled(u, wts, nf, kern.w, kern.beta, ty, sx)
    )
    want = np.asarray(_spread_scatter(u, wts, nf, kern.w, kern.beta))
    scale = max(np.abs(want).max(), 1e-12)
    np.testing.assert_allclose(got, want, atol=5e-5 * scale, rtol=0)


@pytest.mark.parametrize("it", range(ITERS))
def test_fuzz_interp(it):
    rng = np.random.default_rng(2000 + it)
    m = int(rng.integers(5, 1200))
    S = float(rng.uniform(10, 60))
    C = int(rng.integers(1, 4))
    s = np.concatenate(
        [rng.normal(0, S / 8, (2, m // 2)), rng.uniform(-S, S, (2, m - m // 2))],
        axis=1,
    )
    plan = plan_type3(s, x_extent=2 * np.pi, eps=1e-6, upsample_factor=2.0)
    if not pallas_interp_ok(plan.nf, plan.kernel.w, 2 * C, m, np.float32):
        pytest.skip("gate rejects this geometry")
    G = jnp.asarray(
        rng.normal(size=(C,) + tuple(plan.nf))
        + 1j * rng.normal(size=(C,) + tuple(plan.nf)),
        jnp.complex64,
    )
    got = np.asarray(PallasInterp(plan)(G))
    want = np.asarray(_TiledInterp(plan)(G))
    scale = max(np.abs(want).max(), 1e-12)
    np.testing.assert_allclose(got, want, atol=1e-5 * scale, rtol=0)


@pytest.mark.parametrize("it", range(ITERS))
def test_fuzz_beam_eval(it):
    from fftvis_tpu.beams.interp import (
        map_coordinates_2d_cl,
        spline_prefilter_2d,
    )
    from fftvis_tpu.beams.pallas_eval import (
        pallas_beam_eval_ok,
        pallas_map_coordinates_cl,
    )

    rng = np.random.default_rng(3000 + it)
    ny = int(rng.integers(5, 120))
    nx = int(rng.integers(4, 250))
    ch = int(rng.integers(1, 12))
    order = int(rng.choice([1, 3]))
    wrap = bool(rng.integers(0, 2))
    if not pallas_beam_eval_ok(ny, nx, ch, order, np.float32, 900):
        pytest.skip("gate rejects this geometry")
    data = rng.normal(size=(ny, nx, ch)).astype(np.float32)
    if order == 3:
        data = np.asarray(
            spline_prefilter_2d(jnp.asarray(data), axes=(0, 1)),
            dtype=np.float32,
        )
    n = int(rng.integers(3, 900))
    y = jnp.asarray(rng.uniform(-0.9, ny - 0.1, n), jnp.float32)
    x = jnp.asarray(rng.uniform(-1.5, nx + 1.5, n), jnp.float32)
    d = jnp.asarray(data)
    got = np.asarray(
        pallas_map_coordinates_cl(d, y, x, order=order, wrap_x=wrap)
    )
    want = np.asarray(
        map_coordinates_2d_cl(d, y, x, order=order, wrap_x=wrap)
    )
    scale = max(np.abs(want).max(), 1e-12)
    np.testing.assert_allclose(got, want, atol=2e-5 * scale, rtol=0)
