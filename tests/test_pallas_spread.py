"""Pallas spreading kernel vs the XLA scatter reference (interpret mode).

The reference validates its spreading substrate (finufft) implicitly through
oracle cross-checks; here the TPU kernel is additionally unit-tested against
the scatter implementation directly (reference test pattern 3: kernel vs
independent formula, ref tests/test_cpu_beams.py:99-109).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fftvis_tpu.nufft.kernels import ESKernel
from fftvis_tpu.nufft.pallas_spread import pallas_spread_fits, spread_pallas_2d
from fftvis_tpu.nufft.transform import _spread_scatter


@pytest.mark.parametrize("nf", [(40, 48), (56, 128)])
@pytest.mark.parametrize("C", [1, 4])
def test_pallas_matches_scatter(nf, C):
    rng = np.random.default_rng(0)
    k = ESKernel.from_eps(1e-6, 2.0)
    n = 300
    # Include near-boundary sources to exercise the wrap fold.
    uy = jnp.asarray(
        np.concatenate([rng.uniform(0, nf[0], n - 20), rng.uniform(0, 1, 10),
                        rng.uniform(nf[0] - 1, nf[0], 10)])
    )
    ux = jnp.asarray(
        np.concatenate([rng.uniform(0, nf[1], n - 20), rng.uniform(0, 1, 10),
                        rng.uniform(nf[1] - 1, nf[1], 10)])
    )
    w = jnp.asarray(rng.normal(size=(C, n)) + 1j * rng.normal(size=(C, n)))

    want = np.asarray(_spread_scatter([uy, ux], w, nf, k.w, k.beta))
    got = np.asarray(
        spread_pallas_2d([uy, ux], w, nf, k.w, k.beta, interpret=True)
    )
    scale = np.abs(want).max()
    # The Pallas kernel runs in f32 (kernel evals + accumulation).
    np.testing.assert_allclose(got, want, atol=2e-5 * scale, rtol=0)


def test_fits_budget():
    assert pallas_spread_fits(4, (128, 128), 8)
    assert not pallas_spread_fits(64, (2048, 2048), 8)
    assert not pallas_spread_fits(1, (64, 64, 64), 8)  # 3D unsupported
