"""Pallas band-accumulator spreader vs the XLA spreaders.

The Pallas kernel (nufft/pallas_spread.py) must reproduce the scatter
spreader's grid bit-for-bit-modulo-summation-order: same ES kernel, same
cell/frac coordinate decomposition, same periodic wrap semantics. On CPU the
kernel runs in interpreter mode; the TPU lowering shares the traced body.

Reference anchor: the spreading half of finufft type-1/type-3
(ref /root/reference/src/fftvis/cpu/nufft.py:48-175).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fftvis_tpu.nufft.kernels import ESKernel
from fftvis_tpu.nufft.pallas_spread import (
    pallas_spread_ok,
    spread_pallas_tiled,
)
from fftvis_tpu.nufft.transform import _spread_scatter


def _mk(n, nf, C, seed, cluster=False):
    rng = np.random.default_rng(seed)
    if cluster:
        # Pile most sources into one corner tile: exercises the occupancy
        # fori_loop with wildly unequal chunk counts per tile.
        uy = np.abs(rng.normal(0, 2.0, n)) % nf[0]
        ux = np.abs(rng.normal(0, 2.0, n)) % nf[1]
    else:
        uy = rng.uniform(0, nf[0], n)
        ux = rng.uniform(0, nf[1], n)
    w = rng.normal(size=(C, n)) + 1j * rng.normal(size=(C, n))
    return (
        [jnp.asarray(uy, jnp.float32), jnp.asarray(ux, jnp.float32)],
        jnp.asarray(w, jnp.complex64),
    )


@pytest.mark.parametrize("C", [1, 2])
@pytest.mark.parametrize("cluster", [False, True])
@pytest.mark.parametrize(
    "n,nf,ty,sx",
    [
        (97, (64, 80), 16, 32),     # n < Pc, partial chunks
        (400, (48, 48), 16, 16),    # square tiles, heavy wraps
        (1000, (128, 96), 32, 24),  # multi-row bands
    ],
)
def test_pallas_matches_scatter(n, nf, ty, sx, C, cluster):
    kern = ESKernel.from_eps(1e-6, sigma=2.0)
    u, wts = _mk(n, nf, C, seed=n + C, cluster=cluster)
    assert pallas_spread_ok(nf, kern.w, ty, sx, 2 * C, n, np.float32)
    got = np.asarray(
        spread_pallas_tiled(u, wts, nf, kern.w, kern.beta, ty, sx)
    )
    want = np.asarray(_spread_scatter(u, wts, nf, kern.w, kern.beta))
    scale = np.abs(want).max()
    assert got.shape == want.shape == (C,) + tuple(nf)
    np.testing.assert_allclose(got, want, atol=2e-5 * scale, rtol=0)


def test_pallas_ds_low_parts():
    """DS-refined coordinates flow through the cell/frac packing."""
    kern = ESKernel.from_eps(1e-6, sigma=2.0)
    nf, ty, sx, n = (64, 64), 16, 16, 300
    u, wts = _mk(n, nf, 1, seed=3)
    # A low part that shifts every source by 0.25 cells: the pallas grid
    # must match the scatter grid evaluated at the shifted positions.
    lo = [jnp.full(n, 0.25, jnp.float32), jnp.full(n, -0.25, jnp.float32)]
    got = np.asarray(
        spread_pallas_tiled(u, wts, nf, kern.w, kern.beta, ty, sx,
                            u_lo_list=lo)
    )
    want = np.asarray(
        _spread_scatter(u, wts, nf, kern.w, kern.beta, u_lo_list=lo)
    )
    scale = np.abs(want).max()
    # The 0.25-cell shift parks kernel arguments near the support edge,
    # where |d psi/dt| ~ beta * psi amplifies f32 rounding-order noise
    # between the two evaluation orders; 2e-4*scale bounds it comfortably
    # while still catching a dropped/misapplied low part (0.25 cells would
    # move values by O(1)*scale).
    np.testing.assert_allclose(got, want, atol=2e-4 * scale, rtol=0)


def test_pallas_sort_carry_matches_gather_permute(monkeypatch):
    """FFTVIS_SORT_CARRY=1 carries the packed payload through a
    multi-operand lax.sort instead of permuting with a post-sort gather.
    Both orderings must produce the same grid (identical tile bins; only
    the in-bin summation order may differ at f32 rounding level)."""
    kern = ESKernel.from_eps(1e-6, sigma=2.0)
    nf, ty, sx, n = (96, 96), 16, 16, 700
    u, wts = _mk(n, nf, 2, seed=17, cluster=True)
    monkeypatch.delenv("FFTVIS_SORT_CARRY", raising=False)
    base = np.asarray(spread_pallas_tiled(u, wts, nf, kern.w, kern.beta, ty, sx))
    monkeypatch.setenv("FFTVIS_SORT_CARRY", "1")
    carry = np.asarray(spread_pallas_tiled(u, wts, nf, kern.w, kern.beta, ty, sx))
    scale = np.abs(base).max()
    np.testing.assert_allclose(carry, base, atol=2e-5 * scale, rtol=0)


def test_pallas_gate_rejects_f64_and_tiny_grids():
    kern = ESKernel.from_eps(1e-6, sigma=2.0)
    assert not pallas_spread_ok((64, 64), kern.w, 16, 16, 2, 100, np.float64)
    # Grid smaller than the halo: pads would wrap more than one period.
    assert not pallas_spread_ok((4, 4), kern.w, 4, 4, 2, 100, np.float32)
    # 1D/3D shapes are not handled.
    assert not pallas_spread_ok((64,), kern.w, 16, 16, 2, 100, np.float32)
    # Tile shorter than the kernel halo (FFTVIS_TILE override): the y
    # overlap-add would need a negative pad (regression: gate admitted it).
    m_halo = kern.w // 2 + 2
    assert not pallas_spread_ok(
        (1200, 576), kern.w, m_halo - 2, 64, 2, 100, np.float32
    )


def test_pallas_engine_type3_equivalence(monkeypatch):
    """Full engine type-3 sim through the Pallas spreader == XLA spreader.

    precision=1 keeps the pipeline f32 so the Pallas gate passes on the CPU
    test backend (interpret mode); only the spreading lowering differs
    between the two runs, so agreement is f32-rounding-tight.
    """
    from fftvis_tpu import TelescopeLocation
    from fftvis_tpu.beams import GaussianBeam
    from fftvis_tpu.beams.interface import (
        BeamInterface,
        prepare_beam_unpolarized,
    )
    from fftvis_tpu.geometry import hex_array
    from fftvis_tpu.tpu.engine import TPUSimulationEngine

    rng = np.random.default_rng(5)
    loc = TelescopeLocation(np.deg2rad(-30.72), np.deg2rad(21.43), 1000.0)
    ants = hex_array(3, sep=14.6)
    nsrc = 600
    ra = rng.uniform(0, 2 * np.pi, nsrc)
    dec = np.clip(loc.lat + rng.normal(0, 0.4, nsrc), -np.pi / 2, np.pi / 2)
    kw = dict(
        ants=ants,
        fluxes=rng.uniform(0.1, 1.0, (nsrc, 2)),
        ra=ra, dec=dec,
        freqs=np.array([1.0e8, 1.1e8]),
        times=2459863.2 + np.linspace(0, 0.01, 2),
        beam_list=[prepare_beam_unpolarized(
            BeamInterface(GaussianBeam(diameter=14.0))
        )],
        telescope_loc=loc,
        polarized=False,
        precision=1,
        force_use_type3=True,
    )
    monkeypatch.setenv("FFTVIS_SPREADER", "pallas")
    got = TPUSimulationEngine(nufft_mode="type3").simulate(**kw)
    monkeypatch.setenv("FFTVIS_SPREADER", "scatter")
    want = TPUSimulationEngine(nufft_mode="type3").simulate(**kw)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=5e-5 * scale, rtol=0)


def test_pallas_engine_sharded_matches_unsharded(monkeypatch):
    """Pallas env + shard_map SPMD: correct results, graceful fallback.

    On the CPU test backend the kernels run in interpret mode, which
    cannot satisfy shard_map's vma checker (kernel-internal indices are
    unvarying) -- the dispatch must detect that and fall back to the XLA
    lowerings WITHOUT crashing or changing results. On TPU the compiled
    kernels are single primitives with a declared output vma and run
    under shard_map directly (exercised by the hardware bench).
    """
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")

    from fftvis_tpu import TelescopeLocation
    from fftvis_tpu.beams import GaussianBeam
    from fftvis_tpu.beams.interface import (
        BeamInterface,
        prepare_beam_unpolarized,
    )
    from fftvis_tpu.geometry import hex_array
    from fftvis_tpu.parallel.mesh import make_mesh
    from fftvis_tpu.tpu.engine import TPUSimulationEngine

    rng = np.random.default_rng(11)
    loc = TelescopeLocation(np.deg2rad(-30.72), np.deg2rad(21.43), 1000.0)
    nsrc = 500
    ra = rng.uniform(0, 2 * np.pi, nsrc)
    dec = np.clip(loc.lat + rng.normal(0, 0.4, nsrc), -np.pi / 2, np.pi / 2)
    kw = dict(
        ants=hex_array(3, sep=14.6),
        fluxes=rng.uniform(0.1, 1.0, (nsrc, 2)),
        ra=ra, dec=dec,
        freqs=np.array([1.0e8, 1.1e8]),
        times=2459863.2 + np.linspace(0, 0.01, 2),
        beam_list=[prepare_beam_unpolarized(
            BeamInterface(GaussianBeam(diameter=14.0))
        )],
        telescope_loc=loc,
        polarized=False,
        precision=1,
        force_use_type3=True,
    )
    monkeypatch.setenv("FFTVIS_SPREADER", "pallas")
    monkeypatch.setenv("FFTVIS_INTERP", "pallas")
    want = TPUSimulationEngine(nufft_mode="type3").simulate(**kw)
    got = TPUSimulationEngine(
        nufft_mode="type3", mesh=make_mesh(time=2, source=2)
    ).simulate(**kw)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=1e-5 * scale, rtol=0)


def test_pallas_env_dispatch(monkeypatch):
    """FFTVIS_SPREADER=pallas routes _spread_auto through the kernel."""
    from fftvis_tpu.nufft.transform import _spread_auto

    kern = ESKernel.from_eps(1e-6, sigma=2.0)
    nf = (64, 80)
    u, wts = _mk(200, nf, 1, seed=11)
    monkeypatch.setenv("FFTVIS_SPREADER", "pallas")
    got = np.asarray(_spread_auto(u, wts, nf, kern.w, kern.beta))
    monkeypatch.setenv("FFTVIS_SPREADER", "scatter")
    want = np.asarray(_spread_auto(u, wts, nf, kern.w, kern.beta))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-5 * scale, rtol=0)
