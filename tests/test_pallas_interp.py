"""Pallas occupancy-proportional interpolation vs the XLA forms.

The Pallas kernel (nufft/pallas_interp.py) must reproduce the einsum-tap
and tiled interpolations exactly-ish: identical host-planned tap tables,
only the execution schedule differs. CPU runs in interpreter mode.

Reference anchor: the interpolation half of finufft type-2/type-3
(ref /root/reference/src/fftvis/cpu/nufft.py:48-118).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fftvis_tpu.nufft.pallas_interp import PallasInterp, pallas_interp_ok
from fftvis_tpu.nufft.transform import _TiledInterp, plan_type3


def _plan_and_grid(m, nf_hint, seed, C=1):
    """A type-3 plan with ~nf_hint fine grid and m clustered targets.

    nf ~ 2 sigma^2 X S / pi, so with X = 2 pi the target half-extent S
    sets the grid: S ~ nf_hint / 16 at sigma = 2.
    """
    rng = np.random.default_rng(seed)
    S = nf_hint / 16.0
    # Targets cluster at the origin like baseline distributions do.
    s = np.concatenate(
        [rng.normal(0, S / 10, (2, m // 2)),
         rng.uniform(-S, S, (2, m - m // 2))],
        axis=1,
    )
    plan = plan_type3(s, x_extent=2 * np.pi, eps=1e-6, upsample_factor=2.0)
    G = jnp.asarray(
        rng.normal(size=(C,) + tuple(plan.nf))
        + 1j * rng.normal(size=(C,) + tuple(plan.nf)),
        jnp.complex64,
    )
    return plan, G


def _einsum_ref(plan, G, sel=None):
    ti = [t if sel is None else t[sel] for t in plan.tap_idx]
    tv = [
        jnp.asarray(t if sel is None else t[sel], jnp.float32)
        for t in plan.tap_val
    ]
    sub = np.asarray(G)[:, ti[0][:, :, None], ti[1][:, None, :]]
    re = np.einsum("cmab,ma,mb->cm", sub.real, tv[0], tv[1])
    im = np.einsum("cmab,ma,mb->cm", sub.imag, tv[0], tv[1])
    return re + 1j * im


@pytest.mark.parametrize("m,C", [(300, 1), (700, 2)])
def test_pallas_interp_matches_einsum(m, C):
    plan, G = _plan_and_grid(m, 400, seed=m, C=C)
    assert pallas_interp_ok(plan.nf, plan.kernel.w, 2 * C, m, np.float32)
    got = np.asarray(PallasInterp(plan)(G))
    want = _einsum_ref(plan, G)
    scale = np.abs(want).max()
    assert got.shape == want.shape == (C, m)
    np.testing.assert_allclose(got, want, atol=3e-6 * scale, rtol=0)


def test_pallas_interp_selection_matches_tiled():
    m = 500
    plan, G = _plan_and_grid(m, 512, seed=3)
    sel = np.random.default_rng(0).choice(m, size=123, replace=False)
    sel.sort()
    got = np.asarray(PallasInterp(plan, sel)(G))
    want = np.asarray(_TiledInterp(plan, sel)(G))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=3e-6 * scale, rtol=0)


def test_pallas_interp_gate():
    plan, _ = _plan_and_grid(100, 400, seed=1)
    w = plan.kernel.w
    assert not pallas_interp_ok(plan.nf, w, 2, 100, np.float64)
    assert not pallas_interp_ok((64, 64), w, 2, 100, np.float32)  # nfx < 128
    assert not pallas_interp_ok(plan.nf + (3,), w, 2, 100, np.float32)


def test_pallas_engine_multipair_type3(monkeypatch):
    """Multi-beam-pair type-3 with BOTH Pallas kernels forced == defaults.

    Exercises the per-pair interpolation subsets (each pair's baselines
    are a distinct host-planned sel) through PallasInterp, and the
    multi-channel spread through the band kernel.
    """
    from fftvis_tpu import TelescopeLocation, simulate_vis
    from fftvis_tpu.beams import GaussianBeam

    rng = np.random.default_rng(9)
    loc = TelescopeLocation(np.deg2rad(-30.72), np.deg2rad(21.43), 1000.0)
    nsrc = 600
    ra = rng.uniform(0, 2 * np.pi, nsrc)
    dec = np.clip(loc.lat + rng.normal(0, 0.4, nsrc), -np.pi / 2, np.pi / 2)
    ants = {i: np.array([*rng.uniform(-60, 60, 2), 0.0]) for i in range(6)}
    kw = dict(
        ants=ants,
        fluxes=rng.uniform(0.1, 1.0, (nsrc, 2)),
        ra=ra, dec=dec,
        freqs=np.array([1.0e8, 1.1e8]),
        times=2459863.2 + np.linspace(0, 0.01, 2),
        beam=[GaussianBeam(diameter=12.0), GaussianBeam(diameter=14.0)],
        beam_idx=np.array([0, 1, 0, 1, 0, 1]),
        telescope_loc=loc,
        polarized=True,
        precision=1,
        force_use_type3=True,
        backend="tpu",
    )
    monkeypatch.setenv("FFTVIS_SPREADER", "pallas")
    monkeypatch.setenv("FFTVIS_INTERP", "pallas")
    got = simulate_vis(**kw)
    monkeypatch.setenv("FFTVIS_SPREADER", "scatter")
    monkeypatch.setenv("FFTVIS_INTERP", "auto")
    want = simulate_vis(**kw)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=5e-5 * scale, rtol=0)


def test_pallas_interp_env_dispatch(monkeypatch):
    """FFTVIS_INTERP=pallas routes Type3Executor.interpolate through it."""
    from fftvis_tpu.nufft.transform import Type3Executor

    m = 400
    plan, G = _plan_and_grid(m, 480, seed=7)
    ex = Type3Executor(plan)
    monkeypatch.setenv("FFTVIS_INTERP", "pallas")
    got = np.asarray(ex.interpolate(G))
    assert any(
        isinstance(k, tuple) and k[1] == "pallas" for k in ex._interp_cache
    ), "pallas interp was not selected"
    want = _einsum_ref(plan, G)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=3e-6 * scale, rtol=0)
