"""Differentiable direct-summation front-end (build_differentiable_direct_sim).

The NUFFT engine's grid planning is a host-side function of the geometry, so
``build_differentiable_sim`` cannot differentiate positions. The direct
front-end traces the exact measurement equation end to end; these tests pin

  1. value parity with the in-repo fp64 direct oracle
     (reference/direct_engine.py) across polarization / per-antenna-beam /
     flip configurations,
  2. gradient correctness w.r.t. source positions, antenna positions,
     fluxes, beam tables, and gains against central finite differences,
  3. composition with jax.jit / jax.value_and_grad.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from fftvis_tpu import TelescopeLocation  # noqa: E402
from fftvis_tpu.autodiff import build_differentiable_direct_sim  # noqa: E402
from fftvis_tpu.beams import GaussianBeam  # noqa: E402
from fftvis_tpu.beams.gridded import GriddedBeam  # noqa: E402
from fftvis_tpu.beams.interface import BeamInterface, prepare_beam_unpolarized  # noqa: E402
from fftvis_tpu.reference.direct_engine import DirectSimulationEngine  # noqa: E402

LOC = TelescopeLocation(np.deg2rad(-30.72), np.deg2rad(21.43), 1000.0)


def _setup(nant=4, nsrc=12, nfreq=2, ntime=2, seed=0):
    rng = np.random.default_rng(seed)
    ants = {
        i: np.array([*rng.uniform(-40, 40, 2), 0.0]) for i in range(nant)
    }
    ra = rng.uniform(0, 2 * np.pi, nsrc)
    dec = np.arcsin(rng.uniform(-1, 1, nsrc))
    freqs = np.linspace(1.0e8, 1.2e8, nfreq)
    times = 2459863.2 + np.linspace(0, 0.01, ntime)
    return rng, ants, ra, dec, freqs, times


def _gridded_beams(n, freqs, n_az=73, n_za=37):
    return [
        GriddedBeam.from_function(
            GaussianBeam(diameter=12.0 + 0.5 * i), n_az=n_az, n_za=n_za,
            freqs=tuple(float(f) for f in freqs),
        )
        for i in range(n)
    ]


# ---------------------------------------------------------------------------
# 1. value parity vs the fp64 direct oracle
# ---------------------------------------------------------------------------


def test_value_parity_unpolarized():
    rng, ants, ra, dec, freqs, times = _setup()
    fluxes = rng.uniform(0.1, 1.0, (ra.size, freqs.size))
    beam = GaussianBeam(diameter=12.0)
    sim_fn, params = build_differentiable_direct_sim(
        ants, fluxes, ra, dec, freqs, times, beam, LOC, polarized=False
    )
    got = np.asarray(sim_fn(params))
    want = DirectSimulationEngine().simulate(
        ants=ants, freqs=freqs, fluxes=fluxes,
        beam_list=[prepare_beam_unpolarized(BeamInterface(beam))],
        ra=ra, dec=dec, times=times, telescope_loc=LOC, polarized=False,
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-12 * np.abs(want).max())


@pytest.mark.parametrize("iquv", [False, True])
def test_value_parity_polarized_perantenna(iquv):
    """Per-antenna tabulated beams: exercises pair routing AND flips."""
    rng, ants, ra, dec, freqs, times = _setup(nant=4, nsrc=10)
    if iquv:
        fluxes = rng.uniform(0.1, 1.0, (ra.size, freqs.size, 4))
        fluxes[..., 1:] *= 0.1
    else:
        fluxes = rng.uniform(0.1, 1.0, (ra.size, freqs.size))
    beams = _gridded_beams(2, freqs)
    beam_idx = np.array([0, 1, 1, 0])
    sim_fn, params = build_differentiable_direct_sim(
        ants, fluxes, ra, dec, freqs, times, beams, LOC,
        beam_idx=beam_idx, polarized=True,
    )
    got = np.asarray(sim_fn(params))
    want = DirectSimulationEngine().simulate(
        ants=ants, freqs=freqs, fluxes=fluxes,
        beam_list=[BeamInterface(b) for b in beams], beam_idx=beam_idx,
        ra=ra, dec=dec, times=times, telescope_loc=LOC, polarized=True,
    )
    assert got.shape == want.shape
    assert got.shape[:4] == (freqs.size, times.size, 2, 2)
    np.testing.assert_allclose(got, want, atol=1e-12 * np.abs(want).max())


def test_value_parity_explicit_baselines_and_simple_coords():
    rng, ants, ra, dec, freqs, times = _setup(nant=3, nsrc=8, nfreq=1)
    fluxes = rng.uniform(0.1, 1.0, (ra.size, 1))
    baselines = [(0, 1), (2, 0), (1, 1)]
    beam = GaussianBeam(diameter=12.0)
    sim_fn, params = build_differentiable_direct_sim(
        ants, fluxes, ra, dec, freqs, times, beam, LOC,
        baselines=baselines, polarized=False, coord_method="simple",
    )
    got = np.asarray(sim_fn(params))
    want = DirectSimulationEngine().simulate(
        ants=ants, freqs=freqs, fluxes=fluxes,
        beam_list=[prepare_beam_unpolarized(BeamInterface(beam))],
        ra=ra, dec=dec, times=times, telescope_loc=LOC,
        baselines=baselines, polarized=False, coord_method="simple",
    )
    np.testing.assert_allclose(got, want, atol=1e-12 * np.abs(want).max())


# ---------------------------------------------------------------------------
# 2. gradients vs central finite differences
# ---------------------------------------------------------------------------


def _loss_fn(sim_fn, data):
    def loss(p):
        r = sim_fn(p) - data
        return jnp.sum(jnp.abs(r) ** 2)

    return loss


def _fd_check(loss, params, key, picks, rel=2e-5, h=None):
    """Central finite differences on a few entries of params[key]."""
    g = jax.grad(loss)(params)[key]
    base = np.asarray(params[key], dtype=float)
    h = h if h is not None else 1e-5 * max(1.0, np.abs(base).max())
    for idx in picks:
        pert = base.copy()
        pert[idx] += h
        lp = float(loss({**params, key: jnp.asarray(pert)}))
        pert[idx] -= 2 * h
        lm = float(loss({**params, key: jnp.asarray(pert)}))
        fd = (lp - lm) / (2 * h)
        got = float(np.asarray(g)[idx])
        assert np.isfinite(got)
        assert abs(got - fd) <= rel * max(abs(fd), abs(got), 1e-3), (
            key, idx, got, fd,
        )


def test_grad_source_positions():
    rng, ants, ra, dec, freqs, times = _setup(nant=3, nsrc=6, nfreq=1, ntime=1)
    dec = np.clip(dec, -1.2, -0.2)  # keep sources well above the horizon
    fluxes = rng.uniform(0.5, 1.0, (ra.size, 1))
    sim_fn, params = build_differentiable_direct_sim(
        ants, fluxes, ra, dec, freqs, times, GaussianBeam(diameter=12.0),
        LOC, polarized=False, differentiate_positions=True,
    )
    data = sim_fn(params) * 1.01  # nonzero residual
    loss = _loss_fn(sim_fn, data)
    _fd_check(loss, params, "ra", [(0,), (3,)], h=1e-7)
    _fd_check(loss, params, "dec", [(1,), (4,)], h=1e-7)


def test_grad_antenna_positions():
    rng, ants, ra, dec, freqs, times = _setup(nant=4, nsrc=6, nfreq=1, ntime=1)
    dec = np.clip(dec, -1.2, -0.2)
    fluxes = rng.uniform(0.5, 1.0, (ra.size, 1))
    sim_fn, params = build_differentiable_direct_sim(
        ants, fluxes, ra, dec, freqs, times, GaussianBeam(diameter=12.0),
        LOC, polarized=False, differentiate_antpos=True,
    )
    data = sim_fn(params) * (1 + 0.02j)
    loss = _loss_fn(sim_fn, data)
    _fd_check(
        loss, params, "antpos", [(0, 0), (1, 1), (2, 2)], h=1e-6
    )


def test_grad_fluxes_and_gains():
    rng, ants, ra, dec, freqs, times = _setup(nant=3, nsrc=6, nfreq=2, ntime=1)
    dec = np.clip(dec, -1.2, -0.2)
    fluxes = rng.uniform(0.5, 1.0, (ra.size, freqs.size))
    sim_fn, params = build_differentiable_direct_sim(
        ants, fluxes, ra, dec, freqs, times, GaussianBeam(diameter=12.0),
        LOC, polarized=False, differentiate_gains=True,
    )
    data = sim_fn(params) * 0.98
    loss = _loss_fn(sim_fn, data)
    _fd_check(loss, params, "fluxes", [(0, 0), (3, 1)])
    _fd_check(loss, params, "gains", [(0, 1, 0), (1, 2, 1)], h=1e-6)


def test_grad_beam_table_polarized():
    rng, ants, ra, dec, freqs, times = _setup(nant=3, nsrc=6, nfreq=1, ntime=1)
    dec = np.clip(dec, -1.2, -0.2)
    fluxes = rng.uniform(0.5, 1.0, (ra.size, 1))
    beams = _gridded_beams(2, freqs)
    sim_fn, params = build_differentiable_direct_sim(
        ants, fluxes, ra, dec, freqs, times, beams, LOC,
        beam_idx=np.array([0, 1, 0]), polarized=True,
        differentiate_beam=True,
    )
    data = sim_fn(params) * 1.02
    loss = _loss_fn(sim_fn, data)
    g = jax.grad(loss)(params)["beam_table"]
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0
    # Spot-check one well-populated table entry by finite differences.
    idx = np.unravel_index(int(np.abs(g).argmax()), g.shape)
    _fd_check(loss, params, "beam_table", [idx], rel=1e-3, h=1e-6)


# ---------------------------------------------------------------------------
# 3. composition and validation
# ---------------------------------------------------------------------------


def test_jit_value_and_grad_compose():
    rng, ants, ra, dec, freqs, times = _setup(nant=3, nsrc=5, nfreq=1, ntime=2)
    fluxes = rng.uniform(0.5, 1.0, (ra.size, 1))
    sim_fn, params = build_differentiable_direct_sim(
        ants, fluxes, ra, dec, freqs, times, GaussianBeam(diameter=12.0),
        LOC, polarized=False, differentiate_positions=True,
        differentiate_antpos=True,
    )
    data = sim_fn(params)
    step = jax.jit(jax.value_and_grad(_loss_fn(sim_fn, data * 1.01)))
    v1, g1 = step(params)
    v2, g2 = step(params)  # cached executable
    assert np.isclose(float(v1), float(v2))
    for k in ("fluxes", "ra", "dec", "antpos"):
        assert np.isfinite(np.asarray(g1[k])).all()
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]))


def test_gain_fit_recovers_injected_gain():
    """An injected per-antenna phase gain is recovered by gradient descent."""
    rng, ants, ra, dec, freqs, times = _setup(nant=3, nsrc=8, nfreq=1, ntime=1)
    dec = np.clip(dec, -1.2, -0.2)
    fluxes = rng.uniform(0.5, 1.0, (ra.size, 1))
    sim_fn, params = build_differentiable_direct_sim(
        ants, fluxes, ra, dec, freqs, times, GaussianBeam(diameter=12.0),
        LOC, polarized=False, differentiate_gains=True,
    )
    true_g = np.array(params["gains"])  # writable host copy
    true_g[:, 1, 0] = [np.cos(0.3), np.sin(0.3)]  # antenna 1: phase 0.3 rad
    data = sim_fn({**params, "gains": jnp.asarray(true_g)})

    import optax

    loss = _loss_fn(sim_fn, data)
    step = jax.jit(jax.value_and_grad(loss))
    opt = optax.adam(5e-2)
    p = dict(params)
    state = opt.init(p["gains"])
    for _ in range(300):
        v, g = step(p)
        upd, state = opt.update(g["gains"], state)
        p = {**p, "gains": optax.apply_updates(p["gains"], upd)}
    assert float(v) < 1e-6 * float(jnp.sum(jnp.abs(data) ** 2))


def test_differentiate_beam_requires_stacked_tables():
    rng, ants, ra, dec, freqs, times = _setup(nant=3, nsrc=4, nfreq=1, ntime=1)
    fluxes = rng.uniform(0.5, 1.0, (ra.size, 1))
    with pytest.raises(ValueError, match="stacked-table"):
        build_differentiable_direct_sim(
            ants, fluxes, ra, dec, freqs, times,
            GaussianBeam(diameter=12.0), LOC, polarized=True,
            differentiate_beam=True,
        )


def test_bad_sky_shape_raises():
    rng, ants, ra, dec, freqs, times = _setup(nant=3, nsrc=4, nfreq=1, ntime=1)
    fluxes = rng.uniform(0.5, 1.0, (ra.size, 1, 4))
    with pytest.raises(ValueError, match="2D"):
        build_differentiable_direct_sim(
            ants, fluxes, ra, dec, freqs, times,
            GaussianBeam(diameter=12.0), LOC, polarized=False,
        )
