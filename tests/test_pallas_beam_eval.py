"""Pallas beam-table evaluator vs the XLA gather interpolation.

The kernel (beams/pallas_eval.py) must reproduce map_coordinates_2d_cl
exactly-ish for both spline orders, wrap and clamp x boundaries, and
edge-hugging coordinates (clamp/mirror paths). CPU runs in interpreter
mode; the TPU lowering shares the traced body.

Reference anchor: pyuvdata's az_za_map_coordinates interpolation that the
reference delegates beam evaluation to (ref src/fftvis/cpu/beams.py:62-74).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fftvis_tpu.beams.interp import (
    map_coordinates_2d_cl,
    spline_prefilter_2d,
)
from fftvis_tpu.beams.pallas_eval import (
    pallas_beam_eval_ok,
    pallas_map_coordinates_cl,
)


def _coords(n, ny, nx, seed, edges=True):
    rng = np.random.default_rng(seed)
    y = rng.uniform(-0.5, ny - 0.5, n)
    x = rng.uniform(-1.0, nx + 1.0, n)
    if edges:
        # Exercise clamp/mirror/wrap paths hard.
        k = n // 8
        y[:k] = rng.uniform(-0.99, 0.99, k)
        y[k : 2 * k] = rng.uniform(ny - 1.99, ny - 0.01, k)
        x[:k] = rng.uniform(-0.99, 0.99, k)
        x[k : 2 * k] = rng.uniform(nx - 1.99, nx + 0.99, k)
    return jnp.asarray(y, jnp.float32), jnp.asarray(x, jnp.float32)


@pytest.mark.parametrize("order", [1, 3])
@pytest.mark.parametrize("wrap", [True, False])
@pytest.mark.parametrize("ny,nx,ch", [(91, 181, 8), (21, 40, 3)])
def test_pallas_beam_eval_matches_gather(order, wrap, ny, nx, ch):
    rng = np.random.default_rng(order * 10 + wrap)
    data = rng.normal(size=(ny, nx, ch)).astype(np.float32)
    if order == 3:
        data = np.asarray(
            spline_prefilter_2d(jnp.asarray(data), axes=(0, 1)),
            dtype=np.float32,
        )
    d = jnp.asarray(data)
    y, x = _coords(700, ny, nx, seed=ny + order)
    assert pallas_beam_eval_ok(ny, nx, ch, order, np.float32, 700)
    got = np.asarray(
        pallas_map_coordinates_cl(d, y, x, order=order, wrap_x=wrap)
    )
    want = np.asarray(
        map_coordinates_2d_cl(d, y, x, order=order, wrap_x=wrap)
    )
    scale = np.abs(want).max()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-6 * scale, rtol=0)


@pytest.mark.parametrize("order", [1, 3])
def test_pallas_beam_eval_period_boundary(order):
    """Coordinates at exact period multiples (x in [nx, nx+1), [-nx, ...)).

    Regression for the constant-division fold: XLA lowers x/nx as a
    reciprocal multiply, so floor(k*nx / nx) evaluated off by one exactly
    at multiples of nx, silently dropping those sources (fuzz seed 3037).
    """
    rng = np.random.default_rng(1)
    ny, nx, ch = 104, 110, 3
    data = rng.normal(size=(ny, nx, ch)).astype(np.float32)
    if order == 3:
        data = np.asarray(
            spline_prefilter_2d(jnp.asarray(data), axes=(0, 1)),
            dtype=np.float32,
        )
    d = jnp.asarray(data)
    n = 64
    y = jnp.asarray(rng.uniform(0, ny - 1, n), jnp.float32)
    x = np.concatenate([
        rng.uniform(nx, nx + 1, n // 4),          # one period above
        rng.uniform(-nx - 1, -nx, n // 4),        # one period below
        np.array([0.0, float(nx), float(2 * nx), -float(nx)]),
        rng.uniform(0, nx, n - 3 * (n // 4) - 4 + n // 4),
    ]).astype(np.float32)[:n]
    x = jnp.asarray(x)
    got = np.asarray(
        pallas_map_coordinates_cl(d, y, x, order=order, wrap_x=True)
    )
    want = np.asarray(
        map_coordinates_2d_cl(d, y, x, order=order, wrap_x=True)
    )
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-5 * scale, rtol=0)


def test_pallas_beam_eval_gate():
    assert not pallas_beam_eval_ok(91, 181, 8, 1, np.float64, 700)
    assert not pallas_beam_eval_ok(91, 181, 8, 2, np.float32, 700)  # bad order
    assert not pallas_beam_eval_ok(1, 181, 8, 1, np.float32, 700)
    assert pallas_beam_eval_ok(91, 181, 296, 3, np.float32, 700)
    # large point sets exceed the VMEM-resident output block
    assert not pallas_beam_eval_ok(91, 181, 296, 3, np.float32, 200_000)


def test_pallas_beam_eval_env_dispatch(monkeypatch):
    """FFTVIS_BEAM_EVAL routes interp_table_cl through the kernel."""
    from fftvis_tpu.beams.interp import interp_table_cl

    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.normal(size=(40, 64, 4)), jnp.float32)
    y, x = _coords(300, 40, 64, seed=5)
    monkeypatch.setenv("FFTVIS_BEAM_EVAL", "pallas")
    got = np.asarray(interp_table_cl(data, y, x, order=1, wrap_x=True))
    monkeypatch.setenv("FFTVIS_BEAM_EVAL", "gather")
    want = np.asarray(interp_table_cl(data, y, x, order=1, wrap_x=True))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-6 * scale, rtol=0)


def test_pallas_beam_eval_engine_equivalence(monkeypatch):
    """Full engine sim with tabulated per-antenna beams: pallas == gather.

    Mirrors the scored north-star configuration at toy scale: polarized,
    multiple distinct GriddedBeams routed by beam_idx.
    """
    from fftvis_tpu import TelescopeLocation, simulate_vis
    from fftvis_tpu.beams import GaussianBeam
    from fftvis_tpu.beams.gridded import GriddedBeam
    from fftvis_tpu.geometry import hex_array

    rng = np.random.default_rng(3)
    loc = TelescopeLocation(np.deg2rad(-30.72), np.deg2rad(21.43), 1000.0)
    nsrc = 400
    ra = rng.uniform(0, 2 * np.pi, nsrc)
    dec = np.clip(loc.lat + rng.normal(0, 0.4, nsrc), -np.pi / 2, np.pi / 2)
    ants = hex_array(3, sep=14.6)
    freq = 1.0e8
    beams = [
        GriddedBeam.from_function(
            GaussianBeam(diameter=13.0 + 0.3 * i), n_az=91, n_za=46,
            freqs=(freq,),
        )
        for i in range(3)
    ]
    kw = dict(
        ants=ants,
        fluxes=rng.uniform(0.1, 1.0, (nsrc, 1)),
        ra=ra, dec=dec,
        freqs=np.array([freq]),
        times=2459863.2 + np.linspace(0, 0.01, 2),
        beam=beams,
        beam_idx=np.arange(len(ants)) % 3,
        telescope_loc=loc,
        polarized=True,
        precision=1,
        backend="tpu",
    )
    monkeypatch.setenv("FFTVIS_BEAM_EVAL", "pallas")
    got = simulate_vis(**kw)
    monkeypatch.setenv("FFTVIS_BEAM_EVAL", "gather")
    want = simulate_vis(**kw)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=1e-5 * scale, rtol=0)
