"""Engine-level double-single (compensated) direct path.

An explicitly-requested eps below the fp32 floor routes the simulation
through the exact direct path with two-float arithmetic (engine.simulate
use_ds; tpu/ds.py). These tests pin the routing contract and the accuracy
improvement on the CPU backend. NOTE: XLA:CPU's fusion pipeline duplicates
subexpressions with one-ulp rounding differences, which costs the DS chain
part of its budget on CPU; the full fp64-class win (~100x over plain f32,
measured 7e-7 vs 7e-5 on a wide array with a gentle beam) is realized on
TPU, where compilation preserves the error-free transformations exactly.
CPU assertions below are set at what XLA:CPU actually delivers.
"""

import logging

import numpy as np
import pytest

from fftvis_tpu import TelescopeLocation, simulate_vis
from fftvis_tpu.beams import GaussianBeam

LOC = TelescopeLocation(np.deg2rad(-30.7), np.deg2rad(21.4), 1000.0)


def _problem(span=2000.0, nsrc=120, polarized=False):
    rng = np.random.default_rng(3)
    ants = {i: np.array([*rng.uniform(-span, span, 2), 0.0]) for i in range(6)}
    ra = rng.uniform(0, 2 * np.pi, nsrc)
    dec = np.clip(LOC.lat + rng.normal(0, 0.4, nsrc), -np.pi / 2, np.pi / 2)
    flux = rng.uniform(0.1, 1.0, (nsrc, 2))
    return dict(
        ants=ants, fluxes=flux, ra=ra, dec=dec,
        freqs=np.array([1.4e8, 1.5e8]),
        times=2459863.2 + np.linspace(0, 0.02, 3),
        beam=GaussianBeam(diameter=12.0), telescope_loc=LOC,
        polarized=polarized,
    )


class TestRouting:
    def test_env_opt_in_forces_direct_ds(self, caplog, monkeypatch):
        monkeypatch.setenv("FFTVIS_DS", "1")
        kw = _problem(span=60.0, nsrc=40)
        with caplog.at_level(logging.INFO, logger="fftvis_tpu.tpu.engine"):
            vis = simulate_vis(precision=1, **kw)
        assert vis.dtype == np.complex128
        assert any("double-single" in r.message for r in caplog.records)
        assert any("direct path" in r.message for r in caplog.records)

    def test_default_eps_keeps_fast_path(self):
        kw = _problem(span=60.0, nsrc=40)
        vis = simulate_vis(precision=1, **kw)  # default eps: no DS
        assert vis.dtype == np.complex64

    def test_precision1_small_eps_keeps_dtype_contract(self, caplog):
        """precision=1 + small explicit eps must NOT silently switch to the
        complex128 DS path (that trigger is reserved for the precision=2
        fp64 contract); it floors eps with the standard warning."""
        kw = _problem(span=60.0, nsrc=40)
        with caplog.at_level(logging.WARNING, logger="fftvis_tpu.tpu.engine"):
            vis = simulate_vis(precision=1, eps=1e-12, **kw)
        assert vis.dtype == np.complex64
        assert any("below what" in r.message for r in caplog.records)

    def test_multi_pair_falls_back_with_warning(self, caplog, monkeypatch):
        monkeypatch.setenv("FFTVIS_DS", "1")
        kw = _problem(span=60.0, nsrc=40, polarized=True)
        beams = [GaussianBeam(diameter=12.0), GaussianBeam(diameter=13.0)]
        kw["beam"] = beams
        kw["beam_idx"] = np.array([0, 1, 0, 1, 0, 1])
        with caplog.at_level(logging.WARNING, logger="fftvis_tpu.tpu.engine"):
            vis = simulate_vis(precision=1, **kw)
        assert vis.dtype == np.complex64  # fp32 fallback
        assert any("single-beam-pair" in r.message for r in caplog.records)


class TestAccuracy:
    @pytest.mark.parametrize("polarized", [False, True])
    def test_ds_beats_plain_f32_wide_array(self, polarized, monkeypatch):
        """km-scale baselines: phases ~1e4 rad, where fp32 loses ~2e-4.

        The DS path must (a) match the fp64 reference much closer than
        plain fp32 and (b) stay within the XLA:CPU-degraded DS budget.
        """
        kw = _problem(span=2000.0, polarized=polarized)
        want = simulate_vis(precision=2, **kw)  # fp64 on the CPU backend
        monkeypatch.delenv("FFTVIS_DS", raising=False)
        got32 = simulate_vis(precision=1, **kw)
        monkeypatch.setenv("FFTVIS_DS", "1")
        gotds = simulate_vis(precision=1, **kw)
        scale = np.abs(want).max()
        err32 = np.abs(got32 - want).max() / scale
        errds = np.abs(gotds - want).max() / scale
        assert errds < err32 / 2
        assert errds < 5e-4

    def test_ds_matches_f64_small_array(self, monkeypatch):
        """Small phases: DS must sit at the f32-beam floor, not fp32's."""
        monkeypatch.setenv("FFTVIS_DS", "1")
        kw = _problem(span=30.0)
        gotds = simulate_vis(precision=1, **kw)
        monkeypatch.delenv("FFTVIS_DS", raising=False)
        want = simulate_vis(precision=2, **kw)
        scale = np.abs(want).max()
        assert np.abs(gotds - want).max() / scale < 2e-5

    def test_ds_output_layout_matches(self, monkeypatch):
        kw = _problem(span=100.0, nsrc=30, polarized=True)
        a = simulate_vis(precision=1, **kw)
        monkeypatch.setenv("FFTVIS_DS", "1")
        b = simulate_vis(precision=1, **kw)
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=5e-4 * np.abs(a).max())
