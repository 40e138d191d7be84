"""Automatic rank compression of per-antenna beam lists (core/auto_rank.py).

The auto-rank path must (a) agree with the uncompressed per-antenna path to
its accuracy budget (eps / 8 beam residual), (b) stay exact for complex
beam tables and IQUV skies via the ordered channel list, (c) decline when
compression cannot win, and (d) never engage on fp64-class eps (the
reference's precision=2 contract). No reference counterpart: the reference
exposes rank compression only as the manual compute_beam_basis workflow
(ref cpu_simulate.py:303-470).
"""

import logging

import numpy as np
import pytest

from fftvis_tpu import TelescopeLocation, simulate_vis
from fftvis_tpu.beams import GaussianBeam, GriddedBeam
from fftvis_tpu.core.auto_rank import plan_auto_rank
from fftvis_tpu.geometry import hex_array

LOC = TelescopeLocation(np.deg2rad(-30.72), np.deg2rad(21.43), 1000.0)
JD0 = 2459863.2
FREQS = np.array([1.0e8, 1.05e8])
TIMES = JD0 + np.array([0.0, 1.0 / 60 / 24])


def _sky(n=120, seed=0, iquv=False):
    rng = np.random.default_rng(seed)
    ra = rng.uniform(0, 2 * np.pi, n)
    dec = rng.uniform(np.deg2rad(-60.0), np.deg2rad(0.0), n)
    if iquv:
        flux = np.zeros((n, FREQS.size, 4))
        flux[:, :, 0] = rng.uniform(0.5, 1.0, (n, FREQS.size))
        flux[:, :, 1] = rng.uniform(-0.2, 0.2, (n, FREQS.size))
        flux[:, :, 2] = rng.uniform(-0.2, 0.2, (n, FREQS.size))
        flux[:, :, 3] = rng.uniform(-0.1, 0.1, (n, FREQS.size))
    else:
        flux = rng.uniform(0.1, 1.0, (n, FREQS.size))
    return ra, dec, flux


def _beams(n=7, complex_phase=False):
    out = []
    for i in range(n):
        gb = GriddedBeam.from_function(
            GaussianBeam(diameter=14.0 + 0.02 * i), n_az=91, n_za=46,
            freqs=(1.0e8,),
        )
        if complex_phase:
            data = np.asarray(gb.data_array) * np.exp(1j * (0.05 + 0.03 * i))
            gb = GriddedBeam(
                data, gb.axis1_array, gb.axis2_array, gb.freq_array,
                beam_type="efield", feeds=gb.feeds,
            )
        out.append(gb)
    return out


def _kw(beams, iquv=False, seed=0, **extra):
    ants = hex_array(2, sep=14.6)  # 7 antennas
    keys = list(ants.keys())
    ra, dec, flux = _sky(seed=seed, iquv=iquv)
    kw = dict(
        ants=ants, fluxes=flux, ra=ra, dec=dec, freqs=FREQS, times=TIMES,
        beam=beams, telescope_loc=LOC, polarized=True, precision=2,
        eps=1e-6,
        # All pairs: the default redundant-representative baselines only
        # exercise ~10 of the 28 distinct beam pairs.
        baselines=[
            (keys[i], keys[j])
            for i in range(len(keys))
            for j in range(i, len(keys))
        ],
    )
    kw.update(extra)
    return kw


def _engaged(caplog):
    return [
        r for r in caplog.records
        if "auto-rank" in r.getMessage() and "compressed" in r.getMessage()
    ]


class TestEngineAutoRank:
    def test_matches_per_antenna_path(self, monkeypatch, caplog):
        caplog.set_level(logging.INFO)
        kw = _kw(_beams(7))
        v_auto = simulate_vis(**kw)
        assert _engaged(caplog), "auto-rank did not engage"
        monkeypatch.setenv("FFTVIS_AUTO_RANK", "0")
        v_ref = simulate_vis(**kw)
        rel = np.abs(v_auto - v_ref).max() / np.abs(v_ref).max()
        # eps/8 = 1.25e-7 beam residual -> ~2x that at visibility level.
        assert rel < 2e-6, f"auto-rank error {rel:.2e}"

    def test_complex_tables_iquv_sky_ordered_list(self, monkeypatch, caplog):
        caplog.set_level(logging.INFO)
        kw = _kw(_beams(7, complex_phase=True), iquv=True)
        v_auto = simulate_vis(**kw)
        assert _engaged(caplog)
        assert any(
            "ordered channel list" in r.getMessage() for r in caplog.records
        )
        monkeypatch.setenv("FFTVIS_AUTO_RANK", "0")
        v_ref = simulate_vis(**kw)
        rel = np.abs(v_auto - v_ref).max() / np.abs(v_ref).max()
        assert rel < 2e-6, f"auto-rank (ordered) error {rel:.2e}"

    def test_real_tables_unpol_sky_symmetric_list(self, caplog):
        caplog.set_level(logging.INFO)
        simulate_vis(**_kw(_beams(7)))
        assert any(
            "symmetric channel list" in r.getMessage() for r in caplog.records
        )

    def test_reversed_baselines(self, monkeypatch, caplog):
        caplog.set_level(logging.INFO)
        ants = hex_array(2, sep=14.6)
        keys = list(ants.keys())
        baselines = [
            (keys[i], keys[j])
            for i in range(len(keys))
            for j in range(i, len(keys))
        ] + [(keys[1], keys[0]), (keys[5], keys[2]), (keys[6], keys[3])]
        kw = _kw(_beams(7), baselines=baselines)
        v_auto = simulate_vis(**kw)
        assert _engaged(caplog)
        monkeypatch.setenv("FFTVIS_AUTO_RANK", "0")
        v_ref = simulate_vis(**kw)
        rel = np.abs(v_auto - v_ref).max() / np.abs(v_ref).max()
        assert rel < 2e-6

    def test_fp64_default_eps_never_engages(self, caplog):
        caplog.set_level(logging.INFO)
        kw = _kw(_beams(7))
        kw.pop("eps")  # precision=2 default eps = 1e-13 on the CPU backend
        simulate_vis(**kw)
        assert not _engaged(caplog)

    def test_env_kill_switch(self, monkeypatch, caplog):
        caplog.set_level(logging.INFO)
        monkeypatch.setenv("FFTVIS_AUTO_RANK", "0")
        simulate_vis(**_kw(_beams(7)))
        assert not _engaged(caplog)

    def test_full_rank_beams_decline(self, monkeypatch, caplog):
        caplog.set_level(logging.INFO)
        rng = np.random.default_rng(3)
        az = np.linspace(0, 2 * np.pi, 91, endpoint=False)
        za = np.linspace(0, np.pi, 46)
        beams = []
        for _ in range(7):
            data = rng.standard_normal((2, 2, 1, 46, 91)) + 1j * (
                rng.standard_normal((2, 2, 1, 46, 91))
            )
            beams.append(
                GriddedBeam(data, az, za, np.array([1.0e8]), "efield")
            )
        kw = _kw(beams)
        v_auto = simulate_vis(**kw)
        assert not _engaged(caplog)
        monkeypatch.setenv("FFTVIS_AUTO_RANK", "0")
        v_ref = simulate_vis(**kw)
        np.testing.assert_array_equal(v_auto, v_ref)


class TestPlanAutoRank:
    def _family(self, nbeam, rank, seed=0, nza=46, naz=91):
        """nbeam beams spanning an exact rank-``rank`` family."""
        rng = np.random.default_rng(seed)
        az = np.linspace(0, 2 * np.pi, naz, endpoint=False)
        za = np.linspace(0, np.pi, nza)
        basis = rng.standard_normal((rank, 2, 2, 1, nza, naz))
        mix = rng.uniform(0.5, 1.5, (nbeam, rank))
        return [
            GriddedBeam(
                np.tensordot(mix[b], basis, axes=1), az, za,
                np.array([1.0e8]), "efield",
            )
            for b in range(nbeam)
        ], az, za

    def test_exact_low_rank_family(self):
        beams, _, _ = self._family(8, 2)
        plan = plan_auto_rank(beams, tol=1e-9, npairs=36, allow_sym=True)
        assert plan is not None
        assert plan.K == 2
        assert plan.kl_sym
        assert plan.residual <= 1e-9
        assert len(plan.kl_pairs) == 3
        # Coefficients reconstruct each beam on the grid.
        rec = sum(
            plan.coefs[0, k] * np.asarray(plan.eigenbeams[k].data_array)
            for k in range(plan.K)
        )
        np.testing.assert_allclose(
            rec, np.asarray(beams[0].data_array), atol=1e-10
        )

    def test_declines_without_gain(self):
        beams, _, _ = self._family(4, 3)
        # K=3 -> 6 symmetric channels; npairs=10 gives gain < 2x.
        assert plan_auto_rank(beams, 1e-9, npairs=10, allow_sym=True) is None

    def test_declines_mixed_grids(self):
        beams, az, za = self._family(4, 2)
        other = GriddedBeam(
            np.asarray(beams[0].data_array)[..., ::2],
            az[::2], za, np.array([1.0e8]), "efield",
        )
        assert (
            plan_auto_rank(beams[:3] + [other], 1e-9, 100, True) is None
        )

    def test_declines_analytic(self):
        beams = [GaussianBeam(diameter=14.0 + i) for i in range(4)]
        assert plan_auto_rank(beams, 1e-9, 100, True) is None

    def test_complex_family_ordered(self):
        beams, _, _ = self._family(6, 2, seed=1)
        beams = [
            GriddedBeam(
                np.asarray(b.data_array) * np.exp(1j * 0.1 * i),
                b.axis1_array, b.axis2_array, b.freq_array, "efield",
            )
            for i, b in enumerate(beams)
        ]
        plan = plan_auto_rank(beams, 1e-9, npairs=21, allow_sym=True)
        assert plan is not None
        assert plan.K == 2
        assert not plan.kl_sym  # complex tables force the ordered list
        assert len(plan.kl_pairs) == 4

    def test_polarized_sky_forces_ordered(self):
        beams, _, _ = self._family(6, 2, seed=2)
        plan = plan_auto_rank(beams, 1e-9, npairs=21, allow_sym=False)
        assert plan is not None and not plan.kl_sym

    def test_mesh_sharded_matches_single_device(self, caplog):
        # The compression rewrites the beam list before program planning,
        # so it must compose with SPMD sharding transparently.
        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from fftvis_tpu.parallel.mesh import make_mesh

        caplog.set_level(logging.INFO)
        kw = _kw(_beams(7), seed=3)
        want = simulate_vis(**kw)
        assert _engaged(caplog)
        got = simulate_vis(mesh=make_mesh(time=2, source=4), **kw)
        scale = np.abs(want).max()
        np.testing.assert_allclose(got, want, atol=1e-11 * scale, rtol=0)

    def test_async_fetch_future_matches_sync(self, caplog):
        caplog.set_level(logging.INFO)
        kw = _kw(_beams(7), seed=4)
        want = simulate_vis(**kw)
        assert _engaged(caplog)
        fut = simulate_vis(async_fetch=True, **kw)
        np.testing.assert_allclose(fut.result(), want, rtol=0, atol=0)

    def test_decline_is_cached(self, monkeypatch):
        # A declined plan (full-rank family) must not redo the stack + SVD
        # on every simulate() call: the cache stores a sentinel for it.
        import fftvis_tpu.core.auto_rank as ar

        rng = np.random.default_rng(5)
        az = np.linspace(0, 2 * np.pi, 17)
        za = np.linspace(0, np.pi / 2, 9)
        beams = [
            GriddedBeam(
                rng.normal(size=(2, 2, 1, za.size, az.size)), az, za,
                np.array([1.0e8]), "efield",
            )
            for _ in range(4)
        ]
        calls = {"n": 0}
        real = ar._plan_uncached

        def counting(*a, **k):
            calls["n"] += 1
            return real(*a, **k)

        monkeypatch.setattr(ar, "_plan_uncached", counting)
        assert plan_auto_rank(beams, 1e-12, npairs=100, allow_sym=True) is None
        assert plan_auto_rank(beams, 1e-12, npairs=100, allow_sym=True) is None
        assert calls["n"] == 1


class TestFlippedBaselineConvention:
    """Auto-rank must reproduce the per-antenna path's flipped-baseline
    convention (conj without feed swap, ref cpu_simulate.py:298-300).

    On baselines the pair routing canonicalizes by flipping, that
    convention returns the feed TRANSPOSE of the plain basis result; for
    genuinely structured complex tables the two differ at the cross-pol
    phase level (5e-2 relative on the structured north-star row -- the
    round-4 regression this test pins). Scalar-phase or near-identical
    beam families cannot catch it: the transpose asymmetry scales with
    the in-Jones complex structure and the beam-to-beam differences."""

    def test_structured_complex_family_with_flips(self, monkeypatch, caplog):
        from fftvis_tpu.beams.synth import (
            perturbed_variants,
            structured_dipole_beam,
        )

        caplog.set_level(logging.INFO)
        rng = np.random.default_rng(3)
        nant = 12
        ants = {
            i: np.array([*rng.uniform(-60, 60, 2), 0.0]) for i in range(nant)
        }
        keys = list(ants.keys())
        base = structured_dipole_beam(n_az=90, n_za=46)
        # Exact rank-3 complex family: random complex mixes of three
        # structured variants -> auto-rank engages at K=3 (9 ordered
        # channels) with strongly complex coefficients AND in-Jones
        # complex structure.
        modes = perturbed_variants(base, 3)
        nbeams = 8
        beams = []
        for i in range(nbeams):
            c = rng.standard_normal(3) + 1j * rng.standard_normal(3)
            data = sum(
                c[k] * modes[k].data_array for k in range(3)
            ).astype(np.complex128)
            data = np.ascontiguousarray(data)
            data.setflags(write=False)
            beams.append(
                GriddedBeam(
                    data, base.axis1_array, base.axis2_array,
                    base.freq_array, beam_type="efield", feeds=base.feeds,
                )
            )
        # beam_idx wraps mod nbeams: many baselines have beam_i > beam_j,
        # so the pair routing flips them (the regression's trigger).
        beam_idx = (np.arange(nant) * 5) % nbeams
        ra, dec, flux = _sky(n=60, seed=9)
        kw = dict(
            ants=ants, fluxes=flux[:, :1], ra=ra, dec=dec,
            freqs=FREQS[:1], times=TIMES, beam=beams, beam_idx=beam_idx,
            telescope_loc=LOC, polarized=True, precision=2, eps=1e-6,
            baselines=[
                (keys[i], keys[j])
                for i in range(len(keys))
                for j in range(i, len(keys))
            ],
        )
        v_auto = simulate_vis(**kw)
        assert _engaged(caplog), "auto-rank did not engage"
        monkeypatch.setenv("FFTVIS_AUTO_RANK", "0")
        v_ref = simulate_vis(**kw)
        rel = np.abs(v_auto - v_ref).max() / np.abs(v_ref).max()
        assert rel < 2e-6, f"flipped-baseline convention error {rel:.2e}"
