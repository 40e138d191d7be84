"""Eigenbeam SVD basis tests (ref tests/test_beam_basis.py:79-396):
shape/rank/threshold behavior, and the basis visibility path agreeing with
the per-antenna path at a tiny threshold."""

import numpy as np
import pytest

from fftvis_tpu import TelescopeLocation, compute_beam_basis, simulate_vis
from fftvis_tpu.beams import GaussianBeam, GriddedBeam

LOC = TelescopeLocation(np.deg2rad(-30.72), np.deg2rad(21.43), 1000.0)
JD0 = 2459863.2
FREQ = 1.0e8


def _beams(n=3):
    return [
        GriddedBeam.from_function(
            GaussianBeam(diameter=6.0 + 2.0 * i), n_az=90, n_za=91, freqs=(FREQ,)
        )
        for i in range(n)
    ]


class TestComputeBeamBasis:
    def test_shapes_and_rank(self):
        beams = _beams(3)
        eig, coefs = compute_beam_basis(beams, FREQ, polarized=True)
        assert coefs.shape[0] == 3
        assert coefs.shape[1] == len(eig)
        assert len(eig) <= 3

    def test_reconstruction(self):
        beams = _beams(3)
        eig, coefs = compute_beam_basis(beams, FREQ, polarized=True, threshold=1e-12)
        # Reconstruct beam 0 from the basis on the common grid.
        rec = sum(
            coefs[0, k] * eig[k].data_array[:, :, 0] for k in range(len(eig))
        )
        want = None
        # Interpolate original onto the eigenbeam grid for comparison.
        gb = beams[0]
        assert np.allclose(gb.axis1_array, eig[0].axis1_array)
        want = gb.data_array[:, :, 0]
        np.testing.assert_allclose(rec, want, atol=1e-10)

    def test_threshold_monotonicity(self):
        beams = _beams(4)
        k_small = len(compute_beam_basis(beams, FREQ, True, threshold=1e-12)[0])
        k_big = len(compute_beam_basis(beams, FREQ, True, threshold=1e-2)[0])
        assert k_big <= k_small

    def test_validation(self):
        with pytest.raises(ValueError, match="at least one"):
            compute_beam_basis([], FREQ, True)
        with pytest.raises(ValueError, match="threshold"):
            compute_beam_basis(_beams(1), FREQ, True, threshold=0.0)
        with pytest.raises(ValueError, match="scalar freq"):
            compute_beam_basis(_beams(1), np.array([1e8, 2e8]), True)
        with pytest.raises(ValueError, match="supplied together"):
            compute_beam_basis(_beams(1), FREQ, True, axis1_array=np.arange(3.0))

    def test_identical_beams_rank_one(self):
        beams = [_beams(1)[0]] * 3
        eig, coefs = compute_beam_basis(beams, FREQ, True, threshold=1e-8)
        assert len(eig) == 1


class TestBasisVisibilities:
    def test_basis_path_matches_per_antenna(self):
        """K-eigenbeam contraction == explicit per-antenna beams
        (ref tests/test_beam_basis.py:310-396, atol 1e-5)."""
        rng = np.random.default_rng(0)
        nant = 4
        ants = {i: np.array([*rng.uniform(-40, 40, 2), 0.0]) for i in range(nant)}
        nsrc = 25
        ra = rng.uniform(0, 2 * np.pi, nsrc)
        dec = np.clip(LOC.lat + rng.normal(0, 0.3, nsrc), -np.pi / 2, np.pi / 2)
        flux = rng.uniform(0.2, 1.0, (nsrc, 1))
        times = JD0 + np.linspace(0, 0.01, 2)

        ant_beams = _beams(nant)
        eig, coefs = compute_beam_basis(ant_beams, FREQ, polarized=True, threshold=1e-12)
        beam_coefs = coefs[:, :, None]  # (nant, K, nfreq=1)

        common = dict(
            ants=ants, fluxes=flux, ra=ra, dec=dec, freqs=np.array([FREQ]),
            times=times, telescope_loc=LOC, polarized=True, precision=2,
            force_use_type3=True,
        )
        want = simulate_vis(
            beam=ant_beams, beam_idx=np.arange(nant), backend="tpu", **common
        )
        got = simulate_vis(beam=eig, beam_coefs=beam_coefs, backend="tpu", **common)
        oracle = simulate_vis(beam=eig, beam_coefs=beam_coefs, backend="direct", **common)

        scale = np.abs(want).max()
        np.testing.assert_allclose(got, want, atol=2e-5 * scale, rtol=0)
        np.testing.assert_allclose(got, oracle, atol=1e-5 * scale, rtol=0)

    def test_unpolarized_with_coefs_rejected(self):
        """Error message parity with ref wrapper.py:280-283."""
        with pytest.raises(ValueError, match="not compatible with unpolarized"):
            simulate_vis(
                ants={0: np.zeros(3), 1: np.array([10.0, 0, 0])},
                fluxes=np.ones((3, 1)),
                ra=np.zeros(3),
                dec=np.zeros(3),
                freqs=np.array([FREQ]),
                times=JD0 + np.zeros(1),
                beam=_beams(2),
                telescope_loc=LOC,
                polarized=False,
                beam_coefs=np.ones((2, 2, 1)),
            )
