"""Structured (CST-class) E-field beam through the full pipeline.

The reference's realistic beam asset is a CST HERA dipole E-field file
(ref tests/test_wrapper.py:61-78; LFS blob absent here). The committed
``tests/data/structured_dipole_100MHz.beamfits`` plays that role: an
Airy-lobed crossed-dipole beam with sidelobes, deep nulls, complex
cross-pol and az ripple (fftvis_tpu/beams/synth.py), written by the
in-repo beamfits writer. These tests keep the file-loaded table in the
scored configuration's path: cubic interpolation over structure, the
az seam, per-antenna perturbed variants, and the unpolarized
sqrt-power clamp at interpolation overshoot near nulls
(core/coherency.py:111-113).
"""

import os

import numpy as np
import pytest

from fftvis_tpu import TelescopeLocation, simulate_vis
from fftvis_tpu.beams.interface import BeamInterface, prepare_beam_unpolarized
from fftvis_tpu.beams.io import read_beamfits
from fftvis_tpu.beams.synth import (
    perturbed_variants,
    structured_dipole_beam,
)
from fftvis_tpu.reference.direct_engine import DirectSimulationEngine

ASSET = os.path.join(
    os.path.dirname(__file__), "data", "structured_dipole_100MHz.beamfits"
)
LOC = TelescopeLocation(np.deg2rad(-30.72), np.deg2rad(21.43), 1000.0)
JD0 = 2459863.2


@pytest.fixture(scope="module")
def asset_beam():
    return read_beamfits(ASSET)


def test_asset_matches_generator(asset_beam):
    """The committed beamfits equals synth variant 0 (regeneration is
    reproducible) and carries the expected structure."""
    ref = structured_dipole_beam()
    assert asset_beam.beam_type == "efield"
    assert asset_beam.feeds == ["x", "y"]
    assert asset_beam.data_array.shape == (2, 2, 1, 91, 360)
    np.testing.assert_allclose(
        asset_beam.data_array, ref.data_array, rtol=0, atol=1e-7
    )
    # Structure: the za power profile at az=0 must be non-monotonic with
    # deep nulls (>= 25 dB below the main lobe) and recovering sidelobes.
    prof = np.abs(asset_beam.data_array[0, 0, 0, :, 0]) ** 2
    main = prof.max()
    imin = int(np.argmin(prof[:30]))  # first null inside 30 deg
    assert prof[imin] < main * 10 ** (-25 / 10)
    assert prof[imin + 5 :].max() > prof[imin] * 10  # sidelobe recovers
    # Nonzero cross-pol: E_za of feed x at az=45 deg is not negligible.
    co = np.abs(asset_beam.data_array[0, 0, 0, 20, 0])
    cross = np.abs(asset_beam.data_array[1, 0, 0, 20, 45])
    assert cross > 1e-3 * co


def test_perturbed_variants_are_distinct(asset_beam):
    beams = perturbed_variants(asset_beam, 4)
    assert beams[0] is asset_beam
    for i in range(1, 4):
        d = np.abs(beams[i].data_array - asset_beam.data_array).max()
        assert 1e-5 < d < 0.1 * np.abs(asset_beam.data_array).max()
    assert (
        np.abs(beams[1].data_array - beams[2].data_array).max() > 1e-5
    )


def _sky(rng, nsrc):
    ra = rng.uniform(0, 2 * np.pi, nsrc)
    dec = np.clip(
        LOC.lat + rng.normal(0, 0.5, nsrc), -np.pi / 2, np.pi / 2
    )
    return ra, dec


@pytest.mark.parametrize("order", [1, 3])
def test_engine_vs_oracle_polarized_structured(asset_beam, order):
    """Per-antenna perturbed structured beams, polarized, cubic and
    linear interpolation, vs the fp64 direct-DFT oracle at the
    reference's 1e-5 contract (ref tests/test_cpu_simulate.py:194-196)."""
    rng = np.random.default_rng(11)
    nant, nsrc = 6, 48
    ants = {i: np.array([*rng.uniform(-60, 60, 2), 0.0]) for i in range(nant)}
    ra, dec = _sky(rng, nsrc)
    beams = perturbed_variants(asset_beam, 3)
    beam_idx = np.arange(nant) % 3
    kw = dict(
        ants=ants,
        fluxes=rng.uniform(0.1, 1.0, (nsrc, 1)),
        ra=ra,
        dec=dec,
        freqs=np.array([1.0e8]),
        times=JD0 + np.linspace(0, 0.01, 2),
        telescope_loc=LOC,
        beam_idx=beam_idx,
        polarized=True,
        precision=2,
        beam_spline_opts={"order": order},
    )
    got = simulate_vis(beam=beams, backend="tpu", **kw)
    want = DirectSimulationEngine().simulate(
        beam_list=[BeamInterface(b) for b in beams],
        beam_spline_opts={"order": order},
        **{k: v for k, v in kw.items() if k != "beam_spline_opts"},
    )
    scale = np.abs(want).max()
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5 * scale)


def test_unpolarized_sqrt_clamp_on_nulls(asset_beam):
    """Unpolarized sim with the structured power beam: cubic
    interpolation overshoots below zero near the deep nulls, and the
    sqrt(max(B_i B_j, 0)) clamp (core/coherency.py:111-113) must keep
    the output finite AND matching the identically-clamped oracle.
    Sources are planted near the first null ring to guarantee the
    clamp is exercised."""
    rng = np.random.default_rng(5)
    nant = 5
    ants = {i: np.array([*rng.uniform(-50, 50, 2), 0.0]) for i in range(nant)}
    # Sources in a band of zenith angles straddling the first null
    # (za ~ 15.1 deg for 14 m at 100 MHz) as seen from the site: pick
    # declinations near the zenith circle offset by ~15 deg.
    nsrc = 64
    ra = rng.uniform(0, 2 * np.pi, nsrc)
    dec = np.clip(
        LOC.lat + np.deg2rad(rng.uniform(13.0, 17.0, nsrc))
        * rng.choice([-1, 1], nsrc),
        -np.pi / 2,
        np.pi / 2,
    )
    kw = dict(
        ants=ants,
        fluxes=rng.uniform(0.1, 1.0, (nsrc, 1)),
        ra=ra,
        dec=dec,
        freqs=np.array([1.0e8]),
        times=JD0 + np.array([0.0]),
        telescope_loc=LOC,
        polarized=False,
        precision=2,
        beam_spline_opts={"order": 3},
    )
    got = simulate_vis(beam=asset_beam, backend="tpu", **kw)
    assert np.all(np.isfinite(got)), "sqrt clamp failed: NaNs in output"
    want = DirectSimulationEngine().simulate(
        beam_list=[prepare_beam_unpolarized(BeamInterface(asset_beam))],
        beam_spline_opts={"order": 3},
        **{k: v for k, v in kw.items() if k != "beam_spline_opts"},
    )
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5 * scale)
