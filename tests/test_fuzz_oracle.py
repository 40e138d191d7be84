"""Randomized-configuration oracle fuzz.

The parameter space (polarization x sky model x beam kinds x per-antenna
routing x array geometry x transform path x baseline subsets) has
interaction bugs the hand-written matrices miss (e.g. the multi-pair +
lowrank-z channel-slicing bug found in round 2). Each case draws a full
configuration from a seeded RNG and cross-validates the engine against
the exact fp64 direct-DFT oracle at the reference's 1e-5 tolerance
(ref tests/test_cpu_simulate.py:75-196 is the fixed-matrix ancestor).

Seeds are FIXED: failures are reproducible, and the drawn space grows
deliberately (add seeds, never reuse).
"""

import numpy as np
import pytest

from fftvis_tpu import TelescopeLocation, simulate_vis
from fftvis_tpu.beams import (
    AiryBeam,
    GaussianBeam,
    GriddedBeam,
    ShortDipoleBeam,
)

LOC = TelescopeLocation(np.deg2rad(-30.72), np.deg2rad(21.43), 1000.0)
JD0 = 2459863.2
FREQ_LO, FREQ_HI = 8.0e7, 1.8e8


def _draw_beam(rng, freqs, polarized):
    kind = rng.choice(["gauss", "airy", "dipole", "gridded"])
    if kind == "gauss":
        return GaussianBeam(diameter=float(rng.uniform(6, 16)))
    if kind == "airy":
        return AiryBeam(diameter=float(rng.uniform(6, 16)))
    if kind == "dipole" and polarized:
        return ShortDipoleBeam()
    if kind == "dipole":
        return GaussianBeam(diameter=float(rng.uniform(6, 16)))
    return GriddedBeam.from_function(
        GaussianBeam(diameter=float(rng.uniform(6, 16))),
        n_az=int(rng.integers(60, 120)),
        n_za=int(rng.integers(30, 60)),
        freqs=freqs,
        za_max=np.pi / 2,
    )


def _draw_case(seed):
    rng = np.random.default_rng(seed)
    nant = int(rng.integers(3, 8))
    tilted = bool(rng.integers(0, 2))
    span = float(rng.uniform(30, 300))
    ants = {
        i: np.array(
            [
                *rng.uniform(-span, span, 2),
                rng.uniform(-3, 3) if tilted else 0.0,
            ]
        )
        for i in range(nant)
    }
    nsrc = int(rng.integers(15, 80))
    ra = rng.uniform(0, 2 * np.pi, nsrc)
    dec = np.arcsin(rng.uniform(-1, 1, nsrc))  # full sphere: exercises cull
    nfreq = int(rng.integers(1, 4))
    ntime = int(rng.integers(1, 4))
    freqs = np.sort(rng.uniform(FREQ_LO, FREQ_HI, nfreq))
    times = JD0 + np.sort(rng.uniform(0, 0.03, ntime))
    polarized = bool(rng.integers(0, 2))
    polarized_sky = polarized and bool(rng.integers(0, 2))
    if polarized_sky:
        I = rng.uniform(0.5, 1.0, (nsrc, nfreq))
        frac = rng.uniform(-0.2, 0.2, (nsrc, nfreq, 3))
        flux = np.concatenate([I[..., None], I[..., None] * frac], axis=-1)
    else:
        flux = rng.uniform(0.1, 1.0, (nsrc, nfreq))

    kw = dict(
        ants=ants, fluxes=flux, ra=ra, dec=dec, freqs=freqs, times=times,
        telescope_loc=LOC, polarized=polarized, precision=2,
    )

    # Beam setup: shared, or per-antenna with routing.
    if rng.integers(0, 3) == 0:
        nbeam = int(rng.integers(2, min(nant, 4) + 1))
        kw["beam"] = [_draw_beam(rng, freqs, polarized) for _ in range(nbeam)]
        kw["beam_idx"] = rng.integers(0, nbeam, nant)
    else:
        kw["beam"] = _draw_beam(rng, freqs, polarized)

    # Baseline subset (sometimes shuffled), sometimes default redundant set.
    if rng.integers(0, 2):
        keys = list(ants.keys())
        all_bls = [
            (keys[i], keys[j])
            for i in range(nant)
            for j in range(i, nant)
        ]
        take = rng.permutation(len(all_bls))[
            : int(rng.integers(1, len(all_bls) + 1))
        ]
        kw["baselines"] = [all_bls[i] for i in take]

    if rng.integers(0, 2):
        kw["force_use_type3"] = True
    return kw


@pytest.mark.parametrize("seed", range(96))
def test_fuzz_vs_oracle(seed):
    kw = _draw_case(seed)
    got = simulate_vis(backend="tpu", **kw)
    want = simulate_vis(backend="direct", **{
        k: v for k, v in kw.items() if k != "force_use_type3"
    })
    assert got.shape == want.shape
    scale = max(np.abs(want).max(), 1e-12)
    np.testing.assert_allclose(got, want, atol=2e-5 * scale, rtol=0)


@pytest.mark.parametrize("seed", range(200, 212))
def test_fuzz_tiled_spreader_vs_oracle(seed, monkeypatch):
    """Same fuzz, but forcing the tile-binned spreader with the device-side
    capacity/occupancy checks armed: random configurations must neither
    drop sources (FFTVIS_DEBUG raises) nor lose accuracy through the
    balanced-occupancy class schedule."""
    monkeypatch.setenv("FFTVIS_SPREADER", "tiled")
    monkeypatch.setenv("FFTVIS_DEBUG", "1")
    kw = _draw_case(seed)
    kw["force_use_type3"] = True
    got = simulate_vis(backend="tpu", **kw)
    want = simulate_vis(backend="direct", **{
        k: v for k, v in kw.items() if k != "force_use_type3"
    })
    scale = max(np.abs(want).max(), 1e-12)
    np.testing.assert_allclose(got, want, atol=2e-5 * scale, rtol=0)
