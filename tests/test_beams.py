"""Beam evaluation tests (reference test pattern 3: kernels vs independent
references; ref tests/test_cpu_beams.py, test_beam_evaluator.py)."""

import numpy as np
import pytest
from scipy import ndimage, special

import jax.numpy as jnp

from fftvis_tpu.beams import (
    AiryBeam,
    BeamInterface,
    GaussianBeam,
    GriddedBeam,
    ShortDipoleBeam,
    UniformBeam,
    bessel_j1,
    map_coordinates_2d,
    prepare_beam,
    prepare_beam_unpolarized,
)


def test_bessel_j1_vs_scipy():
    x = np.linspace(-40, 40, 4001)
    got = np.asarray(bessel_j1(jnp.asarray(x)))
    want = special.j1(x)
    assert np.abs(got - want).max() < 5e-7


class TestAnalytic:
    def test_gaussian_peak_and_width(self):
        b = GaussianBeam(diameter=14.0)
        f = 150e6
        za = jnp.asarray([0.0, 0.01, 0.1])
        amp = np.asarray(b.amplitude(za, f))
        assert amp[0] == pytest.approx(1.0)
        assert np.all(np.diff(amp) < 0)
        # Power is amplitude squared through the efield convention.
        p = np.asarray(b.power(jnp.zeros(3), za, f))
        np.testing.assert_allclose(p, amp**2, rtol=1e-12)

    def test_gaussian_validation(self):
        with pytest.raises(ValueError, match="exactly one"):
            GaussianBeam()
        with pytest.raises(ValueError, match="exactly one"):
            GaussianBeam(diameter=10, sigma=0.1)
        with pytest.raises(ValueError, match="reference_frequency"):
            GaussianBeam(sigma=0.1, spectral_index=-1.0)

    def test_airy_nulls(self):
        b = AiryBeam(diameter=14.0)
        f = 150e6
        # First Airy null: x = 3.8317 -> sin(za) = 3.8317 c / (pi d f)
        sinz = 3.8317059 * 299792458.0 / (np.pi * 14.0 * f)
        za = np.arcsin(sinz)
        amp = np.asarray(b.amplitude(jnp.asarray([0.0, za]), f))
        assert amp[0] == pytest.approx(1.0, abs=1e-8)
        assert abs(amp[1]) < 1e-6

    def test_efield_convention(self):
        b = UniformBeam()
        e = np.asarray(b.efield(jnp.zeros(4), jnp.zeros(4), 1e8))
        assert e.shape == (2, 2, 4)
        np.testing.assert_allclose(e, 1 / np.sqrt(2), atol=1e-12)

    def test_short_dipole_polarization(self):
        b = ShortDipoleBeam()
        # East direction (uvbeam az=0), on horizon: x (EW) dipole sees the
        # az component at -sin(0)=0, za comp cos(za)=0 -> zero response.
        e = np.asarray(b.efield(jnp.asarray([0.0]), jnp.asarray([np.pi / 2]), 1e8))
        assert abs(e[0, 0, 0]) < 1e-12 and abs(e[1, 0, 0]) < 1e-12
        # y dipole at the same point responds fully in the az component.
        assert abs(e[0, 1, 0]) == pytest.approx(1.0)


class TestGridded:
    DIAM = 4.0  # wide beam (sigma ~ 0.3 rad) so coarse-grid interp converges

    def _beam(self, n_az=72, n_za=181, freqs=(100e6, 200e6)):
        return GriddedBeam.from_function(
            GaussianBeam(diameter=self.DIAM), n_az=n_az, n_za=n_za, freqs=freqs
        )

    def test_from_function_matches_analytic(self):
        gb = self._beam()
        prepared = prepare_beam(gb, freqs=np.array([150e6]), polarized=True)
        rng = np.random.default_rng(0)
        az = rng.uniform(0, 2 * np.pi, 40)
        za = rng.uniform(0, np.pi / 2, 40)
        got = np.asarray(prepared.evaluate(jnp.asarray(az), jnp.asarray(za), 150e6, 0))
        # Freq-interp of a Gaussian beam between 100/200 MHz is not the
        # 150 MHz beam exactly; compare against the same interp on host.
        b = GaussianBeam(diameter=self.DIAM)
        a100 = np.asarray(b.amplitude(jnp.asarray(za), 100e6))
        a200 = np.asarray(b.amplitude(jnp.asarray(za), 200e6))
        want = (a100 + a200) / 2 / np.sqrt(2)
        # Bilinear interp on a 1-degree za grid: O(dza^2 / sigma^2) ~ 4e-4.
        np.testing.assert_allclose(got[0, 0], want, atol=5e-4)

    def test_power_beam(self):
        gb = self._beam(freqs=(150e6,))
        pb = gb.as_power_beam()
        assert pb.beam_type == "power"
        prepared = prepare_beam(pb, freqs=np.array([150e6]), polarized=False)
        za = jnp.asarray([0.0, 0.2])
        got = np.asarray(prepared.evaluate(jnp.zeros(2), za, 150e6, 0))
        want = np.asarray(GaussianBeam(diameter=self.DIAM).power(jnp.zeros(2), za, 150e6))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_freq_interp_bounds(self):
        gb = self._beam()
        with pytest.raises(ValueError, match="outside"):
            gb.interp_freq([50e6])

    def test_cubic_matches_scipy_mirror(self):
        gb = self._beam(freqs=(150e6,))
        rng = np.random.default_rng(1)
        az = rng.uniform(0.1, 2 * np.pi - 0.1, 50)
        za = rng.uniform(0.05, np.pi - 0.05, 50)
        prepared = prepare_beam(
            gb, freqs=np.array([150e6]), polarized=True, spline_opts={"order": 3}
        )
        got = np.asarray(prepared.evaluate(jnp.asarray(az), jnp.asarray(za), 150e6, 0))
        daz = gb.axis1_array[1] - gb.axis1_array[0]
        dza = gb.axis2_array[1] - gb.axis2_array[0]
        want = ndimage.map_coordinates(
            gb.data_array[0, 0, 0].real,
            [za / dza, az / daz],
            order=3,
            mode="mirror",
        )
        # Note: the az axis wraps in our implementation; stay off the seam.
        np.testing.assert_allclose(got[0, 0].real, want, atol=1e-8)

    def test_validation(self):
        with pytest.raises(ValueError, match="5-dimensional"):
            GriddedBeam(np.zeros((2, 2, 3, 4)), [0], [0], [1e8])
        with pytest.raises(ValueError, match="uniformly spaced"):
            GriddedBeam(
                np.zeros((2, 2, 1, 3, 3)),
                [0.0, 0.1, 0.5],
                [0.0, 0.1, 0.2],
                [1e8],
            )


class TestInterface:
    def test_wrap_beam_interface(self):
        bi = BeamInterface(GaussianBeam(diameter=10.0))
        assert bi.beam_type == "efield"
        assert not bi._isuvbeam
        bi2 = BeamInterface(bi)
        assert bi2.beam is bi.beam

    def test_prepare_unpolarized(self):
        bi = prepare_beam_unpolarized(GaussianBeam(diameter=10.0))
        assert bi.beam_type == "power"
        prepared = prepare_beam(bi, freqs=np.array([1e8]), polarized=False)
        za = jnp.asarray([0.0, 0.3])
        got = np.asarray(prepared.evaluate(jnp.zeros(2), za, 1e8, 0))
        want = np.asarray(GaussianBeam(diameter=10.0).power(jnp.zeros(2), za, 1e8))
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_polarized_power_rejected(self):
        bi = prepare_beam_unpolarized(GaussianBeam(diameter=10.0))
        with pytest.raises(ValueError, match="polarized"):
            prepare_beam(bi, freqs=np.array([1e8]), polarized=True)

    def test_compute_response_layout(self):
        bi = BeamInterface(GaussianBeam(diameter=10.0))
        az = np.zeros(5)
        za = np.linspace(0, 0.5, 5)
        resp = bi.compute_response(az, za, np.array([1e8, 2e8]))
        assert resp.shape == (2, 2, 2, 5)

    def test_duck_typed_uvbeam(self):
        gb = GriddedBeam.from_function(UniformBeam(), n_az=8, n_za=5, freqs=(1e8,))

        class FakeUVBeam:
            data_array = gb.data_array
            axis1_array = gb.axis1_array
            axis2_array = gb.axis2_array
            freq_array = gb.freq_array
            beam_type = "efield"
            pixel_coordinate_system = "az_za"

        bi = BeamInterface(FakeUVBeam())
        assert bi._isuvbeam
        assert bi.beam.Nfreqs == 1


def test_interp_function_names_agree_order1():
    """'az_za_simple' and 'az_za_map_coordinates' agree at order 1
    (reference contract: tests/test_cpu_beams.py:15-87)."""
    gb = GriddedBeam.from_function(
        GaussianBeam(diameter=6.0), n_az=90, n_za=91, freqs=(1e8,)
    )
    rng = np.random.default_rng(3)
    az = rng.uniform(0, 2 * np.pi, 30)
    za = rng.uniform(0, np.pi * 0.9, 30)
    a = prepare_beam(
        gb, freqs=np.array([1e8]), polarized=True,
        interpolation_function="az_za_map_coordinates", spline_opts={"order": 1},
    ).evaluate(jnp.asarray(az), jnp.asarray(za), 1e8, 0)
    b = prepare_beam(
        gb, freqs=np.array([1e8]), polarized=True,
        interpolation_function="az_za_simple", spline_opts={"order": 1},
    ).evaluate(jnp.asarray(az), jnp.asarray(za), 1e8, 0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-14)


def test_bad_interp_function_rejected():
    gb = GriddedBeam.from_function(UniformBeam(), n_az=8, n_za=5, freqs=(1e8,))
    with pytest.raises(ValueError, match="interpolation_function"):
        prepare_beam(
            gb, freqs=np.array([1e8]), polarized=True,
            interpolation_function="nearest",
        )


class MockUVBeam:
    """A pyuvdata-UVBeam-faithful mock (attribute semantics, not methods).

    Mirrors what /root/reference/tests/test_wrapper.py:61-78 exercises by
    loading a CST beam file: an efield beam with data_array
    (Naxes_vec, Nfeeds, Nfreqs, Nza, Naz), axis1/axis2/freq arrays, a
    feed_array, and pixel_coordinate_system='az_za'.
    """

    pixel_coordinate_system = "az_za"
    beam_type = "efield"

    def __init__(self, nfreq=3, legacy_6d=False, feeds=("e", "n"), freq_2d=False):
        from fftvis_tpu.beams import ShortDipoleBeam
        from fftvis_tpu.beams.gridded import GriddedBeam

        freqs = np.linspace(1.0e8, 1.3e8, nfreq)
        gb = GriddedBeam.from_function(
            ShortDipoleBeam(), n_az=180, n_za=91, freqs=freqs, za_max=np.pi / 2
        )
        data = gb.data_array
        # Frequency structure so interp_freq actually matters.
        data = data * (freqs / freqs[0])[None, None, :, None, None] ** -0.5
        if feeds in (("n", "e"), ("y", "x")):
            data = data[:, ::-1]
        if legacy_6d:
            data = data[:, None]  # (Naxes_vec, Nspws=1, Nfeeds, ...)
        self.data_array = data
        self.axis1_array = gb.axis1_array
        self.axis2_array = gb.axis2_array
        self.freq_array = freqs[None, :] if freq_2d else freqs
        self.feed_array = np.array(feeds)
        self.Nfreqs = nfreq


@pytest.mark.parametrize(
    "legacy_6d,feeds,freq_2d",
    [(False, ("e", "n"), False), (True, ("n", "e"), True), (False, ("x", "y"), False)],
)
def test_from_uvbeam_layouts(legacy_6d, feeds, freq_2d):
    """from_uvbeam handles modern/legacy layouts and feed orderings."""
    from fftvis_tpu.beams import ShortDipoleBeam
    from fftvis_tpu.beams.gridded import GriddedBeam

    uvb = MockUVBeam(legacy_6d=legacy_6d, feeds=feeds, freq_2d=freq_2d)
    gb = GriddedBeam.from_uvbeam(uvb)
    assert gb.data_array.ndim == 5
    assert gb.freq_array.shape == (3,)
    # Feed 0 must be the x/east dipole regardless of the source ordering.
    ref = GriddedBeam.from_uvbeam(MockUVBeam())
    np.testing.assert_allclose(gb.data_array, ref.data_array, rtol=0, atol=0)


def test_from_uvbeam_rejects_bad_inputs():
    uvb = MockUVBeam()
    uvb.pixel_coordinate_system = "healpix"
    from fftvis_tpu.beams.gridded import GriddedBeam

    with pytest.raises(ValueError, match="az_za"):
        GriddedBeam.from_uvbeam(uvb)
    uvb2 = MockUVBeam()
    uvb2.feed_array = np.array(["r", "l"])
    with pytest.raises(ValueError, match="feed ordering"):
        GriddedBeam.from_uvbeam(uvb2)


def test_uvbeam_simulation_vs_oracle():
    """End-to-end simulate with an adapted UVBeam == direct oracle.

    The fftvis counterpart of loading a CST UVBeam and simulating
    (ref tests/test_wrapper.py:61-100): same adapted beam through the TPU
    engine and the exact direct engine, polarized, with frequency
    interpolation exercised (sim freqs between the beam's tabulated ones).
    """
    from fftvis_tpu import TelescopeLocation, simulate_vis
    from fftvis_tpu.beams.gridded import GriddedBeam

    uvb = MockUVBeam(legacy_6d=True, feeds=("n", "e"), freq_2d=True)
    beam = GriddedBeam.from_uvbeam(uvb)
    rng = np.random.default_rng(5)
    loc = TelescopeLocation(np.deg2rad(-30.7), np.deg2rad(21.4), 1000.0)
    nsrc = 40
    kw = dict(
        ants={i: np.array([*rng.uniform(-50, 50, 2), 0.0]) for i in range(4)},
        fluxes=rng.uniform(0.1, 1, (nsrc, 2)),
        ra=rng.uniform(0, 2 * np.pi, nsrc),
        dec=np.clip(loc.lat + rng.normal(0, 0.4, nsrc), -np.pi / 2, np.pi / 2),
        freqs=np.array([1.05e8, 1.25e8]),  # between beam grid freqs
        times=2459863.2 + np.linspace(0, 0.01, 2),
        beam=beam,
        telescope_loc=loc,
        polarized=True,
        precision=2,
        beam_spline_opts={"kx": 3, "ky": 3},  # pyuvdata spelling
        interpolation_function="az_za_simple",
    )
    got = simulate_vis(**kw)
    want = simulate_vis(backend="direct", **kw)
    np.testing.assert_allclose(got, want, atol=2e-5 * np.abs(want).max(), rtol=0)


def test_spline_opts_validation():
    from fftvis_tpu.beams import GaussianBeam
    from fftvis_tpu.beams.gridded import GriddedBeam
    from fftvis_tpu.beams.interface import prepare_beam

    gb = GriddedBeam.from_function(GaussianBeam(diameter=12.0), freqs=(1e8,))
    with pytest.raises(ValueError, match="anisotropic"):
        prepare_beam(gb, freqs=np.array([1e8]), polarized=True,
                     spline_opts={"kx": 1, "ky": 3})
    with pytest.raises(ValueError, match="order must be"):
        prepare_beam(gb, freqs=np.array([1e8]), polarized=True,
                     spline_opts={"order": 2})


def test_short_za_grid_raises(caplog, monkeypatch):
    """A beam grid ending short of the horizon raises at prepare time
    (check_azza_domain equivalent; ref cpu/beams.py:62-74), and clamps
    with a warning only under the explicit opt-in env flag."""
    import logging

    from fftvis_tpu.beams import GaussianBeam
    from fftvis_tpu.beams.gridded import GriddedBeam
    from fftvis_tpu.beams.interface import _PREPARED_CACHE, prepare_beam

    gb = GriddedBeam.from_function(
        GaussianBeam(diameter=12.0), n_za=46, za_max=np.pi / 4, freqs=(1e8,)
    )
    _PREPARED_CACHE.clear()
    with pytest.raises(ValueError, match="za grid ends"):
        prepare_beam(gb, freqs=np.array([1e8]), polarized=True)

    monkeypatch.setenv("FFTVIS_ALLOW_BEAM_CLAMP", "1")
    _PREPARED_CACHE.clear()
    with caplog.at_level(logging.WARNING, logger="fftvis_tpu.beams.interface"):
        prepare_beam(gb, freqs=np.array([1e8]), polarized=True)
    assert any("za grid ends" in r.message for r in caplog.records)


def test_az_za_simple_vs_rect_bivariate_spline_bound():
    """Bound the 'az_za_simple' backend deviation (VERDICT round-2 item 8).

    The reference's az_za_simple is pyuvdata's RectBivariateSpline
    (kx=ky=3, not-a-knot boundaries); this package maps the name onto
    order-3 prefiltered map_coordinates (mirror boundaries). Both
    reproduce a smooth beam to O(h^4); their mutual deviation on a
    realistic beam grid is bounded here at 1e-4 of the beam peak for
    interior points (boundary rows excluded -- the two spline end
    conditions legitimately differ there, decaying inward).
    """
    import jax.numpy as jnp
    from scipy.interpolate import RectBivariateSpline

    from fftvis_tpu.beams import GaussianBeam
    from fftvis_tpu.beams.interp import map_coordinates_2d, spline_prefilter_2d

    n_za, n_az = 91, 181
    za = np.linspace(0, np.pi / 2, n_za)
    az = np.linspace(0, 2 * np.pi, n_az, endpoint=False)
    azg, zag = np.meshgrid(az, za)
    beam = GaussianBeam(diameter=14.0)
    table = np.asarray(beam.power(azg.ravel(), zag.ravel(), 1e8)).reshape(
        n_za, n_az
    )

    rng = np.random.default_rng(0)
    npts = 4000
    # Interior points: one cell away from the za edges.
    za_q = rng.uniform(za[1], za[-2], npts)
    az_q = rng.uniform(az[0], az[-1], npts)

    spl = RectBivariateSpline(za, az, table, kx=3, ky=3, s=0)
    want = spl(za_q, az_q, grid=False)

    pre = np.asarray(spline_prefilter_2d(jnp.asarray(table[None])))
    yy = za_q / (za[1] - za[0])
    xx = az_q / (az[1] - az[0])
    got = np.asarray(
        map_coordinates_2d(
            jnp.asarray(pre), jnp.asarray(yy), jnp.asarray(xx),
            order=3, wrap_x=True, prefiltered=True,
        )
    )[0]

    peak = np.abs(table).max()
    dev = np.abs(got - want).max() / peak
    assert dev < 1e-4, f"az_za_simple deviation {dev:.2e} exceeds 1e-4"
    # And both must track the analytic truth at the same level.
    truth = np.asarray(beam.power(az_q, za_q, 1e8))
    assert np.abs(got - truth).max() / peak < 2e-4


class TestPlanBeamPairs:
    """Beam-pair routing/flip bookkeeping, mirroring the reference's
    11-case prepare_beam_evaluation suite (ref tests/test_cpu_beams.py:
    708-854). Our plan keeps only pairs that own at least one baseline
    (empty pairs contribute nothing to the sum)."""

    @staticmethod
    def _plan(antnums, baselines, beam_idx):
        from fftvis_tpu.core.beams import plan_beam_pairs

        return plan_beam_pairs(
            antnums, baselines, None if beam_idx is None else np.asarray(beam_idx)
        )

    def test_none_beam_idx_returns_single_pair(self):
        plan = self._plan([0, 1, 2], [(0, 1), (1, 2), (0, 2)], None)
        assert plan.pairs == ((0, 0),)

    def test_none_beam_idx_maps_all_baselines(self):
        plan = self._plan([0, 1, 2], [(0, 1), (1, 2), (0, 2)], None)
        np.testing.assert_array_equal(plan.bls_idxs[0], np.arange(3))

    def test_none_beam_idx_no_flipped(self):
        plan = self._plan([0, 1, 2], [(0, 1), (1, 2), (0, 2)], None)
        assert not plan.flipped[0].any()

    def test_single_beam_type(self):
        plan = self._plan([0, 1, 2], [(0, 1), (1, 2), (0, 2)], [0, 0, 0])
        assert plan.pairs == ((0, 0),)
        assert list(plan.bls_idxs[0]) == [0, 1, 2]
        assert not plan.flipped[0].any()

    def test_two_beam_types_unique_pairs(self):
        plan = self._plan([0, 1], [(0, 1)], [0, 1])
        assert set(plan.pairs) == {(0, 1)}  # only occupied pairs kept

    def test_two_beam_types_baseline_routing(self):
        plan = self._plan([0, 1], [(0, 1)], [0, 1])
        p = plan.pairs.index((0, 1))
        assert list(plan.bls_idxs[p]) == [0]
        assert list(plan.flipped[p]) == [False]

    def test_flipped_baseline_detected(self):
        plan = self._plan([0, 1], [(1, 0)], [0, 1])
        p = plan.pairs.index((0, 1))
        assert list(plan.bls_idxs[p]) == [0]
        assert list(plan.flipped[p]) == [True]

    def test_mixed_flipped_and_not_flipped(self):
        plan = self._plan([0, 1], [(0, 1), (1, 0)], [0, 1])
        p = plan.pairs.index((0, 1))
        assert list(plan.bls_idxs[p]) == [0, 1]
        assert list(plan.flipped[p]) == [False, True]

    def test_multiple_baselines_same_pair(self):
        plan = self._plan(
            [0, 1, 2, 3], [(0, 2), (0, 3), (1, 2), (1, 3)], [0, 0, 1, 1]
        )
        p = plan.pairs.index((0, 1))
        assert sorted(plan.bls_idxs[p]) == [0, 1, 2, 3]
        assert not plan.flipped[p].any()

    def test_empty_baselines(self):
        plan = self._plan([0, 1], [], [0, 1])
        assert plan.pairs == ()

    def test_three_beam_types_pair_coverage(self):
        plan = self._plan([0, 1, 2], [(0, 1), (0, 2), (1, 2)], [0, 1, 2])
        assert set(plan.pairs) == {(0, 1), (0, 2), (1, 2)}

    def test_non_contiguous_beam_idx(self):
        """Non-contiguous beam indices (e.g. [0, 2, 2]) must route correctly
        (the reference had a ValueError bug here; ref test_cpu_beams.py:
        831-854)."""
        plan = self._plan([0, 1, 2], [(0, 1), (0, 2), (1, 2)], [0, 2, 2])
        assert set(plan.pairs) == {(0, 2), (2, 2)}
        p02 = plan.pairs.index((0, 2))
        assert sorted(plan.bls_idxs[p02]) == [0, 1]
        assert not plan.flipped[p02].any()
        p22 = plan.pairs.index((2, 2))
        assert list(plan.bls_idxs[p22]) == [2]

    def test_nonint_antenna_names(self):
        """Antenna keys need not be integers (dict keys are arbitrary)."""
        plan = self._plan(["a", "b"], [("a", "b")], [1, 0])
        p = plan.pairs.index((0, 1))
        # ("a","b") maps to beams (1, 0) -> stored as (0, 1) flipped.
        assert list(plan.flipped[p]) == [True]


def test_from_uvbeam_rejects_yfirst_4pol_power():
    """A y-first power UVBeam with 4 pol products cannot be fixed by
    reversing the pol axis (that would map 'x' onto a cross product)."""
    uvb = MockUVBeam(nfreq=2, feeds=("n", "e"))
    power = (np.abs(uvb.data_array) ** 2).sum(axis=0)[None]  # (1,2,nf,za,az)
    uvb.data_array = np.concatenate([power, power], axis=1)  # fake 4 pols
    uvb.beam_type = "power"
    with pytest.raises(ValueError, match="reorder feeds"):
        GriddedBeam.from_uvbeam(uvb)


class TestBeamUpsampleKnob:
    """FFTVIS_BEAM_UPSAMPLE=N: host-resampled table + order-1 device
    interpolation (opt-in 16-taps -> 4-taps trade; exact at refined nodes,
    O((h/N)^2) between them)."""

    def _prepared(self, monkeypatch, ups):
        from fftvis_tpu.beams.interface import _prepare_beam_uncached

        if ups:
            monkeypatch.setenv("FFTVIS_BEAM_UPSAMPLE", str(ups))
        else:
            monkeypatch.delenv("FFTVIS_BEAM_UPSAMPLE", raising=False)
        gb = GriddedBeam.from_function(
            GaussianBeam(diameter=14.0), n_az=91, n_za=46, freqs=(1e8,)
        )
        return _prepare_beam_uncached(gb, np.array([1e8]), True, {"order": 3})

    def test_exact_at_refined_nodes(self, monkeypatch):
        """Order-1 on the upsampled table reproduces the cubic spline
        EXACTLY at refined grid nodes (the resample is spline evaluation)."""
        gb = GriddedBeam.from_function(
            GaussianBeam(diameter=14.0), n_az=91, n_za=46, freqs=(1e8,)
        )
        daz = float(gb.axis1_array[1] - gb.axis1_array[0])
        dza = float(gb.axis2_array[1] - gb.axis2_array[0])
        # Refined (ups=2) lattice nodes: originals plus midpoints.
        rng = np.random.default_rng(11)
        iaz = rng.integers(0, 2 * (gb.axis1_array.size - 1), 300)
        iza = rng.integers(0, 2 * (gb.axis2_array.size - 1) + 1, 300)
        az = float(gb.axis1_array[0]) + iaz * daz / 2
        za = float(gb.axis2_array[0]) + iza * dza / 2
        p3 = self._prepared(monkeypatch, 0)
        pu = self._prepared(monkeypatch, 2)
        v3 = np.asarray(p3.evaluate(jnp.asarray(az), jnp.asarray(za), 1e8, 0))
        vu = np.asarray(pu.evaluate(jnp.asarray(az), jnp.asarray(za), 1e8, 0))
        scale = np.abs(v3).max()
        assert np.abs(vu - v3).max() / scale < 5e-6

    def test_between_node_error_scales_quadratically(self, monkeypatch):
        rng = np.random.default_rng(7)
        az = rng.uniform(0, 2 * np.pi, 500)
        za = rng.uniform(0, np.pi / 2, 500)
        p3 = self._prepared(monkeypatch, 0)
        v3 = np.asarray(p3.evaluate(jnp.asarray(az), jnp.asarray(za), 1e8, 0))
        scale = np.abs(v3).max()
        errs = {}
        for ups in (2, 4):
            pu = self._prepared(monkeypatch, ups)
            vu = np.asarray(pu.evaluate(jnp.asarray(az), jnp.asarray(za), 1e8, 0))
            errs[ups] = np.abs(vu - v3).max() / scale
        assert errs[2] < 3e-2  # coarse 46x91 grid
        # Quadratic convergence in the refinement factor (allow slack).
        assert errs[4] < errs[2] / 2.5

    def test_full_sim_equivalence_coarse(self, monkeypatch):
        from fftvis_tpu import simulate_vis, TelescopeLocation

        rng = np.random.default_rng(3)
        loc = TelescopeLocation(np.deg2rad(-30.7), np.deg2rad(21.4), 1000.0)
        ants = {i: np.array([*rng.uniform(-30, 30, 2), 0.0]) for i in range(3)}
        gb = GriddedBeam.from_function(
            GaussianBeam(diameter=14.0), n_az=181, n_za=91, freqs=(1e8,)
        )
        kw = dict(
            ants=ants, fluxes=rng.uniform(0.1, 1, (24, 1)),
            ra=rng.uniform(0, 2 * np.pi, 24), dec=rng.uniform(-1.2, -0.2, 24),
            freqs=np.array([1e8]), times=2459863.2 + np.linspace(0, 0.01, 2),
            beam=gb, telescope_loc=loc, polarized=True,
            beam_spline_opts={"order": 3},
        )
        monkeypatch.delenv("FFTVIS_BEAM_UPSAMPLE", raising=False)
        v0 = simulate_vis(**kw)
        monkeypatch.setenv("FFTVIS_BEAM_UPSAMPLE", "4")
        v1 = simulate_vis(**kw)
        scale = np.abs(v0).max()
        assert np.abs(v1 - v0).max() / scale < 2e-3
        assert not np.array_equal(v1, v0)  # the knob actually engaged


class TestFeedSelection:
    """Regressions: feed identity through the gridded power-beam path."""

    def _two_feed_beam(self):
        # y-feed power = 4x x-feed power everywhere (amplitude 2x).
        az = np.linspace(0, 2 * np.pi, 36, endpoint=False)
        za = np.linspace(0, np.pi / 2, 10)
        data = np.zeros((2, 2, 1, za.size, az.size), dtype=np.complex128)
        base = (1.0 - 0.5 * (za / za[-1]) ** 2)[:, None] * np.ones(az.size)
        data[0, 0, 0] = base
        data[0, 1, 0] = 2.0 * base
        return GriddedBeam(data, az, za, np.array([1.5e8]), "efield",
                           feeds=["x", "y"])

    def test_use_feed_y_selects_y_power(self):
        gb = self._two_feed_beam()
        freqs = np.array([1.5e8])
        az = jnp.asarray(np.linspace(0.1, 6.0, 7))
        za = jnp.asarray(np.linspace(0.05, 1.2, 7))
        px = prepare_beam(
            prepare_beam_unpolarized(gb, use_feed="x").beam, freqs, False
        ).evaluate(az, za, 1.5e8, 0)
        py = prepare_beam(
            prepare_beam_unpolarized(gb, use_feed="y").beam, freqs, False
        ).evaluate(az, za, 1.5e8, 0)
        np.testing.assert_allclose(np.asarray(py), 4 * np.asarray(px),
                                   rtol=1e-6)

    def test_missing_feed_raises(self):
        az = np.linspace(0, 2 * np.pi, 36, endpoint=False)
        za = np.linspace(0, np.pi / 2, 10)
        data = np.ones((1, 1, 1, za.size, az.size))
        gb = GriddedBeam(data, az, za, np.array([1.5e8]), "power",
                         feeds=["y"])
        with pytest.raises(ValueError, match="feed 'x' is not present"):
            prepare_beam(
                prepare_beam_unpolarized(gb, use_feed="x").beam,
                np.array([1.5e8]), False,
            )

    def test_double_power_wrap_is_noop(self):
        """Pre-converting with prepare_beam_unpolarized and passing the
        result through another PowerBeam wrap (what simulate_vis does for
        unpolarized sims) must keep the original feed selection."""
        from fftvis_tpu.beams.interface import PowerBeam

        gb = self._two_feed_beam()
        once = prepare_beam_unpolarized(gb, use_feed="y").beam
        twice = PowerBeam(once)  # wrapper-style re-wrap, default feed arg
        assert twice.use_feed == "y"
        assert not isinstance(twice.base, PowerBeam)
        freqs = np.array([1.5e8])
        az = jnp.asarray(np.linspace(0.1, 6.0, 5))
        za = jnp.asarray(np.linspace(0.05, 1.2, 5))
        v1 = prepare_beam(once, freqs, False).evaluate(az, za, 1.5e8, 0)
        v2 = prepare_beam(twice, freqs, False).evaluate(az, za, 1.5e8, 0)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


class TestAzSeam:
    def test_order3_wrap_reproduces_table_at_seam(self):
        """Order-3 on a wrapped az axis must reproduce table values AT the
        seam nodes (regression: mirror prefilter + periodic taps left an
        O((c[n-1]-c[1])/6) bias at az = az0)."""
        rng = np.random.default_rng(3)
        ny, nx = 9, 24
        table = rng.normal(size=(ny, nx))
        got = np.asarray(
            map_coordinates_2d(
                jnp.asarray(table),
                jnp.asarray(np.full(nx, 4.0)),
                jnp.asarray(np.arange(nx, dtype=float)),
                order=3, wrap_x=True,
            )
        )
        np.testing.assert_allclose(got, table[4], atol=1e-10)

    def test_duplicated_endpoint_column_dropped(self):
        """A grid holding BOTH az=0 and az=2pi drops the duplicate column
        so periodic indexing has period 2pi (regression: period was
        2pi + daz, off-by-one seam taps)."""
        az = np.linspace(0, 2 * np.pi, 25)  # 0 and 2pi both present
        za = np.linspace(0, np.pi / 2, 5)
        data = np.ones((1, 1, 1, za.size, az.size))
        gb = GriddedBeam(data, az, za, np.array([1.5e8]), "power")
        assert gb.axis1_array.size == 24
        assert abs(gb.axis1_array[-1] - (2 * np.pi - np.pi / 12)) < 1e-12
        assert gb.az_wraps
