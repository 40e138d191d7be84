"""Beam-file IO: CST farfield text and beamfits (fftvis_tpu.beams.io).

The reference loads tabulated beams through pyuvdata (``UVBeam.read_cst_beam``
on CST text exports, ref tests/test_wrapper.py:61-78, and UVBeam's beamfits
on-disk format). pyuvdata is not in this image, so the package ships native
numpy readers/writers; these tests validate them with synthetic files:

- CST parsing: header-driven column discovery, shuffled row order, the
  duplicated phi=360 closure column, negative phase values (which a naive
  ``loadtxt(comments='-')`` would truncate), power vs efield columns,
  filename frequency parsing, and the rotate_pol second-feed synthesis
  (y(az) = x(az - 90 deg), pyuvdata's single-feed default).
- beamfits: write -> read round-trips for efield and power beams (exact),
  axis identification by CTYPE name rather than position, and an
  end-to-end simulation equivalence through the public API.
"""

import numpy as np
import pytest

from fftvis_tpu import TelescopeLocation, simulate_vis
from fftvis_tpu.beams import GaussianBeam, read_beamfits, read_cst, write_beamfits
from fftvis_tpu.beams.gridded import GriddedBeam

LOC = TelescopeLocation(np.deg2rad(-30.7), np.deg2rad(21.4), 1000.0)
FREQ = 1.5e8

CST_HEADER = (
    "Theta [deg.]  Phi   [deg.]  Abs(V   ) [V/m   ]   Abs(Theta) [V/m   ]  "
    "Phase(Theta)[deg.]  Abs(Phi  ) [V/m   ]  Phase(Phi  )[deg.]  "
    "Ax.Ratio[-       ]\n"
)


def _cst_fields(theta_deg, phi_deg):
    """Smooth synthetic farfield with negative phases."""
    t = np.deg2rad(theta_deg)
    p = np.deg2rad(phi_deg)
    abs_t = (1.0 + 0.5 * np.cos(p)) * np.cos(t / 2)
    ph_t = np.rad2deg(0.3 * np.sin(p) - 0.7 * t)  # negative values included
    abs_p = (0.8 + 0.2 * np.sin(2 * p)) * (1 - t / np.pi)
    ph_p = np.rad2deg(-0.5 * np.cos(p) * t)
    return abs_t, ph_t, abs_p, ph_p


def _write_cst_file(path, *, close_circle=True, shuffle=True, scale=1.0,
                    drop_row=False):
    theta = np.arange(0, 91, 15.0)  # 7 za samples
    phi_stop = 361 if close_circle else 331
    phi = np.arange(0, phi_stop, 30.0)  # 12 az samples (+360 closure)
    tg, pg = [a.ravel() for a in np.meshgrid(theta, phi, indexing="ij")]
    abs_t, ph_t, abs_p, ph_p = _cst_fields(tg, pg)
    abs_e = np.hypot(abs_t, abs_p) * scale
    rows = np.column_stack([tg, pg, abs_e, abs_t * scale, ph_t, abs_p * scale, ph_p,
                            np.ones_like(tg)])
    if shuffle:
        rows = rows[np.random.default_rng(0).permutation(len(rows))]
    if drop_row:
        rows = rows[1:]
    with open(path, "w") as fh:
        fh.write(CST_HEADER)
        fh.write("-" * 120 + "\n")
        for r in rows:
            fh.write("  ".join(f"{v: .8e}" for v in r) + "\n")
    return theta, phi


def _expected_efield(theta_deg, phi_deg):
    """Feed-x efield grid (vec=(az, za), nza, naz) the reader should produce."""
    tg, pg = np.meshgrid(theta_deg, phi_deg[:-1] if phi_deg[-1] == 360 else phi_deg,
                         indexing="ij")
    abs_t, ph_t, abs_p, ph_p = _cst_fields(tg, pg)
    e_t = abs_t * np.exp(1j * np.deg2rad(ph_t))
    e_p = abs_p * np.exp(1j * np.deg2rad(ph_p))
    return np.stack([e_p, e_t])  # vec 0 = az = E_phi, vec 1 = za = E_theta


class TestCST:
    def test_efield_single_file(self, tmp_path):
        f = tmp_path / "synth_150MHz.txt"
        theta, phi = _write_cst_file(f)
        gb = read_cst(str(f), rotate_pol=False)
        assert gb.beam_type == "efield"
        assert gb.data_array.shape == (2, 1, 1, 7, 12)
        np.testing.assert_allclose(gb.axis1_array, np.deg2rad(phi[:-1]), atol=1e-12)
        np.testing.assert_allclose(gb.axis2_array, np.deg2rad(theta), atol=1e-12)
        np.testing.assert_allclose(gb.freq_array, [150e6])
        np.testing.assert_allclose(
            gb.data_array[:, 0, 0], _expected_efield(theta, phi), atol=1e-12
        )
        assert gb.az_wraps

    def test_efield_open_circle(self, tmp_path):
        f = tmp_path / "synth_150MHz.txt"
        theta, phi = _write_cst_file(f, close_circle=False)
        gb = read_cst(str(f), rotate_pol=False)
        assert gb.data_array.shape[-1] == 12
        np.testing.assert_allclose(
            gb.data_array[:, 0, 0], _expected_efield(theta, phi), atol=1e-12
        )

    def test_rotate_pol_synthesizes_y_feed(self, tmp_path):
        f = tmp_path / "synth_150MHz.txt"
        _write_cst_file(f)
        gb = read_cst(str(f))  # rotate_pol defaults True
        assert gb.data_array.shape[1] == 2
        # y(az) = x(az - 90 deg): a +3-step roll at 30-deg spacing.
        np.testing.assert_allclose(
            gb.data_array[:, 1], np.roll(gb.data_array[:, 0], 3, axis=-1),
            atol=1e-12,
        )

    def test_rotate_pol_needs_compatible_spacing(self, tmp_path):
        f = tmp_path / "synth_150MHz.txt"
        theta = np.arange(0, 91, 15.0)
        phi = np.arange(0, 360, 51.4285714)  # 7 samples; 90 deg not a multiple
        tg, pg = [a.ravel() for a in np.meshgrid(theta, phi, indexing="ij")]
        abs_t, ph_t, abs_p, ph_p = _cst_fields(tg, pg)
        rows = np.column_stack([tg, pg, np.hypot(abs_t, abs_p), abs_t, ph_t,
                                abs_p, ph_p, np.ones_like(tg)])
        with open(f, "w") as fh:
            fh.write(CST_HEADER)
            for r in rows:
                fh.write("  ".join(f"{v: .8e}" for v in r) + "\n")
        with pytest.raises(ValueError, match="divide 90"):
            read_cst(str(f))

    def test_power_beam(self, tmp_path):
        f = tmp_path / "synth_150MHz.txt"
        theta, phi = _write_cst_file(f)
        gb = read_cst(str(f), beam_type="power", rotate_pol=False)
        assert gb.beam_type == "power"
        assert gb.data_array.shape == (1, 1, 1, 7, 12)
        abs_t, _, abs_p, _ = _cst_fields(
            *np.meshgrid(theta, phi[:-1], indexing="ij")
        )
        np.testing.assert_allclose(
            gb.data_array[0, 0, 0], abs_t**2 + abs_p**2, atol=1e-10
        )

    def test_multi_freq_sorted(self, tmp_path):
        f1 = tmp_path / "synth_200MHz.txt"
        f2 = tmp_path / "synth_0.15GHz.txt"
        _write_cst_file(f1, scale=2.0)
        _write_cst_file(f2, scale=1.0)
        gb = read_cst([str(f1), str(f2)], rotate_pol=False)
        np.testing.assert_allclose(gb.freq_array, [150e6, 200e6])
        # 200 MHz file has 2x the field of the 150 MHz one.
        np.testing.assert_allclose(
            gb.data_array[:, :, 1], 2.0 * gb.data_array[:, :, 0], atol=1e-12
        )

    def test_explicit_frequencies_override(self, tmp_path):
        f = tmp_path / "nofreqname.txt"
        _write_cst_file(f)
        with pytest.raises(ValueError, match="frequencies"):
            read_cst(str(f))
        gb = read_cst(str(f), frequencies=[123e6], rotate_pol=False)
        np.testing.assert_allclose(gb.freq_array, [123e6])

    def test_incomplete_grid_raises(self, tmp_path):
        f = tmp_path / "synth_150MHz.txt"
        _write_cst_file(f, drop_row=True)
        with pytest.raises(ValueError, match="grid"):
            read_cst(str(f), rotate_pol=False)

    def test_mismatched_grids_raise(self, tmp_path):
        f1 = tmp_path / "a_150MHz.txt"
        f2 = tmp_path / "b_160MHz.txt"
        _write_cst_file(f1)
        theta = np.arange(0, 91, 30.0)  # coarser grid
        phi = np.arange(0, 360, 30.0)
        tg, pg = [a.ravel() for a in np.meshgrid(theta, phi, indexing="ij")]
        abs_t, ph_t, abs_p, ph_p = _cst_fields(tg, pg)
        rows = np.column_stack([tg, pg, np.hypot(abs_t, abs_p), abs_t, ph_t,
                                abs_p, ph_p, np.ones_like(tg)])
        with open(f2, "w") as fh:
            fh.write(CST_HEADER)
            for r in rows:
                fh.write("  ".join(f"{v: .8e}" for v in r) + "\n")
        with pytest.raises(ValueError, match="different"):
            read_cst([str(f1), str(f2)])

    def test_bad_args(self, tmp_path):
        f = tmp_path / "synth_150MHz.txt"
        _write_cst_file(f)
        with pytest.raises(ValueError, match="beam_type"):
            read_cst(str(f), beam_type="voltage")
        with pytest.raises(ValueError, match="feed_pol"):
            read_cst(str(f), feed_pol="r")
        with pytest.raises(ValueError, match="frequencies"):
            read_cst([str(f)], frequencies=[1e8, 2e8])


def _native_beam(n_az=48, n_za=31, nfreq=3):
    freqs = FREQ + np.arange(nfreq) * 5e6
    return GriddedBeam.from_function(
        GaussianBeam(diameter=13.0), n_az=n_az, n_za=n_za, freqs=freqs,
        za_max=np.pi / 2,
    )


class TestBeamfits:
    def test_efield_roundtrip(self, tmp_path):
        gb = _native_beam()
        path = str(tmp_path / "beam.fits")
        write_beamfits(gb, path)
        got = read_beamfits(path)
        assert got.beam_type == "efield"
        np.testing.assert_allclose(got.data_array, gb.data_array, atol=1e-14)
        np.testing.assert_allclose(got.axis1_array, gb.axis1_array, atol=1e-12)
        np.testing.assert_allclose(got.axis2_array, gb.axis2_array, atol=1e-12)
        np.testing.assert_allclose(got.freq_array, gb.freq_array, rtol=1e-12)

    def test_power_roundtrip(self, tmp_path):
        gb = _native_beam().as_power_beam()
        path = str(tmp_path / "beam.fits")
        write_beamfits(gb, path)
        got = read_beamfits(path)
        assert got.beam_type == "power"
        np.testing.assert_allclose(got.data_array, gb.data_array, atol=1e-14)

    def test_single_freq_roundtrip(self, tmp_path):
        gb = _native_beam(nfreq=1)
        path = str(tmp_path / "beam.fits")
        write_beamfits(gb, path)
        got = read_beamfits(path)
        np.testing.assert_allclose(got.data_array, gb.data_array, atol=1e-14)
        np.testing.assert_allclose(got.freq_array, gb.freq_array, rtol=1e-12)

    def test_nonuniform_freqs_rejected(self, tmp_path):
        gb = _native_beam(nfreq=3)
        bad = GriddedBeam(
            gb.data_array, gb.axis1_array, gb.axis2_array,
            np.array([1.0e8, 1.1e8, 1.35e8]), "efield",
        )
        with pytest.raises(ValueError, match="uniform"):
            write_beamfits(bad, str(tmp_path / "beam.fits"))

    def test_cst_to_beamfits_chain(self, tmp_path):
        """CST read -> beamfits write -> beamfits read is lossless."""
        f = tmp_path / "synth_150MHz.txt"
        _write_cst_file(f)
        gb = read_cst(str(f))
        path = str(tmp_path / "beam.fits")
        write_beamfits(gb, path)
        got = read_beamfits(path)
        np.testing.assert_allclose(got.data_array, gb.data_array, atol=1e-14)
        np.testing.assert_allclose(got.axis1_array, gb.axis1_array, atol=1e-12)

    def test_truncated_file_raises(self, tmp_path):
        gb = _native_beam(nfreq=1)
        path = str(tmp_path / "beam.fits")
        write_beamfits(gb, path)
        with open(path, "rb") as fh:
            buf = fh.read()
        with open(path, "wb") as fh:
            fh.write(buf[: len(buf) // 2 // 2880 * 2880])
        with pytest.raises(ValueError):
            read_beamfits(path)

    def test_end_to_end_simulation(self, tmp_path):
        """A simulation with the round-tripped beam matches the original."""
        gb = _native_beam(nfreq=1)
        path = str(tmp_path / "beam.fits")
        write_beamfits(gb, path)
        got = read_beamfits(path)

        rng = np.random.default_rng(3)
        nsrc = 30
        ants = {i: np.array([*rng.uniform(-40, 40, 2), 0.0]) for i in range(4)}
        kw = dict(
            ants=ants, fluxes=rng.uniform(0.1, 1.0, (nsrc, 1)),
            ra=rng.uniform(0, 2 * np.pi, nsrc),
            dec=np.clip(LOC.lat + rng.normal(0, 0.4, nsrc), -np.pi / 2, np.pi / 2),
            freqs=np.array([FREQ]), times=2459863.2 + np.linspace(0, 0.01, 2),
            telescope_loc=LOC, polarized=True, precision=2,
        )
        v_orig = simulate_vis(beam=gb, **kw)
        v_io = simulate_vis(beam=got, **kw)
        np.testing.assert_allclose(v_io, v_orig, atol=1e-13)


def test_rotate_pol_requires_full_circle(tmp_path):
    """A partial-circle phi axis must refuse rotate_pol: np.roll wraps
    periodically, so rolling a half-circle axis would synthesize a garbage
    second feed (regression: spacing was derived as 2*pi/naz -- a
    0..177-deg export at 3-deg steps passed the old divide-90 check with a
    wrong inferred spacing and rolled the non-periodic axis silently)."""
    theta = np.arange(0, 91, 15.0)
    phi = np.arange(0, 180, 3.0)  # 60 samples over a half circle
    tg, pg = [a.ravel() for a in np.meshgrid(theta, phi, indexing="ij")]
    abs_t, ph_t, abs_p, ph_p = _cst_fields(tg, pg)
    rows = np.column_stack([tg, pg, np.hypot(abs_t, abs_p), abs_t, ph_t,
                            abs_p, ph_p, np.ones_like(tg)])
    f = tmp_path / "partial_150MHz.txt"
    with open(f, "w") as fh:
        fh.write(CST_HEADER)
        for r in rows:
            fh.write("  ".join(f"{v: .8e}" for v in r) + "\n")
    with pytest.raises(ValueError, match="full-circle"):
        read_cst(str(f))


def test_frequency_parse_ignores_directory_names(tmp_path):
    """A frequency-like token in a parent directory must not shadow the
    filename's (regression: re.search ran over the whole path)."""
    d = tmp_path / "sims_2GHz"
    d.mkdir()
    f = d / "synth_150MHz.txt"
    _write_cst_file(f)
    gb = read_cst(str(f), rotate_pol=False)
    assert gb.freq_array[0] == pytest.approx(150e6)
