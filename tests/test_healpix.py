"""HEALPix ring-scheme internal-consistency tests."""

import numpy as np
import pytest

from fftvis_tpu.utils.healpix import healpix_radec, nside2npix, pix2ang_ring


@pytest.mark.parametrize("nside", [1, 2, 4, 16, 64])
def test_structure(nside):
    theta, phi = pix2ang_ring(nside)
    npix = nside2npix(nside)
    assert theta.shape == (npix,)
    # theta non-decreasing ring by ring; phi in [0, 2pi).
    assert (phi >= 0).all() and (phi < 2 * np.pi).all()
    assert (np.diff(theta) >= -1e-12).all()

    # Equal-area: sum of z over all pixels is 0 (equatorial symmetry) and
    # the mean of z^2 matches the uniform-sphere value 1/3.
    z = np.cos(theta)
    assert abs(z.sum()) < 1e-9 * npix
    # Pixel-center quadrature of z^2 converges ~ 1/nside^2.
    assert abs((z**2).mean() - 1 / 3) < 0.05 / nside**2

    # North/south mirror symmetry: pixel p and npix-1-p have theta summing
    # to pi.
    assert np.allclose(theta + theta[::-1], np.pi, atol=1e-12)

    # Ring populations: caps have 4i, belt has 4 nside.
    counts = np.unique(np.round(np.cos(theta), 12), return_counts=True)[1]
    assert counts.max() == 4 * nside
    assert counts.sum() == npix


def test_nside1_known_values():
    """Ground truth for nside=1 (the standard 12-pixel sphere)."""
    theta, phi = pix2ang_ring(1)
    np.testing.assert_allclose(theta[:4], np.arccos(2 / 3))
    np.testing.assert_allclose(phi[:4], np.deg2rad([45, 135, 225, 315]))
    np.testing.assert_allclose(theta[4:8], np.pi / 2)
    np.testing.assert_allclose(phi[4:8], np.deg2rad([0, 90, 180, 270]))
    np.testing.assert_allclose(theta[8:], np.pi - np.arccos(2 / 3))
    np.testing.assert_allclose(phi[8:], np.deg2rad([45, 135, 225, 315]))


def test_nside2_cap_values():
    theta, phi = pix2ang_ring(2)
    # North cap ring 1: 4 pixels at phi = 45, 135, 225, 315; z = 1 - 1/12.
    np.testing.assert_allclose(np.cos(theta[:4]), 1 - 1 / 12)
    np.testing.assert_allclose(phi[:4], np.deg2rad([45, 135, 225, 315]))
    # South cap mirrors with the same phi ordering.
    np.testing.assert_allclose(phi[44:], np.deg2rad([45, 135, 225, 315]))
    np.testing.assert_allclose(np.cos(theta[44:]), -(1 - 1 / 12))


def test_out_of_range():
    with pytest.raises(ValueError):
        pix2ang_ring(2, np.array([48]))


def test_radec_shape():
    ra, dec = healpix_radec(4)
    assert ra.shape == dec.shape == (192,)
    assert (dec <= np.pi / 2).all() and (dec >= -np.pi / 2).all()
