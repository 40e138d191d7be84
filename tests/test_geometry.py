"""Host-side geometry/planning utilities (test pattern 4 of the reference:
pure-math unit tests; ref tests/test_core_utils.py, test_antenna_gridding.py).
"""

import numpy as np
import pytest

from fftvis_tpu.core.antenna_gridding import (
    can_scale_to_int,
    check_antpos_griddability,
    find_integer_multiplier,
    find_lattice_basis,
)
from fftvis_tpu.core.utils import (
    get_plane_to_xy_rotation_matrix,
    get_pos_reds,
    get_task_chunks,
    validate_beam_idx,
)


def hex_array(hex_num: int, sep: float = 14.6) -> dict:
    """Minimal hex array generator (hera_sim-style rows)."""
    ants = {}
    i = 0
    for row in range(hex_num - 1, -hex_num, -1):
        n_in_row = 2 * hex_num - 1 - abs(row)
        for col in range(n_in_row):
            x = sep * (col - (n_in_row - 1) / 2)
            y = sep * row * np.sqrt(3) / 2
            ants[i] = np.array([x, y, 0.0])
            i += 1
    return ants


class TestPosReds:
    def test_hex_counts(self):
        ants = hex_array(3)  # 19 antennas
        reds = get_pos_reds(ants, include_autos=True)
        nbl = sum(len(r) for r in reds)
        assert nbl == 19 * 20 // 2
        # Autos are one group of 19.
        autos = [r for r in reds if r[0][0] == r[0][1]]
        assert len(autos) == 1 and len(autos[0]) == 19

    def test_representative_orientation(self):
        ants = hex_array(2)
        reds = get_pos_reds(ants, include_autos=False)
        for group in reds:
            a1, a2 = group[0]
            bly = (ants[a2] - ants[a1])[1]
            assert bly >= 0

    def test_no_autos(self):
        ants = {0: [0, 0, 0], 1: [10, 0, 0]}
        reds = get_pos_reds(ants, include_autos=False)
        assert sum(len(r) for r in reds) == 1


class TestPlaneRotation:
    def test_identity_for_flat(self):
        ants = np.array([[0, 0, 0], [10, 0, 0], [0, 10, 0]], dtype=float)
        np.testing.assert_allclose(get_plane_to_xy_rotation_matrix(ants), np.eye(3))

    def test_tilted_plane_flattens(self):
        rng = np.random.default_rng(0)
        xy = rng.uniform(-50, 50, size=(20, 2))
        slope = np.array([0.1, -0.05])
        z = xy @ slope + 3.0
        ants = np.column_stack([xy, z])
        rot = get_plane_to_xy_rotation_matrix(ants)
        # Rotation must be orthonormal.
        np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-12)
        rotated = ants @ rot  # row-vector application of rot.T
        z_rel = rotated[:, 2] - rotated[0, 2]
        assert np.abs(z_rel).max() < 1e-8


class TestTaskChunks:
    def test_small_problem_single_chunk(self):
        nproc, fc, tc, nf, nt = get_task_chunks(8, 1, 1)
        assert nproc == 1 and fc == [slice(None)]

    def test_partition_covers_grid(self):
        nproc, fcs, tcs, nf, nt = get_task_chunks(4, 10, 12)
        seen = np.zeros((10, 12), dtype=int)
        for fc, tc in zip(fcs, tcs):
            seen[fc, tc] += 1
        assert (seen == 1).all()


class TestValidateBeamIdx:
    def test_infer_single_beam(self):
        assert validate_beam_idx(None, None, 1, 5) is None

    def test_infer_per_ant(self):
        out = validate_beam_idx(None, None, 4, 4)
        np.testing.assert_array_equal(out, np.arange(4))

    def test_ambiguous_raises(self):
        with pytest.raises(ValueError, match="beam_idx must be provided"):
            validate_beam_idx(None, None, 2, 5)

    def test_wrong_length(self):
        with pytest.raises(ValueError, match="length nant"):
            validate_beam_idx(np.array([0, 1]), None, 2, 3)

    def test_out_of_range(self):
        with pytest.raises(ValueError, match="greater than the number"):
            validate_beam_idx(np.array([0, 5, 0]), None, 2, 3)

    def test_coefs_excludes_idx(self):
        with pytest.raises(ValueError, match="beam_idx should not be provided"):
            validate_beam_idx(np.zeros(3, dtype=int), np.ones((3, 2, 1)), 2, 3)

    def test_coefs_mode_returns_none(self):
        assert validate_beam_idx(None, np.ones((3, 2, 1)), 7, 3) is None


class TestGridding:
    def test_integer_multiplier(self):
        assert find_integer_multiplier([0.5, 0.25]) == 4
        assert find_integer_multiplier([0.0]) == 1
        assert find_integer_multiplier([2.0, 3.0]) == 1

    def test_can_scale(self):
        ok, f = can_scale_to_int(np.array([0.5, 1.5]))
        assert ok and f == 2
        ok, _ = can_scale_to_int(np.array([1.0, np.sqrt(2)]), max_factor=1000)
        assert not ok

    def test_hex_is_griddable(self):
        ants = hex_array(3)
        ok, gridded, basis = check_antpos_griddability(ants)
        assert ok
        # Integer coords must reproduce positions through the basis.
        for a in ants:
            rec = basis @ np.array([*gridded[a][:2], 0.0])
            np.testing.assert_allclose(
                rec[:2], np.asarray(ants[a][:2]) - np.asarray(ants[0][:2]), atol=1e-6
            )

    def test_random_is_not_griddable(self):
        rng = np.random.default_rng(1)
        ants = {i: np.array([*rng.uniform(0, 100, 2), 0.0]) for i in range(10)}
        ok, _, _ = check_antpos_griddability(ants)
        assert not ok

    def test_sheared_grid_griddable(self):
        basis = np.array([[10.0, 3.0], [0.0, 7.0]])
        ants = {
            i * 4 + j: np.array([*(basis @ [i, j]), 0.0])
            for i in range(4)
            for j in range(4)
        }
        ok, gridded, _ = check_antpos_griddability(ants)
        assert ok

    def test_collinear_array(self):
        ants = {i: np.array([10.0 * i, 0.0, 0.0]) for i in range(5)}
        basis = find_lattice_basis(ants)
        assert basis is not None
        ok, gridded, _ = check_antpos_griddability(ants)
        assert ok

    def test_autos_only(self):
        ants = {0: np.zeros(3), 1: np.zeros(3)}
        ok, _, _ = check_antpos_griddability(ants)
        assert not ok
