"""Utils facade (parity with ref src/fftvis/utils.py): re-exports the core
geometry/planning helpers plus this package's HEALPix pixel math."""

from ..core.antenna_gridding import (
    can_scale_to_int,
    check_antpos_griddability,
    find_integer_multiplier,
    find_lattice_basis,
)
from ..core.utils import (
    IDEALIZED_BL_TOL,
    get_desired_chunks,
    get_plane_to_xy_rotation_matrix,
    get_pos_reds,
    get_required_chunks,
    get_task_chunks,
    speed_of_light,
    validate_beam_idx,
)
from .healpix import healpix_radec, nside2npix, pix2ang_ring

__all__ = [
    "IDEALIZED_BL_TOL",
    "speed_of_light",
    "get_pos_reds",
    "get_plane_to_xy_rotation_matrix",
    "get_task_chunks",
    "get_required_chunks",
    "get_desired_chunks",
    "validate_beam_idx",
    "check_antpos_griddability",
    "find_lattice_basis",
    "find_integer_multiplier",
    "can_scale_to_int",
    "nside2npix",
    "pix2ang_ring",
    "healpix_radec",
]
