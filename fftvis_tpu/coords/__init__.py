from .erfa_lite import (
    TelescopeLocation,
    aberration_velocities,
    earth_rotation_angle,
    gmst_2006,
    icrs_to_enu_matrices,
    mean_obliquity,
    npb_matrix,
    radec_to_icrs_vectors,
    times_to_jd,
)
from .rotation import COORD_METHODS, SourceRotation, enu_to_az_za

__all__ = [
    "TelescopeLocation",
    "SourceRotation",
    "COORD_METHODS",
    "enu_to_az_za",
    "aberration_velocities",
    "earth_rotation_angle",
    "gmst_2006",
    "icrs_to_enu_matrices",
    "mean_obliquity",
    "npb_matrix",
    "radec_to_icrs_vectors",
    "times_to_jd",
]
