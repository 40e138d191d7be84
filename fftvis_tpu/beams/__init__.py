from .analytic import (
    AiryBeam,
    AnalyticBeam,
    GaussianBeam,
    ShortDipoleBeam,
    UniformBeam,
    bessel_j1,
    diameter_to_sigma,
)
from .gridded import GriddedBeam
from .interface import (
    BeamInterface,
    PowerBeam,
    PreparedBeam,
    prepare_beam,
    prepare_beam_unpolarized,
    prepare_beams,
)
from .interp import map_coordinates_2d, spline_prefilter_2d
from .io import read_beamfits, read_cst, write_beamfits

__all__ = [
    "AnalyticBeam",
    "AiryBeam",
    "GaussianBeam",
    "UniformBeam",
    "ShortDipoleBeam",
    "GriddedBeam",
    "BeamInterface",
    "PowerBeam",
    "PreparedBeam",
    "prepare_beam",
    "prepare_beams",
    "prepare_beam_unpolarized",
    "bessel_j1",
    "diameter_to_sigma",
    "map_coordinates_2d",
    "spline_prefilter_2d",
    "read_cst",
    "read_beamfits",
    "write_beamfits",
]
