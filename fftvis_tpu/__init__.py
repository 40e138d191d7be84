"""fftvis-tpu: a TPU-native interferometric visibility simulator.

A from-scratch JAX/XLA framework with the capabilities of fftvis
(tyler-a-cox/fftvis): NUFFT-accelerated visibility simulation from point
sources or pixelized skies, with analytic / tabulated / per-antenna /
eigenbeam primary beams, polarized or unpolarized, scalable over TPU device
meshes.
"""

from . import beams, coords, geometry, nufft, parallel
from .core.beam_basis import compute_beam_basis
from .core.simulate import SimulationEngine, default_accuracy_dict
from .coords import TelescopeLocation
from .reference.direct_engine import DirectSimulationEngine
from .tpu.beams import TPUBeamEvaluator
from .tpu.engine import TPUSimulationEngine
from .wrapper import create_beam_evaluator, create_simulation_engine, simulate_vis

__version__ = "0.1.0"

__all__ = [
    "simulate_vis",
    "create_simulation_engine",
    "create_beam_evaluator",
    "compute_beam_basis",
    "SimulationEngine",
    "TPUSimulationEngine",
    "DirectSimulationEngine",
    "TPUBeamEvaluator",
    "TelescopeLocation",
    "default_accuracy_dict",
    "beams",
    "coords",
    "geometry",
    "nufft",
    "parallel",
]
