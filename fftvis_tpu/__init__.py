"""fftvis-tpu: a TPU-native interferometric visibility simulator.

A from-scratch JAX/XLA framework with the capabilities of fftvis
(tyler-a-cox/fftvis): NUFFT-accelerated visibility simulation from point
sources or pixelized skies, with analytic / tabulated / per-antenna /
eigenbeam primary beams, polarized or unpolarized, scalable over TPU device
meshes.
"""

import os as _os


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache (disable: FFTVIS_NO_COMPILE_CACHE=1).

    Remote/relayed TPU runtimes can take minutes per compile; the on-disk
    cache makes every process after the first start in seconds."""
    if _os.environ.get("FFTVIS_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        path = _os.environ.get(
            "FFTVIS_COMPILE_CACHE", _os.path.expanduser("~/.cache/fftvis_tpu_jax")
        )
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - older jax or read-only fs
        pass


_enable_compile_cache()

from . import beams, coords, geometry, nufft, parallel
from .autodiff import build_differentiable_direct_sim, build_differentiable_sim
from .checkpoint import simulate_vis_checkpointed
from .core.beam_basis import compute_beam_basis
from .core.simulate import SimulationEngine, default_accuracy_dict
from .coords import TelescopeLocation
from .reference.direct_engine import DirectSimulationEngine
from .tpu.beams import TPUBeamEvaluator
from .tpu.engine import TPUSimulationEngine, VisibilityFuture
from .wrapper import create_beam_evaluator, create_simulation_engine, simulate_vis

__version__ = "0.5.0"

__all__ = [
    "simulate_vis",
    "simulate_vis_checkpointed",
    "build_differentiable_sim",
    "build_differentiable_direct_sim",
    "create_simulation_engine",
    "create_beam_evaluator",
    "compute_beam_basis",
    "SimulationEngine",
    "TPUSimulationEngine",
    "VisibilityFuture",
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
