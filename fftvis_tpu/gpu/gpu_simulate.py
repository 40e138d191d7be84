"""GPU simulation engine stub (parity: ref gpu/gpu_simulate.py:20-91).

JAX already runs this framework's TPU engine on CUDA devices unchanged; the
explicit "gpu" backend remains reserved for a CUDA-tuned engine (cuFINUFFT-
style binned spreading). Everything raises NotImplementedError, loudly.
"""

from __future__ import annotations

from ..core.simulate import SimulationEngine


def _cuda_available() -> bool:
    """Probe for a CUDA jax backend (the ref probes cupy; gpu/utils.py:23)."""
    try:
        import jax

        return any(d.platform == "gpu" for d in jax.devices())
    except Exception:
        return False


class GPUSimulationEngine(SimulationEngine):
    """Placeholder engine: not yet implemented."""

    def __init__(self, **kwargs):
        raise NotImplementedError(
            "The dedicated GPU backend is not yet implemented; the 'tpu' "
            "backend runs on CUDA devices through JAX."
        )

    def simulate(self, *args, **kwargs):  # pragma: no cover - ctor raises
        raise NotImplementedError

    def _evaluate_vis_chunk(self, *args, **kwargs):  # pragma: no cover
        raise NotImplementedError


def gpu_nufft2d(*args, **kwargs):
    """Stub (parity: ref gpu/nufft.py:11-98)."""
    raise NotImplementedError("GPU NUFFT not yet implemented")


def gpu_nufft3d(*args, **kwargs):
    raise NotImplementedError("GPU NUFFT not yet implemented")


def gpu_beam_interpolation(*args, **kwargs):
    """Stub (parity: ref gpu/beams.py:15-88)."""
    raise NotImplementedError("GPU beam interpolation not yet implemented")
