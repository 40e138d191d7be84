"""GPU backend stubs (API parity with ref src/fftvis/gpu/: all entry points
raise NotImplementedError; the intended backend shape is defined so a CUDA
port can slot in without touching callers)."""

from .gpu_simulate import GPUSimulationEngine

__all__ = ["GPUSimulationEngine"]
