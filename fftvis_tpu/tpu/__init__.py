from .beams import TPUBeamEvaluator
from .engine import TPUSimulationEngine

__all__ = ["TPUSimulationEngine", "TPUBeamEvaluator"]
