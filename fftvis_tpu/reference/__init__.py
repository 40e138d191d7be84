from .direct_engine import DirectSimulationEngine

__all__ = ["DirectSimulationEngine"]
