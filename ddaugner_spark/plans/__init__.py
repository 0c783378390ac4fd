from .pipeline import KGPipeline, StageMetrics

__all__ = ["KGPipeline", "StageMetrics"]
