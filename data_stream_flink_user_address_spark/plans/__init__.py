from .pipeline import ReferencePipeline

__all__ = ["ReferencePipeline"]
