from . import ba

__all__ = ["ba"]
