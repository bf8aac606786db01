from . import twoview

__all__ = ["twoview"]
