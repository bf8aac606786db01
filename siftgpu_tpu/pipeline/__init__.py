from . import api, siftio, twoview
from .api import SiftMatchTPU, SiftTPU

__all__ = ["api", "siftio", "twoview", "SiftTPU", "SiftMatchTPU"]
