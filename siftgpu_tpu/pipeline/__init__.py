from . import api, siftio, slam, twoview
from .api import SiftMatchTPU, SiftTPU

__all__ = ["api", "siftio", "slam", "twoview", "SiftTPU", "SiftMatchTPU"]
