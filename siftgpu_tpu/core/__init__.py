from .config import MatchConfig, SiftConfig
from . import flags, image, scalespace

__all__ = ["SiftConfig", "MatchConfig", "flags", "image", "scalespace"]
