from .config import MatchConfig, SiftConfig
from . import scalespace

__all__ = ["SiftConfig", "MatchConfig", "scalespace"]
