from . import fixtures, match_cpu, sift_cpu

__all__ = ["sift_cpu", "match_cpu", "fixtures"]
