from . import align, epipolar, pose

__all__ = ["align", "epipolar", "pose"]
