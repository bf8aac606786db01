from . import epipolar, pose

__all__ = ["epipolar", "pose"]
