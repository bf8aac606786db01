from . import ba, pose_graph

__all__ = ["ba", "pose_graph"]
