from . import ba, pnp, pose_graph

__all__ = ["ba", "pnp", "pose_graph"]
