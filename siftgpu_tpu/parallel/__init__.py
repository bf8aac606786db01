from . import dist_ba, dist_pose_graph, dp, dryrun, sequence, spatial

__all__ = ["dist_ba", "dist_pose_graph", "dp", "dryrun", "sequence", "spatial"]
