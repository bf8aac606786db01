from . import dist_ba, dp, dryrun, spatial

__all__ = ["dist_ba", "dp", "dryrun", "spatial"]
