from . import dist_ba, dist_frontend, mesh

__all__ = ["dist_ba", "dist_frontend", "mesh"]
