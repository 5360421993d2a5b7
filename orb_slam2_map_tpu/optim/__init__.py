from . import epnp, horn, local_ba, pose_opt, residuals, triangulate

__all__ = ["epnp", "horn", "local_ba", "pose_opt", "residuals", "triangulate"]
