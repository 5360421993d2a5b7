from . import tum, trajectory, evaluate, synthetic

__all__ = ["tum", "trajectory", "evaluate", "synthetic"]
