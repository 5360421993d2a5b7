from . import frame_drawer, map_drawer, viewer
from .viewer import Viewer

__all__ = ["frame_drawer", "map_drawer", "viewer", "Viewer"]
