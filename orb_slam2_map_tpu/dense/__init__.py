from . import grid2d, occupancy, pointcloud
from .pointcloud import DenseMapper
from .occupancy import OccupancyGrid3D
from .grid2d import OccupancyGrid2D

__all__ = ["grid2d", "occupancy", "pointcloud", "DenseMapper",
           "OccupancyGrid3D", "OccupancyGrid2D"]
