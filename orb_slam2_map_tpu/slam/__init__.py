from . import frame, mapstore, search, tracking, local_mapping, system
from .system import SLAMSystem, Sensor
from .tracking import Tracker, TrackingState
from .mapstore import MapStore

__all__ = [
    "frame", "mapstore", "search", "tracking", "local_mapping", "system",
    "SLAMSystem", "Sensor", "Tracker", "TrackingState", "MapStore",
]
