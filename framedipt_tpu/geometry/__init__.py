"""Geometry core: quaternion algebra, SO(3) maps, rigid-frame pytrees."""

from framedipt_tpu.geometry import quat, rigid, so3
from framedipt_tpu.geometry.rigid import Rigid

__all__ = ["quat", "rigid", "so3", "Rigid"]
