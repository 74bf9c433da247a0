from dd3d_tpu.structures.boxes3d import Boxes3D, generic_corners
from dd3d_tpu.structures.pose import Pose

__all__ = ["Boxes3D", "generic_corners", "Pose"]
