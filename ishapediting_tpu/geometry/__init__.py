from ishapediting_tpu.geometry.mesh import TriMesh  # noqa: F401
from ishapediting_tpu.geometry.marching import marching_tetrahedra, grid_to_mesh  # noqa: F401
from ishapediting_tpu.geometry.occupancy import points_occupancy  # noqa: F401
from ishapediting_tpu.geometry.metrics import (  # noqa: F401
    chamfer_distance,
    hausdorff_distance,
    iou,
    local_distance,
)
from ishapediting_tpu.geometry.recon import (  # noqa: F401
    estimate_normals,
    point_cloud_to_mesh,
    poisson_reconstruct,
)
