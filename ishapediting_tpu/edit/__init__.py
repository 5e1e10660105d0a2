from ishapediting_tpu.edit.features import (  # noqa: F401
    complement_masks,
    make_offsets,
    plane_grids,
    regroup_features,
)
