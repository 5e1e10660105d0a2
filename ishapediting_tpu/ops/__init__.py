from ishapediting_tpu.ops.grid_sample import grid_sample_2d  # noqa: F401
from ishapediting_tpu.ops.nn import (  # noqa: F401
    avg_pool_2x,
    conv2d,
    group_norm,
    nearest_upsample_2x,
    silu,
    timestep_embedding,
)
from ishapediting_tpu.ops.attention import qkv_attention  # noqa: F401
