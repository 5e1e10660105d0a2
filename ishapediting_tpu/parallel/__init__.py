from ishapediting_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicate,
    shard_batch,
    shard_params_tp,
)
from ishapediting_tpu.parallel.sampling import sample_sharded  # noqa: F401
from ishapediting_tpu.parallel.decode import decode_grid_sharded  # noqa: F401
