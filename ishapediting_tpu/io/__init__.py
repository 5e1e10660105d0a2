from ishapediting_tpu.io.torch_convert import (  # noqa: F401
    convert_torch_state_dict,
    load_torch_checkpoint,
)
from ishapediting_tpu.io.model_dir import discover_model_dir, load_stats  # noqa: F401
