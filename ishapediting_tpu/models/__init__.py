from ishapediting_tpu.models.unet import (  # noqa: F401
    build_layout,
    init_unet_params,
    unet_apply,
)
