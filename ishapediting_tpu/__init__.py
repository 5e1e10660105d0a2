"""ishapediting_tpu — a TPU-native (JAX/XLA/Pallas) triplane-diffusion shape-editing framework.

A from-scratch rebuild of the capabilities of iShapEditing (PG 2024,
reference: /root/reference) designed for TPU hardware:

- ADM-style UNet over 96-channel triplane latents as pure-functional JAX
  (``ishapediting_tpu.models.unet``), checkpoint-compatible with the released
  NFD PyTorch EMA weights via ``ishapediting_tpu.io.torch_convert``.
- DDPM/DDIM sampling, classifier guidance and edit-friendly DDPM inversion as
  jit-compiled ``lax.scan`` loops (``ishapediting_tpu.core.diffusion``).
- Drag editing: motion + mask feature losses differentiated through the
  sampler step with ``jax.grad`` (``ishapediting_tpu.edit``).
- A fused triplane occupancy decoder evaluated over full marching-cubes grids
  (``ishapediting_tpu.ops.triplane``).
- Host-side geometry: marching cubes, occupancy labeling, Chamfer/Hausdorff/
  IoU metrics (``ishapediting_tpu.geometry``), with native C++ fast paths.
- Multi-chip batched trajectories over a ``jax.sharding.Mesh``
  (``ishapediting_tpu.parallel``).
"""

__version__ = "0.1.0"

from ishapediting_tpu.config import (  # noqa: F401
    DiffusionConfig,
    EditConfig,
    FitConfig,
    PipelineConfig,
    UNetConfig,
)
