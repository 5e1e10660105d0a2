"""Device mesh + sharding policy.

The reference's only parallelism is MPI data-parallel sampling with NCCL
all_gather (reference: dist_util.py:21-85, image_sample.py:104-132,
SURVEY.md §2.4). TPU-native replacement: a ``jax.sharding.Mesh`` with a
``data`` axis for independent trajectories (the meaningful scaling axis for
this workload) plus an optional ``model`` axis for tensor parallelism of the
UNet's widest layers. There are no explicit collectives anywhere — shardings
annotate the inputs and XLA GSPMD inserts all_gathers/psums on ICI.

Multi-host: call ``initialize_distributed()`` once per process
(jax.distributed), then every ``jax.devices()``-based mesh spans all hosts
and checkpoint replication over DCN is handled by ``device_put`` with a
replicated sharding (replaces the reference's chunked MPI broadcast,
dist_util.py:56-85).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(**kwargs) -> None:
    """Multi-host rendezvous. Call BEFORE any other JAX API (touching the
    backend first makes a later ``jax.distributed.initialize`` invalid).

    With explicit kwargs (coordinator_address etc.) failures propagate; with
    no kwargs we attempt auto-detection (TPU pods, SLURM, ...) and fall back
    to single-process mode when no coordinator environment exists — but the
    failure is LOGGED, never silent, so a misconfigured multi-host launch is
    visible instead of degrading to world size 1 quietly."""
    try:
        jax.distributed.initialize(**kwargs)
    except Exception as e:
        if kwargs:
            raise
        import logging

        logging.getLogger(__name__).warning(
            "jax.distributed.initialize() auto-detection failed (%s: %s); "
            "continuing single-process. Pass coordinator_address/... "
            "explicitly for multi-host.",
            type(e).__name__,
            e,
        )


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """1-D ``data`` mesh, or 2-D ``(data, model)`` when model_parallel > 1."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def shard_batch(x, mesh: Mesh):
    """Shard the leading (batch/trajectory) axis over ``data``."""
    return jax.device_put(x, NamedSharding(mesh, P("data")))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (e.g. parameters) over every device."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def _tp_spec(prefix: str, leaf: str, arr) -> P:
    """Tensor-parallel layout for UNet params: shard the widest matmul
    weights on ``model``; replicate everything else.

    Policy: attention qkv/proj and the FiLM emb projections shard on their
    output features; conv kernels shard on output channels when large. XLA
    GSPMD propagates activations shardings and inserts the collectives.
    """
    if arr.ndim == 2 and arr.shape[1] >= 256:  # dense (in, out)
        return P(None, "model")
    if arr.ndim == 4 and arr.shape[3] >= 256:  # conv HWIO
        return P(None, None, None, "model")
    return P()


def shard_params_tp(params: Dict, mesh: Mesh) -> Dict:
    """Place UNet params with the tensor-parallel policy over ``model``."""
    if mesh.shape["model"] == 1:
        return replicate(params, mesh)
    out = {}
    for prefix, entry in params.items():
        out[prefix] = {
            leaf: jax.device_put(
                arr, NamedSharding(mesh, _tp_spec(prefix, leaf, arr))
            )
            for leaf, arr in entry.items()
        }
    return out
