"""Where does the UNet forward time go? Ablate attention / GroupNorm."""
import time
import jax, jax.numpy as jnp, numpy as np
from unittest import mock

from ishapediting_tpu.config import UNetConfig
from ishapediting_tpu.models import unet as unet_mod
from ishapediting_tpu.models.unet import init_unet_params, unet_apply
import ishapediting_tpu.ops.nn as nn_mod

cfg = UNetConfig()
t0 = time.time()
p = init_unet_params(jax.random.PRNGKey(0), cfg)
jax.block_until_ready(p)
print("init %.1fs" % (time.time() - t0), flush=True)
x = jnp.zeros((8, 128, 128, 96))
tt = jnp.zeros((8,), jnp.int32)


def timed(label, fn):
    f = jax.jit(fn)
    out = f(p, x, tt)
    float(np.asarray(jnp.sum(out)))
    t0 = time.time()
    for _ in range(5):
        out = f(p, x, tt)
    float(np.asarray(jnp.sum(out)))
    print("%s: %.4fs" % (label, (time.time() - t0) / 5), flush=True)


timed("full fwd           ", lambda p, x, t: unet_apply(cfg, p, x, t)[0])

orig_attn = unet_mod._apply_attn
with mock.patch.object(unet_mod, "_apply_attn", lambda p, pre, l, h: h):
    timed("no attention       ", lambda p, x, t: unet_apply(cfg, p, x, t)[0])

orig_gn = nn_mod.group_norm
with mock.patch.object(
    unet_mod, "group_norm", lambda x, s, b, g=32, eps=1e-5: x
):
    timed("no groupnorm       ", lambda p, x, t: unet_apply(cfg, p, x, t)[0])
