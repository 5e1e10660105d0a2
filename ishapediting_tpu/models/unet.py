"""ADM UNet as pure functions over a parameter pytree, NHWC, bf16 torso.

Architecture semantics match the reference UNetModel (reference:
unet.py:396-671 and factory script_util.py:132-187) so the released NFD
PyTorch EMA checkpoints convert losslessly (see io/torch_convert.py), but the
implementation is TPU-first:

- pure functions + a parameter pytree (no module framework) so the whole
  sampler — model included — jits into one XLA program and works under
  ``lax.scan``/``pjit`` without ceremony;
- NHWC activations and HWIO conv kernels (XLA's native TPU conv layout);
- bf16 torso compute with fp32 GroupNorm statistics, fp32 time embedding and
  fp32 output head (mirrors the reference's fp16-torso policy,
  unet.py:618-632, nn.py:16-18);
- the intermediate feature tap is a first-class traced output: ``feat_layer``
  selects an output block, and the activation after it is returned alongside
  the model output (reference: unet.py:662-671) — no Python-side hooks.

Parameter keys use the torch state_dict naming ("input_blocks.3.0.in_layers.2"
…) so conversion is a mechanical per-tensor transpose.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ishapediting_tpu.config import UNetConfig
from ishapediting_tpu.ops.attention import qkv_attention
from ishapediting_tpu.ops.nn import (
    avg_pool_2x,
    conv2d,
    group_norm,
    group_norm_silu,
    linear,
    nearest_upsample_2x,
    silu,
    timestep_embedding,
)

Params = Dict[str, Dict[str, jnp.ndarray]]


# ---------------------------------------------------------------------------
# Static layout
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Layer:
    """One sublayer inside a block (reference TimestepEmbedSequential)."""

    kind: str  # 'conv' | 'res' | 'attn' | 'downsample' | 'upsample'
    in_ch: int
    out_ch: int
    updown: str = "none"  # for 'res': 'none' | 'up' | 'down'
    heads: int = 0  # for 'attn'
    scale_shift: bool = True  # for 'res': FiLM vs additive time embedding
    use_conv: bool = True  # for 'downsample'/'upsample'


@dataclasses.dataclass(frozen=True)
class Layout:
    input_blocks: Tuple[Tuple[Layer, ...], ...]
    middle_block: Tuple[Layer, ...]
    output_blocks: Tuple[Tuple[Layer, ...], ...]
    out_ch_final: int  # channels entering the output head


def _num_heads(cfg: UNetConfig, ch: int, upsample: bool) -> int:
    if cfg.num_head_channels == -1:
        if upsample and cfg.num_heads_upsample != -1:
            return cfg.num_heads_upsample
        return cfg.num_heads
    assert ch % cfg.num_head_channels == 0, (ch, cfg.num_head_channels)
    return ch // cfg.num_head_channels


def build_layout(cfg: UNetConfig) -> Layout:
    """Replicates the constructor wiring of the reference UNet
    (unet.py:480-616) as a static description."""
    mc = cfg.model_channels
    ssn = cfg.use_scale_shift_norm
    ch = int(cfg.channel_mult[0] * mc)
    input_blocks: List[Tuple[Layer, ...]] = [
        (Layer("conv", cfg.in_channels, ch),)
    ]
    input_block_chans = [ch]
    ds = 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            layers = [Layer("res", ch, int(mult * mc), scale_shift=ssn)]
            ch = int(mult * mc)
            if ds in cfg.attention_ds:
                layers.append(Layer("attn", ch, ch, heads=_num_heads(cfg, ch, False)))
            input_blocks.append(tuple(layers))
            input_block_chans.append(ch)
        if level != len(cfg.channel_mult) - 1:
            out_ch = ch
            if cfg.resblock_updown:
                input_blocks.append(
                    (Layer("res", ch, out_ch, updown="down", scale_shift=ssn),)
                )
            else:
                input_blocks.append(
                    (Layer("downsample", ch, out_ch, use_conv=cfg.conv_resample),)
                )
            ch = out_ch
            input_block_chans.append(ch)
            ds *= 2

    middle = (
        Layer("res", ch, ch, scale_shift=ssn),
        Layer("attn", ch, ch, heads=_num_heads(cfg, ch, False)),
        Layer("res", ch, ch, scale_shift=ssn),
    )

    output_blocks: List[Tuple[Layer, ...]] = []
    for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
        for i in range(cfg.num_res_blocks + 1):
            ich = input_block_chans.pop()
            layers = [Layer("res", ch + ich, int(mc * mult), scale_shift=ssn)]
            ch = int(mc * mult)
            if ds in cfg.attention_ds:
                layers.append(Layer("attn", ch, ch, heads=_num_heads(cfg, ch, True)))
            if level and i == cfg.num_res_blocks:
                if cfg.resblock_updown:
                    layers.append(Layer("res", ch, ch, updown="up", scale_shift=ssn))
                else:
                    layers.append(
                        Layer("upsample", ch, ch, use_conv=cfg.conv_resample)
                    )
                ds //= 2
            output_blocks.append(tuple(layers))

    return Layout(
        input_blocks=tuple(input_blocks),
        middle_block=middle,
        output_blocks=tuple(output_blocks),
        out_ch_final=ch,
    )


def feat_layer_shape(cfg: UNetConfig, feat_layer: int) -> Tuple[int, int]:
    """(channels, spatial) of the activation after output_blocks[feat_layer]."""
    layout = build_layout(cfg)
    ds = 2 ** (len(cfg.channel_mult) - 1)
    size = cfg.image_size // ds
    for i, block in enumerate(layout.output_blocks):
        ch = block[0].out_ch
        if any(l.kind == "res" and l.updown == "up" or l.kind == "upsample" for l in block):
            size *= 2
        if i == feat_layer:
            return ch, size
    raise ValueError(f"feat_layer {feat_layer} out of range")


# ---------------------------------------------------------------------------
# Initialization (torch-default-like fan-in uniform; zero modules zeroed)
# ---------------------------------------------------------------------------


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def _init_conv(key, kh, kw, cin, cout, zero=False):
    if zero:
        return {
            "w": jnp.zeros((kh, kw, cin, cout), jnp.float32),
            "b": jnp.zeros((cout,), jnp.float32),
        }
    k1, k2 = jax.random.split(key)
    fan_in = kh * kw * cin
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "w": _uniform(k1, (kh, kw, cin, cout), math.sqrt(3.0) * bound),
        "b": _uniform(k2, (cout,), bound),
    }


def _init_linear(key, cin, cout, zero=False):
    if zero:
        return {
            "w": jnp.zeros((cin, cout), jnp.float32),
            "b": jnp.zeros((cout,), jnp.float32),
        }
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(cin)
    return {
        "w": _uniform(k1, (cin, cout), math.sqrt(3.0) * bound),
        "b": _uniform(k2, (cout,), bound),
    }


def _init_gn(ch):
    return {"scale": jnp.ones((ch,), jnp.float32), "bias": jnp.zeros((ch,), jnp.float32)}


def _init_layer(key, prefix: str, layer: Layer, emb_ch: int, params: Params):
    keys = jax.random.split(key, 8)
    if layer.kind == "conv":
        params[prefix] = _init_conv(keys[0], 3, 3, layer.in_ch, layer.out_ch)
    elif layer.kind == "res":
        params[f"{prefix}.in_layers.0"] = _init_gn(layer.in_ch)
        params[f"{prefix}.in_layers.2"] = _init_conv(
            keys[0], 3, 3, layer.in_ch, layer.out_ch
        )
        emb_out = 2 * layer.out_ch if layer.scale_shift else layer.out_ch
        params[f"{prefix}.emb_layers.1"] = _init_linear(keys[1], emb_ch, emb_out)
        params[f"{prefix}.out_layers.0"] = _init_gn(layer.out_ch)
        params[f"{prefix}.out_layers.3"] = _init_conv(
            keys[2], 3, 3, layer.out_ch, layer.out_ch, zero=True
        )
        if layer.in_ch != layer.out_ch:
            params[f"{prefix}.skip_connection"] = _init_conv(
                keys[3], 1, 1, layer.in_ch, layer.out_ch
            )
    elif layer.kind == "attn":
        ch = layer.in_ch
        params[f"{prefix}.norm"] = _init_gn(ch)
        params[f"{prefix}.qkv"] = _init_linear(keys[0], ch, 3 * ch)
        params[f"{prefix}.proj_out"] = _init_linear(keys[1], ch, ch, zero=True)
    elif layer.kind == "downsample":
        if layer.use_conv:
            params[f"{prefix}.op"] = _init_conv(
                keys[0], 3, 3, layer.in_ch, layer.out_ch
            )
    elif layer.kind == "upsample":
        if layer.use_conv:
            params[f"{prefix}.conv"] = _init_conv(
                keys[0], 3, 3, layer.in_ch, layer.out_ch
            )
    else:  # pragma: no cover
        raise ValueError(layer.kind)


def _init_unet_params_impl(rng: jax.Array, cfg: UNetConfig) -> Params:
    layout = build_layout(cfg)
    emb_ch = cfg.model_channels * 4
    params: Params = {}
    rng, k1, k2, k3 = jax.random.split(rng, 4)
    params["time_embed.0"] = _init_linear(k1, cfg.model_channels, emb_ch)
    params["time_embed.2"] = _init_linear(k2, emb_ch, emb_ch)
    if cfg.num_classes is not None:
        params["label_emb"] = {
            "w": jax.random.normal(k3, (cfg.num_classes, emb_ch), jnp.float32)
        }

    def init_blocks(section: str, blocks):
        nonlocal rng
        for i, block in enumerate(blocks):
            for j, layer in enumerate(block):
                rng, sub = jax.random.split(rng)
                _init_layer(sub, f"{section}.{i}.{j}", layer, emb_ch, params)

    init_blocks("input_blocks", layout.input_blocks)
    for j, layer in enumerate(layout.middle_block):
        rng, sub = jax.random.split(rng)
        _init_layer(sub, f"middle_block.{j}", layer, emb_ch, params)
    init_blocks("output_blocks", layout.output_blocks)

    rng, sub = jax.random.split(rng)
    params["out.0"] = _init_gn(layout.out_ch_final)
    params["out.2"] = _init_conv(
        sub, 3, 3, layout.out_ch_final, cfg.out_channels, zero=True
    )
    return params


def _param_specs(cfg: UNetConfig):
    """Flat list of (prefix, leaf, shape, init) describing every parameter.

    init is ("uniform", bound) | ("zeros",) | ("ones",) | ("normal",).
    Mirrors `_init_layer` (torch-default fan-in uniform; zero-modules zeroed).
    """
    layout = build_layout(cfg)
    emb_ch = cfg.model_channels * 4
    specs = []

    def dense(prefix, cin, cout, zero=False):
        if zero:
            specs.append((prefix, "w", (cin, cout), ("zeros",)))
            specs.append((prefix, "b", (cout,), ("zeros",)))
        else:
            bound = 1.0 / math.sqrt(cin)
            specs.append((prefix, "w", (cin, cout), ("uniform", math.sqrt(3.0) * bound)))
            specs.append((prefix, "b", (cout,), ("uniform", bound)))

    def conv(prefix, kh, kw, cin, cout, zero=False):
        if zero:
            specs.append((prefix, "w", (kh, kw, cin, cout), ("zeros",)))
            specs.append((prefix, "b", (cout,), ("zeros",)))
        else:
            bound = 1.0 / math.sqrt(kh * kw * cin)
            specs.append(
                (prefix, "w", (kh, kw, cin, cout), ("uniform", math.sqrt(3.0) * bound))
            )
            specs.append((prefix, "b", (cout,), ("uniform", bound)))

    def gn(prefix, ch):
        specs.append((prefix, "scale", (ch,), ("ones",)))
        specs.append((prefix, "bias", (ch,), ("zeros",)))

    def layer(prefix, l: Layer):
        if l.kind == "conv":
            conv(prefix, 3, 3, l.in_ch, l.out_ch)
        elif l.kind == "res":
            gn(f"{prefix}.in_layers.0", l.in_ch)
            conv(f"{prefix}.in_layers.2", 3, 3, l.in_ch, l.out_ch)
            emb_out = 2 * l.out_ch if l.scale_shift else l.out_ch
            dense(f"{prefix}.emb_layers.1", emb_ch, emb_out)
            gn(f"{prefix}.out_layers.0", l.out_ch)
            conv(f"{prefix}.out_layers.3", 3, 3, l.out_ch, l.out_ch, zero=True)
            if l.in_ch != l.out_ch:
                conv(f"{prefix}.skip_connection", 1, 1, l.in_ch, l.out_ch)
        elif l.kind == "attn":
            gn(f"{prefix}.norm", l.in_ch)
            dense(f"{prefix}.qkv", l.in_ch, 3 * l.in_ch)
            dense(f"{prefix}.proj_out", l.in_ch, l.in_ch, zero=True)
        elif l.kind == "downsample":
            if l.use_conv:
                conv(f"{prefix}.op", 3, 3, l.in_ch, l.out_ch)
        elif l.kind == "upsample":
            if l.use_conv:
                conv(f"{prefix}.conv", 3, 3, l.in_ch, l.out_ch)
        else:  # pragma: no cover
            raise ValueError(l.kind)

    dense("time_embed.0", cfg.model_channels, emb_ch)
    dense("time_embed.2", emb_ch, emb_ch)
    if cfg.num_classes is not None:
        specs.append(("label_emb", "w", (cfg.num_classes, emb_ch), ("normal",)))
    for i, block in enumerate(layout.input_blocks):
        for j, l in enumerate(block):
            layer(f"input_blocks.{i}.{j}", l)
    for j, l in enumerate(layout.middle_block):
        layer(f"middle_block.{j}", l)
    for i, block in enumerate(layout.output_blocks):
        for j, l in enumerate(block):
            layer(f"output_blocks.{i}.{j}", l)
    gn("out.0", layout.out_ch_final)
    conv("out.2", 3, 3, layout.out_ch_final, cfg.out_channels, zero=True)
    return specs


def _init_from_specs(rng: jax.Array, cfg: UNetConfig) -> Params:
    specs = _param_specs(cfg)
    uniform_total = sum(
        int(np.prod(shape)) for _, _, shape, init in specs if init[0] == "uniform"
    )
    k_uni, k_norm = jax.random.split(rng)
    # threefry generation of ~4e8 elements costs ~75 s on the target backend;
    # the hardware rbg generator does it in well under a second (docs/PERF.md).
    # Init quality does not need counter-based RNG guarantees.
    k_bits = (
        jax.random.key_data(k_uni)
        if jnp.issubdtype(jnp.asarray(k_uni).dtype, jax.dtypes.prng_key)
        else jnp.asarray(k_uni)
    ).reshape(-1)
    rbg_key = jax.random.wrap_key_data(
        jnp.tile(k_bits, 4)[:4].astype(jnp.uint32), impl="rbg"
    )
    flat = jax.random.uniform(
        rbg_key, (uniform_total,), jnp.float32, minval=-1.0, maxval=1.0
    )
    params: Params = {}
    offset = 0
    for prefix, leaf, shape, init in specs:
        n = int(np.prod(shape))
        if init[0] == "uniform":
            arr = flat[offset : offset + n].reshape(shape) * init[1]
            offset += n
        elif init[0] == "zeros":
            arr = jnp.zeros(shape, jnp.float32)
        elif init[0] == "ones":
            arr = jnp.ones(shape, jnp.float32)
        else:  # normal (label_emb)
            arr = jax.random.normal(k_norm, shape, jnp.float32)
        params.setdefault(prefix, {})[leaf] = arr
    return params


@functools.lru_cache(maxsize=8)
def _jitted_init(cfg: UNetConfig):
    return jax.jit(functools.partial(_init_from_specs, cfg=cfg))


def init_unet_params(rng: jax.Array, cfg: UNetConfig) -> Params:
    """Initialize the full parameter tree in one cheap device program.

    A per-leaf eager init dispatches ~2000 small RNG ops; on backends with
    high per-dispatch latency that costs minutes for the 421M-param model
    (measured 128 s, docs/PERF.md), and jitting that same per-leaf RNG graph
    just moves the cost into a 145 s compile. Instead: ONE flat uniform draw
    carved into the uniform-init leaves (iid slices of a uniform vector have
    exactly the per-leaf distribution), plus zeros/ones/one normal draw —
    a single program of trivial slices that compiles in seconds and hits the
    persistent cache afterwards.
    """
    return _jitted_init(cfg)(rng)


def param_count(params: Params) -> int:
    return sum(int(np.prod(a.shape)) for d in params.values() for a in d.values())


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def _apply_res(
    p: Params,
    prefix: str,
    layer: Layer,
    h: jnp.ndarray,
    emb: jnp.ndarray,
    dropout_rng: Optional[jax.Array],
    dropout: float,
) -> jnp.ndarray:
    """ResBlock with scale-shift GroupNorm FiLM and in-block up/down resample
    (reference: unet.py:236-256)."""
    x = h
    gn1 = p[f"{prefix}.in_layers.0"]
    hh = group_norm_silu(h, gn1["scale"], gn1["bias"])
    if layer.updown == "up":
        hh = nearest_upsample_2x(hh)
        x = nearest_upsample_2x(x)
    elif layer.updown == "down":
        hh = avg_pool_2x(hh)
        x = avg_pool_2x(x)
    c1 = p[f"{prefix}.in_layers.2"]
    hh = conv2d(hh, c1["w"], c1["b"], padding=1)

    el = p[f"{prefix}.emb_layers.1"]
    emb_out = linear(silu(emb), el["w"], el["b"]).astype(hh.dtype)

    gn2 = p[f"{prefix}.out_layers.0"]
    if layer.scale_shift:
        scale, shift = jnp.split(emb_out[:, None, None, :], 2, axis=-1)
        hh = group_norm_silu(
            hh, gn2["scale"], gn2["bias"], film=(scale, shift)
        )
    else:
        # additive time embedding (reference: unet.py:253-255)
        hh = group_norm_silu(
            hh + emb_out[:, None, None, :], gn2["scale"], gn2["bias"]
        )
    if dropout_rng is not None and dropout > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout, hh.shape)
        hh = jnp.where(keep, hh / (1.0 - dropout), 0.0).astype(hh.dtype)
    c2 = p[f"{prefix}.out_layers.3"]
    hh = conv2d(hh, c2["w"], c2["b"], padding=1)

    if layer.in_ch != layer.out_ch:
        sk = p[f"{prefix}.skip_connection"]
        x = conv2d(x, sk["w"], sk["b"], padding=0)
    return x + hh


def _apply_attn(p: Params, prefix: str, layer: Layer, h: jnp.ndarray) -> jnp.ndarray:
    """Self-attention block with residual (reference: unet.py:296-305)."""
    n, hh_, ww_, c = h.shape
    gn = p[f"{prefix}.norm"]
    normed = group_norm(h, gn["scale"], gn["bias"]).reshape(n, hh_ * ww_, c)
    qkv_p = p[f"{prefix}.qkv"]
    qkv = linear(normed, qkv_p["w"], qkv_p["b"])
    att = qkv_attention(qkv, layer.heads)
    proj = p[f"{prefix}.proj_out"]
    out = linear(att, proj["w"], proj["b"])
    return h + out.reshape(n, hh_, ww_, c)


def _apply_layer(
    p: Params,
    prefix: str,
    layer: Layer,
    h: jnp.ndarray,
    emb: jnp.ndarray,
    dropout_rng,
    dropout: float,
) -> jnp.ndarray:
    if layer.kind == "conv":
        c = p[prefix]
        return conv2d(h, c["w"], c["b"], padding=1)
    if layer.kind == "res":
        return _apply_res(p, prefix, layer, h, emb, dropout_rng, dropout)
    if layer.kind == "attn":
        return _apply_attn(p, prefix, layer, h)
    if layer.kind == "downsample":
        if not layer.use_conv:
            return avg_pool_2x(h)
        c = p[f"{prefix}.op"]
        return conv2d(h, c["w"], c["b"], stride=2, padding=1)
    if layer.kind == "upsample":
        h = nearest_upsample_2x(h)
        if not layer.use_conv:
            return h
        c = p[f"{prefix}.conv"]
        return conv2d(h, c["w"], c["b"], padding=1)
    raise ValueError(layer.kind)  # pragma: no cover


def unet_apply(
    cfg: UNetConfig,
    params: Params,
    x: jnp.ndarray,
    timesteps: jnp.ndarray,
    *,
    feat_layer: int = -1,
    y: Optional[jnp.ndarray] = None,
    train: bool = False,
    dropout_rng: Optional[jax.Array] = None,
    remat: bool = False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Forward pass.

    :param x: [N, H, W, C_in] latent, any float dtype (output matches it).
    :param timesteps: [N] *original-chain* timesteps (the schedule's
        ``timestep_map`` must already be applied; reference: respace.py:122-127).
    :param feat_layer: if >= 0, also return the activation after
        ``output_blocks[feat_layer]`` in fp32 (reference: unet.py:662-671).
    :param remat: rematerialize each block in the backward pass
        (``jax.checkpoint``) — used by the guidance/edit paths that
        differentiate through the full UNet.
    :returns: (out [N,H,W,C_out] in x.dtype, feat or None).
    """
    layout = build_layout(cfg)
    if feat_layer >= len(layout.output_blocks):
        raise ValueError(
            f"feat_layer {feat_layer} out of range "
            f"(model has {len(layout.output_blocks)} output blocks)"
        )
    compute_dtype = cfg.jnp_compute_dtype

    t0 = params["time_embed.0"]
    t2 = params["time_embed.2"]
    emb = timestep_embedding(timesteps, cfg.model_channels)
    emb = linear(silu(linear(emb, t0["w"], t0["b"])), t2["w"], t2["b"])
    if cfg.num_classes is not None:
        assert y is not None, "class-conditional model requires y"
        emb = emb + params["label_emb"]["w"][y]

    dropout = cfg.dropout if train else 0.0
    n_drop_sites = (
        sum(len(b) for b in layout.input_blocks)
        + len(layout.middle_block)
        + sum(len(b) for b in layout.output_blocks)
    )
    if dropout > 0.0 and dropout_rng is not None:
        drop_rngs = list(jax.random.split(dropout_rng, n_drop_sites))
    else:
        drop_rngs = [None] * n_drop_sites
    site = 0

    def run_layer(prefix, layer, h, emb, dr):
        fn = lambda hh, ee: _apply_layer(params, prefix, layer, hh, ee, dr, dropout)
        if remat:
            fn = jax.checkpoint(fn)
        return fn(h, emb)

    h = x.astype(compute_dtype)
    hs = []
    for i, block in enumerate(layout.input_blocks):
        for j, layer in enumerate(block):
            h = run_layer(f"input_blocks.{i}.{j}", layer, h, emb, drop_rngs[site])
            site += 1
        hs.append(h)
    for j, layer in enumerate(layout.middle_block):
        h = run_layer(f"middle_block.{j}", layer, h, emb, drop_rngs[site])
        site += 1

    inter_feat = None
    for i, block in enumerate(layout.output_blocks):
        h = jnp.concatenate([h, hs.pop()], axis=-1)
        for j, layer in enumerate(block):
            h = run_layer(f"output_blocks.{i}.{j}", layer, h, emb, drop_rngs[site])
            site += 1
        if i == feat_layer:
            inter_feat = h.astype(jnp.float32)

    h = h.astype(x.dtype)
    gn = params["out.0"]
    h = group_norm_silu(h, gn["scale"], gn["bias"])
    c = params["out.2"]
    out = conv2d(h, c["w"], c["b"], padding=1)
    return out.astype(x.dtype), inter_feat
