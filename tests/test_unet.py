import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ishapediting_tpu.config import UNetConfig
from ishapediting_tpu.models.unet import (
    build_layout,
    feat_layer_shape,
    init_unet_params,
    param_count,
    unet_apply,
)

TINY = UNetConfig(
    image_size=16,
    in_channels=6,
    model_channels=32,
    out_channels=12,
    num_res_blocks=1,
    attention_ds=(2,),
    channel_mult=(1, 2),
    num_heads=4,
    num_head_channels=16,
    dropout=0.0,
    compute_dtype="float32",
)


def test_layout_published_model():
    """Wiring of the published NFD config must match the reference exactly
    (SURVEY.md §2.2; reference unet.py:480-616)."""
    cfg = UNetConfig()
    layout = build_layout(cfg)
    assert len(layout.input_blocks) == 15
    assert len(layout.output_blocks) == 15
    # feature tap used by editing: output block 8 -> 512 ch at 64^2
    assert feat_layer_shape(cfg, 8) == (512, 64)
    assert feat_layer_shape(cfg, 7) == (512, 32)
    assert feat_layer_shape(cfg, 9) == (256, 64)
    # downsampling blocks are resblocks (resblock_updown)
    kinds = [layout.input_blocks[i][0].kind for i in (3, 6, 9, 12)]
    assert kinds == ["res"] * 4
    assert all(layout.input_blocks[i][0].updown == "down" for i in (3, 6, 9, 12))
    # attention heads = channels / 64
    attn = [l for b in layout.input_blocks for l in b if l.kind == "attn"]
    assert {(a.in_ch, a.heads) for a in attn} == {(512, 8), (768, 12), (1024, 16)}
    assert layout.out_ch_final == 256


def test_tiny_forward_shapes():
    params = init_unet_params(jax.random.PRNGKey(0), TINY)
    x = jnp.zeros((2, 16, 16, 6))
    t = jnp.array([0, 5])
    out, feat = unet_apply(TINY, params, x, t)
    assert out.shape == (2, 16, 16, 12)
    assert feat is None


def test_tiny_feat_tap():
    params = init_unet_params(jax.random.PRNGKey(0), TINY)
    x = jnp.ones((1, 16, 16, 6))
    t = jnp.array([3])
    layout = build_layout(TINY)
    for fl in range(len(layout.output_blocks)):
        out, feat = unet_apply(TINY, params, x, t, feat_layer=fl)
        ch, size = feat_layer_shape(TINY, fl)
        assert feat.shape == (1, size, size, ch), fl
        assert feat.dtype == jnp.float32


def test_zero_init_output():
    """zero_module on the final conv => output is exactly zero at init
    (reference nn.py:67-73, unet.py:612-616)."""
    params = init_unet_params(jax.random.PRNGKey(0), TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 6))
    out, _ = unet_apply(TINY, params, x, jnp.array([7]))
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_forward_is_jittable_and_deterministic():
    params = init_unet_params(jax.random.PRNGKey(0), TINY)
    f = jax.jit(lambda p, x, t: unet_apply(TINY, p, x, t, feat_layer=1))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 6))
    o1, f1 = f(params, x, jnp.array([3]))
    o2, f2 = f(params, x, jnp.array([3]))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


def test_grad_flows_to_input():
    params = init_unet_params(jax.random.PRNGKey(0), TINY)
    # perturb the zero-init final conv so gradients are non-trivial
    params["out.2"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(2), params["out.2"]["w"].shape) * 0.01
    )

    def loss(x):
        out, feat = unet_apply(TINY, params, x, jnp.array([3]), feat_layer=1, remat=True)
        return jnp.sum(out ** 2) + jnp.sum(feat ** 2)

    g = jax.grad(loss)(jnp.ones((1, 16, 16, 6)))
    assert g.shape == (1, 16, 16, 6)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_param_count_published():
    """The published model is ~421M params (ADM-128 topology)."""
    cfg = UNetConfig()
    layout = build_layout(cfg)
    # count without materializing arrays
    total = 0

    def conv_n(k, cin, cout):
        return k * k * cin * cout + cout

    emb = cfg.model_channels * 4
    total += cfg.model_channels * emb + emb + emb * emb + emb
    for section in (layout.input_blocks, (layout.middle_block,), layout.output_blocks):
        for block in section:
            for l in block:
                if l.kind == "conv":
                    total += conv_n(3, l.in_ch, l.out_ch)
                elif l.kind == "res":
                    total += 2 * l.in_ch  # gn1
                    total += conv_n(3, l.in_ch, l.out_ch)
                    total += emb * 2 * l.out_ch + 2 * l.out_ch
                    total += 2 * l.out_ch  # gn2
                    total += conv_n(3, l.out_ch, l.out_ch)
                    if l.in_ch != l.out_ch:
                        total += conv_n(1, l.in_ch, l.out_ch)
                elif l.kind == "attn":
                    total += 2 * l.in_ch
                    total += l.in_ch * 3 * l.in_ch + 3 * l.in_ch
                    total += l.in_ch * l.in_ch + l.in_ch
                elif l.kind in ("downsample", "upsample"):
                    total += conv_n(3, l.in_ch, l.out_ch)
    total += 2 * layout.out_ch_final
    total += conv_n(3, layout.out_ch_final, cfg.out_channels)
    assert 3e8 < total < 9e8, total


def test_additive_emb_and_conv_resample_variants():
    """use_scale_shift_norm=False and conv_resample/resblock_updown=False must
    build and run (reference: unet.py:253-255, 100-140)."""
    import dataclasses

    for ssn, conv_rs in [(False, True), (True, False), (False, False)]:
        cfg = dataclasses.replace(
            TINY, use_scale_shift_norm=ssn, resblock_updown=False,
            conv_resample=conv_rs,
        )
        params = init_unet_params(jax.random.PRNGKey(0), cfg)
        out, _ = unet_apply(cfg, params, jnp.ones((1, 16, 16, 6)), jnp.array([3]))
        assert out.shape == (1, 16, 16, 12)
        assert np.isfinite(np.asarray(out)).all()
        # emb projection width follows the variant
        emb_w = params["input_blocks.1.0.emb_layers.1"]["w"]
        out_ch = TINY.model_channels
        expect = 2 * out_ch if ssn else out_ch
        assert emb_w.shape[1] == expect, (ssn, emb_w.shape)


def test_rescale_timesteps_and_xstart_adapter():
    from ishapediting_tpu.core.diffusion import (
        p_mean_variance,
        xstart_model_adapter,
    )
    from ishapediting_tpu.core.schedule import make_schedule, model_timesteps

    sched = make_schedule(100, "linear", "10", rescale_timesteps=True)
    ts = model_timesteps(sched, jnp.array([9]))
    assert ts.dtype == jnp.float32
    assert float(ts[0]) == pytest.approx(99 * 1000 / 100)

    # x0-prediction model == eps model after adaptation
    base = make_schedule(100, "linear", "")
    sched10 = make_schedule(100, "linear", "10")

    x0_const = 0.3

    def xstart_model(x, t_orig):
        out = jnp.concatenate(
            [jnp.full_like(x, x0_const), jnp.zeros_like(x)], axis=-1
        )
        return out, None

    adapted = xstart_model_adapter(base, xstart_model)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 6))
    out = p_mean_variance(sched10, adapted, x, jnp.array([5]), clip_denoised=False)
    np.testing.assert_allclose(
        np.asarray(out.pred_xstart), x0_const, atol=1e-5
    )

    # same identity with rescale_timesteps=True and base_steps != 1000: the
    # model receives t_orig * 10.0 as float — the adapter must invert the
    # rescale before gathering base coefficients (a raw astype(int32) would
    # clamp the out-of-bounds gather to the last entry, silently using the
    # final step's coefficients for nearly every step)
    base_r = make_schedule(100, "linear", "", rescale_timesteps=True)
    sched10_r = make_schedule(100, "linear", "10", rescale_timesteps=True)
    adapted_r = xstart_model_adapter(base_r, xstart_model)
    out_r = p_mean_variance(
        sched10_r, adapted_r, x, jnp.array([5]), clip_denoised=False
    )
    np.testing.assert_allclose(
        np.asarray(out_r.pred_xstart), x0_const, atol=1e-5
    )
