"""Golden numerical parity vs the actual reference PyTorch implementation.

These tests import the reference code at /root/reference (read-only) and
compare it against our JAX rebuild on identical inputs and identical
(converted) weights — the checkpoint-fidelity story of SURVEY.md §7.3:

- UNet forward + inter_feat tap for several feat_layer values
  (reference: unet.py:396-671; converter: io/torch_convert.py)
- SpacedDiffusion coefficient arrays bit-compared against core/schedule.py
  (reference: gaussian_diffusion.py:133-169, respace.py:62-112)
- one ``p_sample_guidance`` step with injected noise, and the variance /
  variance_noise override modes (reference: gaussian_diffusion.py:446-510)
- full ``ddpm_inversion`` record with the reference's RNG monkeypatched to
  replay our forward-chain noises (reference: gaussian_diffusion.py:512-532)
- ``grid_sample_2d`` vs ``F.grid_sample`` including out-of-range points
  (reference usage: axisnetworks.py:537-544, drag_utils.py:355-358)
- ``regroup_features`` vs ``resize_feat_align`` (reference:
  drag_utils.py:141-159) on both channel-divisibility branches
- the full MultiTriplane occupancy decoder vs ``decode_points`` /
  ``decode_grid`` on converted weights (reference: axisnetworks.py:517-562)
"""

import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/reference/neural_field_diffusion")

from guided_diffusion import gaussian_diffusion as ref_gd  # noqa: E402
from guided_diffusion.respace import (  # noqa: E402
    SpacedDiffusion as RefSpacedDiffusion,
    space_timesteps as ref_space_timesteps,
)
from guided_diffusion.unet import UNetModel as RefUNetModel  # noqa: E402

from ishapediting_tpu.config import UNetConfig
from ishapediting_tpu.core.diffusion import ddpm_inversion, p_sample_guidance
from ishapediting_tpu.core.schedule import make_schedule, space_timesteps
from ishapediting_tpu.edit.features import regroup_features
from ishapediting_tpu.io.torch_convert import (
    convert_decoder_state_dict,
    convert_torch_state_dict,
)
from ishapediting_tpu.models.unet import unet_apply
from ishapediting_tpu.ops.grid_sample import grid_sample_2d
from ishapediting_tpu.ops.triplane import decode_grid, decode_points

torch.manual_seed(0)

# Small-but-real topology: 3 levels, attention on two of them, 9 output
# blocks, every channel count a multiple of 32 so torch GroupNorm(32, c)
# accepts it (reference: nn.py:92-99).
CFG = UNetConfig(
    image_size=16,
    in_channels=6,
    out_channels=12,
    model_channels=32,
    num_res_blocks=2,
    attention_ds=(2, 4),
    channel_mult=(1, 2, 4),
    num_heads=4,
    num_head_channels=32,
    dropout=0.0,
    compute_dtype="float32",
)


def _make_ref_unet() -> RefUNetModel:
    model = RefUNetModel(
        image_size=CFG.image_size,
        in_channels=CFG.in_channels,
        model_channels=CFG.model_channels,
        out_channels=CFG.out_channels,
        num_res_blocks=CFG.num_res_blocks,
        attention_resolutions=tuple(CFG.attention_ds),
        dropout=0.0,
        channel_mult=CFG.channel_mult,
        num_classes=None,
        use_checkpoint=False,
        use_fp16=False,
        num_heads=CFG.num_heads,
        num_head_channels=CFG.num_head_channels,
        num_heads_upsample=-1,
        use_scale_shift_norm=CFG.use_scale_shift_norm,
        resblock_updown=CFG.resblock_updown,
        use_new_attention_order=False,
    )
    model.eval()
    return model


@pytest.fixture(scope="module")
def ref_unet():
    return _make_ref_unet()


@pytest.fixture(scope="module")
def jax_params(ref_unet):
    return convert_torch_state_dict(ref_unet.state_dict())


def _to_nhwc(x: torch.Tensor) -> np.ndarray:
    return x.detach().numpy().transpose(0, 2, 3, 1)


def test_state_dict_key_vocabulary(ref_unet, jax_params):
    """The converter must cover the reference key set exactly — a missing or
    extra module means a layout mismatch."""
    ref_prefixes = {k.rsplit(".", 1)[0] for k in ref_unet.state_dict().keys()}
    assert set(jax_params.keys()) == ref_prefixes


@pytest.mark.parametrize("feat_layer", [4, 7, 8])
def test_unet_forward_and_feature_tap_parity(ref_unet, jax_params, feat_layer):
    """Forward output AND the inter_feat tap must match the reference to fp32
    tolerance on identical converted weights (reference: unet.py:634-671)."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, CFG.in_channels, 16, 16)).astype(np.float32)
    t = np.array([37, 911], dtype=np.int64)

    with torch.no_grad():
        ref_out, ref_feat = ref_unet(
            torch.from_numpy(x), torch.from_numpy(t), feat_layer=feat_layer
        )

    out, feat = unet_apply(
        CFG,
        jax_params,
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(t),
        feat_layer=feat_layer,
    )
    np.testing.assert_allclose(
        np.asarray(out), _to_nhwc(ref_out), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(feat), _to_nhwc(ref_feat), rtol=1e-4, atol=1e-4
    )


def _make_ref_diffusion(base: int, respacing: str) -> RefSpacedDiffusion:
    # the reference factory substitutes [steps] for an empty respacing
    # (script_util.py:399-401); space_timesteps itself rejects ""
    return RefSpacedDiffusion(
        use_timesteps=ref_space_timesteps(base, respacing or [base]),
        betas=ref_gd.get_named_beta_schedule("linear", base),
        model_mean_type=ref_gd.ModelMeanType.EPSILON,
        model_var_type=ref_gd.ModelVarType.LEARNED_RANGE,
        loss_type=ref_gd.LossType.MSE,
        rescale_timesteps=False,
    )


@pytest.mark.parametrize(
    "base,respacing", [(1000, "200"), (1000, "ddim50"), (100, "10"), (1000, "")]
)
def test_schedule_coefficient_parity(base, respacing):
    """Every coefficient array must equal the reference's float64 value cast
    to fp32 — bit-exact (reference: gaussian_diffusion.py:133-169,
    respace.py:62-112)."""
    ref = _make_ref_diffusion(base, respacing)
    ours = make_schedule(base, "linear", respacing)

    assert ours.num_timesteps == ref.num_timesteps
    assert list(np.asarray(ours.timestep_map)) == list(ref.timestep_map)
    if respacing:
        assert space_timesteps(base, respacing) == ref_space_timesteps(
            base, respacing
        )

    pairs = [
        (ours.betas, ref.betas),
        (ours.alphas_cumprod, ref.alphas_cumprod),
        (ours.alphas_cumprod_prev, ref.alphas_cumprod_prev),
        (ours.alphas_cumprod_next, ref.alphas_cumprod_next),
        (ours.sqrt_alphas_cumprod, ref.sqrt_alphas_cumprod),
        (
            ours.sqrt_one_minus_alphas_cumprod,
            ref.sqrt_one_minus_alphas_cumprod,
        ),
        (ours.sqrt_recip_alphas_cumprod, ref.sqrt_recip_alphas_cumprod),
        (ours.sqrt_recipm1_alphas_cumprod, ref.sqrt_recipm1_alphas_cumprod),
        (ours.posterior_variance, ref.posterior_variance),
        (
            ours.posterior_log_variance_clipped,
            ref.posterior_log_variance_clipped,
        ),
        (ours.posterior_mean_coef1, ref.posterior_mean_coef1),
        (ours.posterior_mean_coef2, ref.posterior_mean_coef2),
        (ours.log_betas, np.log(ref.betas)),
    ]
    for ours_arr, ref_arr in pairs:
        np.testing.assert_array_equal(
            np.asarray(ours_arr), np.asarray(ref_arr, dtype=np.float32)
        )


class _Guidance:
    """Shared tiny model + schedule for the step/inversion parity tests."""

    def __init__(self, ref_unet, jax_params):
        self.ref_unet = ref_unet
        self.jax_params = jax_params
        self.ref_diff = _make_ref_diffusion(100, "10")
        self.sched = make_schedule(100, "linear", "10")
        self.feat_layer = 7

    def model_fn(self, x, t_orig):
        return unet_apply(
            CFG, self.jax_params, x, t_orig, feat_layer=self.feat_layer
        )


@pytest.fixture(scope="module")
def guid(ref_unet, jax_params):
    return _Guidance(ref_unet, jax_params)


@pytest.mark.parametrize("t_step", [0, 4, 9])
def test_p_sample_guidance_step_parity(guid, t_step):
    """One guidance step with injected noise: sample/mean/variance/
    pred_xstart/inter_feat all match (reference: gaussian_diffusion.py:446-510).
    Includes t=0 (the nonzero_mask edge)."""
    rng = np.random.default_rng(2 + t_step)
    x = rng.standard_normal((1, CFG.in_channels, 16, 16)).astype(np.float32)
    noise = rng.standard_normal(x.shape).astype(np.float32)
    t_t = torch.tensor([t_step])

    with torch.no_grad():
        ref = guid.ref_diff.p_sample_guidance(
            guid.ref_unet,
            torch.from_numpy(x),
            t_t,
            noise=torch.from_numpy(noise),
            clip_denoised=True,
            feat_layer=guid.feat_layer,
        )

    ours = p_sample_guidance(
        guid.sched,
        guid.model_fn,
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.full((1,), t_step, jnp.int32),
        noise=jnp.asarray(noise.transpose(0, 2, 3, 1)),
    )
    for key in ("sample", "mean", "variance", "pred_xstart"):
        np.testing.assert_allclose(
            np.asarray(ours[key]),
            _to_nhwc(ref[key]),
            rtol=1e-4,
            atol=1e-4,
            err_msg=key,
        )
    np.testing.assert_allclose(
        np.asarray(ours["inter_feat"]),
        _to_nhwc(ref["inter_feat"]),
        rtol=1e-4,
        atol=1e-4,
    )


def test_p_sample_guidance_override_modes_parity(guid):
    """The fixed-``variance`` and fixed-``variance_noise`` override paths
    (case-1 edit mode / exact replay; reference: gaussian_diffusion.py:500-510)."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal((1, CFG.in_channels, 16, 16)).astype(np.float32)
    noise = rng.standard_normal(x.shape).astype(np.float32)
    var = np.abs(rng.standard_normal(x.shape).astype(np.float32)) * 0.01
    vnoise = rng.standard_normal(x.shape).astype(np.float32) * 0.1
    t_t = torch.tensor([5])
    t_j = jnp.full((1,), 5, jnp.int32)
    x_j = jnp.asarray(x.transpose(0, 2, 3, 1))

    with torch.no_grad():
        ref_var = guid.ref_diff.p_sample_guidance(
            guid.ref_unet,
            torch.from_numpy(x),
            t_t,
            noise=torch.from_numpy(noise),
            variance=torch.from_numpy(var),
            feat_layer=guid.feat_layer,
        )
        ref_vn = guid.ref_diff.p_sample_guidance(
            guid.ref_unet,
            torch.from_numpy(x),
            t_t,
            variance_noise=torch.from_numpy(vnoise),
            feat_layer=guid.feat_layer,
        )

    ours_var = p_sample_guidance(
        guid.sched,
        guid.model_fn,
        x_j,
        t_j,
        noise=jnp.asarray(noise.transpose(0, 2, 3, 1)),
        variance=jnp.asarray(var.transpose(0, 2, 3, 1)),
    )
    ours_vn = p_sample_guidance(
        guid.sched,
        guid.model_fn,
        x_j,
        t_j,
        variance_noise=jnp.asarray(vnoise.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(ours_var["sample"]), _to_nhwc(ref_var["sample"]),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ours_vn["sample"]), _to_nhwc(ref_vn["sample"]),
        rtol=1e-4, atol=1e-4,
    )


def test_ddpm_inversion_parity(guid, monkeypatch):
    """Full inversion record parity. The reference draws forward-chain noise
    from torch's global RNG (gaussian_diffusion.py:517-523); we monkeypatch
    ``th.randn_like`` to replay the exact noises our JAX forward chain uses,
    then compare every recorded list (variance_noise, variance, inter_feat)
    and the replayed sample."""
    steps = 8
    rng_key = jax.random.PRNGKey(3)
    rng = np.random.default_rng(11)
    x0 = rng.standard_normal((1, CFG.in_channels, 16, 16)).astype(np.float32)
    x0_nhwc = x0.transpose(0, 2, 3, 1)

    ours = ddpm_inversion(
        guid.sched,
        guid.model_fn,
        jnp.asarray(x0_nhwc),
        rng_key,
        steps=steps,
        feat_postprocess=lambda f: f,
        chunk=3,  # deliberately not a divisor of steps: covers the pad path
    )

    # The exact noises our forward chain drew (core/diffusion.py fwd_step).
    noises = [
        np.asarray(
            jax.random.normal(
                jax.random.fold_in(rng_key, t), x0_nhwc.shape, jnp.float32
            )
        ).transpose(0, 3, 1, 2)
        for t in range(steps)
    ]
    # The reference's backward loop draws (and discards) one extra randn_like
    # per step inside p_sample_guidance; only the first ``steps`` forward-chain
    # draws affect the recorded outputs, so later calls return zeros.
    queue = list(noises)

    def fake_randn_like(x):
        if queue:
            return torch.from_numpy(queue.pop(0).copy())
        return torch.zeros_like(x)

    monkeypatch.setattr(torch, "randn_like", fake_randn_like)
    with torch.no_grad():
        ref = guid.ref_diff.ddpm_inversion(
            guid.ref_unet,
            torch.from_numpy(x0),
            steps,
            feat_layer=guid.feat_layer,
        )

    np.testing.assert_allclose(
        np.asarray(ours["latent"]), _to_nhwc(ref["latent"]), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours["sample"]), _to_nhwc(ref["sample"]), rtol=1e-4, atol=1e-4
    )
    # Lists are recorded t descending on both sides.
    for k in range(steps):
        np.testing.assert_allclose(
            np.asarray(ours["variance_noise"][k]),
            _to_nhwc(ref["variance_noise"][k]),
            rtol=1e-4,
            atol=1e-4,
            err_msg=f"variance_noise[{k}]",
        )
        np.testing.assert_allclose(
            np.asarray(ours["variances"][k]),
            _to_nhwc(ref["variance"][k]),
            rtol=1e-4,
            atol=1e-4,
            err_msg=f"variance[{k}]",
        )
        np.testing.assert_allclose(
            np.asarray(ours["features"][k]),
            _to_nhwc(ref["inter_feat"][k]),
            rtol=1e-4,
            atol=1e-4,
            err_msg=f"inter_feat[{k}]",
        )


@pytest.mark.parametrize("align_corners", [True, False])
def test_grid_sample_parity(align_corners):
    """Bilinear grid sampling vs F.grid_sample, zeros padding, including
    out-of-range and exactly-on-edge points (reference usage:
    axisnetworks.py:537-544, drag_utils.py:355-358)."""
    rng = np.random.default_rng(5)
    feat = rng.standard_normal((2, 7, 5, 3)).astype(np.float32)
    grid = rng.uniform(-1.4, 1.4, size=(2, 11, 13, 2)).astype(np.float32)
    grid[0, 0, 0] = [-1.0, -1.0]
    grid[0, 0, 1] = [1.0, 1.0]
    grid[1, 0, 0] = [0.0, 0.0]

    ref = torch.nn.functional.grid_sample(
        torch.from_numpy(feat.transpose(0, 3, 1, 2)),
        torch.from_numpy(grid),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=align_corners,
    )
    ours = grid_sample_2d(
        jnp.asarray(feat), jnp.asarray(grid), align_corners=align_corners
    )
    np.testing.assert_allclose(
        np.asarray(ours),
        ref.numpy().transpose(0, 2, 3, 1),
        rtol=1e-5,
        atol=1e-5,
    )


def _ref_resize_feat_align(feature: torch.Tensor, cat_var: bool = True):
    """Verbatim call into the reference function (drag_utils.py:141-159);
    imported lazily because drag_utils parses argv at import time."""
    batch_num, channel_num = feature.shape[:2]
    assert not channel_num % 2
    channel_num = int(channel_num / 2)
    feature_mean, feature_var = torch.split(feature, channel_num, dim=1)
    if channel_num % 3:
        expect_num = channel_num - channel_num % 3
        feature_mean = feature_mean.permute(2, 3, 0, 1)
        feature_mean = torch.nn.functional.interpolate(
            feature_mean, (batch_num, expect_num)
        ).permute(2, 3, 0, 1)
        feature_var = feature_var.permute(2, 3, 0, 1)
        feature_var = torch.nn.functional.interpolate(
            feature_var, (batch_num, expect_num)
        ).permute(2, 3, 0, 1)
    if cat_var:
        return torch.cat(
            (
                feature_mean.reshape(3, -1, feature_mean.shape[2], feature_mean.shape[3]),
                feature_var.reshape(3, -1, feature_mean.shape[2], feature_mean.shape[3]),
            ),
            dim=1,
        ).type(torch.float32)
    return feature_mean.reshape(
        3, -1, feature_mean.shape[2], feature_mean.shape[3]
    ).type(torch.float32)


@pytest.mark.parametrize("channels,cat_var", [(512, True), (48, True), (512, False), (16, True)])
def test_regroup_features_vs_resize_feat_align(channels, cat_var):
    """Channel regroup parity on both divisibility branches: 512 -> 256%3=1
    (the published feat_layer=8 shape, hits the nearest-interpolate), 48 ->
    24%3=0 (no resize), 16 -> 8%3=2."""
    rng = np.random.default_rng(6)
    s = 8
    feat = rng.standard_normal((1, channels, s, s)).astype(np.float32)

    ref = _ref_resize_feat_align(torch.from_numpy(feat), cat_var=cat_var)
    ours = regroup_features(
        jnp.asarray(feat.transpose(0, 2, 3, 1)), cat_var=cat_var
    )  # [B, 3, s, s, C'']
    np.testing.assert_allclose(
        np.asarray(ours[0]).transpose(0, 3, 1, 2),
        ref.numpy(),
        rtol=1e-5,
        atol=1e-5,
    )


def _make_ref_decoder():
    sys.path.insert(0, "/root/reference/triplane_decoder")
    from axisnetworks import MultiTriplane  # noqa: E402

    torch.manual_seed(42)
    model = MultiTriplane(1, input_dim=3, output_dim=1, device="cpu")
    # smaller planes for speed; channel count (32) fixed by the Fourier layer
    model.embeddings = [torch.randn(1, 32, 24, 24) * 0.3 for _ in range(3)]
    model.eval()
    return model


def test_multitriplane_decoder_parity():
    """Converted decoder weights + planes: decode_points must match the
    reference MultiTriplane forward (reference: axisnetworks.py:517-562),
    and decode_grid's separable-resize redesign must agree with per-point
    evaluation of the same dense lattice."""
    model = _make_ref_decoder()
    dec = convert_decoder_state_dict(model.net.state_dict())
    planes = jnp.stack(
        [jnp.asarray(e[0].numpy().transpose(1, 2, 0)) for e in model.embeddings]
    )  # [3, H, W, C]

    rng = np.random.default_rng(8)
    coords = rng.uniform(-1, 1, size=(1, 700, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model(0, torch.from_numpy(coords)).numpy()
    ours = decode_points(dec, planes, jnp.asarray(coords[0]))
    np.testing.assert_allclose(np.asarray(ours), ref[0], rtol=2e-4, atol=2e-4)

    # dense-grid path vs the reference on the same lattice
    res = 16
    lin = np.linspace(-1, 1, res, dtype=np.float32)
    gx, gy, gz = np.meshgrid(lin, lin, lin, indexing="ij")
    pts = np.stack([gx, gy, gz], axis=-1).reshape(1, -1, 3)
    with torch.no_grad():
        ref_grid = model(0, torch.from_numpy(pts)).numpy().reshape(res, res, res)
    ours_grid = decode_grid(
        dec, planes, res=res, chunk=4, compute_dtype=jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(ours_grid), ref_grid, rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("loss_type", ["l2", "l1"])
def test_drag_losses_parity(loss_type):
    """Full drag-edit loss (motion + complement-mask regularization) vs a
    torch transcription of the reference's training loop internals
    (drag_utils.py:315-384): neighborhood projection, plane grid_sample,
    set-arithmetic masks, and the exact normalization constants — the whole
    loss-level composition in one check."""
    import torch.nn.functional as F

    from ishapediting_tpu.edit.drag import build_drag_problem, drag_losses

    rng = np.random.default_rng(11)
    s, C, B, r1 = 16, 9, 2, 2
    voxel = 2.0 / s
    origin = rng.standard_normal((3, C, s, s)).astype(np.float32)
    edit = rng.standard_normal((3, C, s, s)).astype(np.float32)
    sources = rng.uniform(-0.6, 0.6, (B, 3)).astype(np.float32)
    targets = (sources + rng.uniform(-0.25, 0.25, (B, 3))).astype(np.float32)

    # --- reference composition, torch -------------------------------------
    so, ta = torch.tensor(sources), torch.tensor(targets)
    p = torch.arange(-r1, r1 + 1)
    px, py, pz = torch.meshgrid(p, p, p, indexing="ij")
    offs = torch.stack(
        [px.reshape(-1), py.reshape(-1), pz.reshape(-1)], dim=-1
    ).float()  # make_offsets (drag_utils.py:134-138)
    patch_pnt = so.unsqueeze(1) + voxel * offs.unsqueeze(0)  # B*N1*3
    shift_pnt = ta.unsqueeze(1) + voxel * offs.unsqueeze(0)

    def to_grid(pnt):  # drag_utils.py:318-321
        return torch.cat(
            (
                pnt[..., :2].unsqueeze(0),
                pnt[..., 1:].unsqueeze(0),
                pnt[..., :3:2].unsqueeze(0),
            ),
            dim=0,
        )  # 3*B*N1*2

    patch_grid = to_grid(patch_pnt)
    shift_grid = to_grid(shift_pnt)

    # complement masks via literal set arithmetic (drag_utils.py:322-334)
    patch_int = torch.round((patch_pnt + 1) * (s - 1) / 2).to(torch.int16).reshape(-1, 3)
    shift_int = torch.round((shift_pnt + 1) * (s - 1) / 2).to(torch.int16).reshape(-1, 3)
    content = torch.cat((patch_int, shift_int), dim=0)
    pr = torch.arange(0, s).type(torch.int16)
    gx, gy = torch.meshgrid(pr, pr, indexing="ij")
    total = set(
        tuple(i)
        for i in torch.stack([gx.reshape(-1), gy.reshape(-1)], dim=-1).tolist()
    )
    masks_idx = []
    for cols in ([1, 0], [2, 1], [2, 0]):
        kept = total - set(tuple(i) for i in content[:, cols].tolist())
        masks_idx.append(torch.tensor(sorted(kept)))
    o_t, e_t = torch.tensor(origin), torch.tensor(edit)
    patch_feature = F.grid_sample(
        o_t, patch_grid, mode="bilinear", padding_mode="zeros", align_corners=True
    )  # 3*C*B*N1
    shift_feature = F.grid_sample(
        e_t, shift_grid, mode="bilinear", padding_mode="zeros", align_corners=True
    )
    n_mask = sum(m.shape[0] for m in masks_idx)
    diffs = [
        e_t[k, :, masks_idx[k][:, 0], masks_idx[k][:, 1]]
        - o_t[k, :, masks_idx[k][:, 0], masks_idx[k][:, 1]]
        for k in range(3)
    ]
    if loss_type == "l1":
        ref_motion = F.l1_loss(shift_feature, patch_feature).item()
        ref_mask = (sum(d.abs().sum() for d in diffs) / (C * n_mask)).item()
    else:
        ref_motion = (
            ((shift_feature.reshape(-1) - patch_feature.reshape(-1)) ** 2)
            .mean()
            .item()
        )
        ref_mask = (sum((d**2).sum() for d in diffs) / (C * n_mask)).item()

    # --- ours --------------------------------------------------------------
    problem = build_drag_problem(
        sources, targets, r1=r1, voxel_size=voxel, feat_width=s
    )
    origin_nhwc = jnp.asarray(origin.transpose(0, 2, 3, 1))
    edit_nhwc = jnp.asarray(edit.transpose(0, 2, 3, 1))
    motion, mask = drag_losses(edit_nhwc, origin_nhwc, problem, loss_type)
    np.testing.assert_allclose(float(motion), ref_motion, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(mask), ref_mask, rtol=1e-5, atol=1e-6)
