"""Fixed-seed edit-effect regression gate.

Loads the committed known-good toy instance (tests/assets/edit_gate.npz,
built by tools/make_edit_gate_asset.py) and re-runs the SAME fixed-seed
deterministic replay-mode drag it was validated with, plus the scale-0
replay of the same trajectory. Gates on *guidance-loss improvement*: the
guided trajectory must end with a materially lower motion loss than the
unguided replay (the asset records a +44.7% reduction; the gate requires
half of it). This turns guidance effectiveness — the composed trajectory,
not just the loss math covered by
test_reference_parity.py::test_drag_losses_parity — into a deterministic CI
assertion: a sign flip, scale/cof wiring bug, or feature-tap/regroup
breakage all erase the reduction (reference behavior:
drag_utils.py:302-399).

Why loss-based rather than displacement-based: the surface displacement a
given reduction induces depends on the high-variance toy prior
(docs/PERF.md "Instance variance"), but "guidance drives the motion loss
down" is a property of the guidance code itself. Displacement/locality are
still asserted loosely as sanity bounds.

Thresholds sit well below the recorded achieved values to absorb cross-XLA
floating-point drift while still catching any real effectiveness loss.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

ASSET = os.path.join(os.path.dirname(__file__), "assets", "edit_gate.npz")

pytestmark = pytest.mark.slow


def _unflatten(npz, base):
    out = {}
    for key in npz.files:
        if not key.startswith(base + "::"):
            continue
        node = out
        parts = key.split("::")[1:]
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(npz[key])
    return out


@pytest.fixture(scope="module")
def gate_engine():
    if not os.path.exists(ASSET):
        pytest.skip("edit_gate.npz asset not built")
    # single source of truth for the toy pipeline config: the asset builder
    from tools.make_edit_gate_asset import _engine_from_parts

    npz = np.load(ASSET)
    engine = _engine_from_parts(
        _unflatten(npz, "ema"),
        _unflatten(npz, "dec"),
        npz["half_range"],
        npz["middle"],
    )
    return engine, npz


def test_fixed_seed_guidance_reduces_motion_loss(gate_engine):
    from tools.make_edit_gate_asset import locality_iou

    engine, npz = gate_engine
    eval_seed = int(npz["eval_seed"])
    scale = float(npz["scale"])
    cof = float(npz["cof"])
    achieved_reduction = float(npz["achieved_reduction"])
    achieved_motion0 = float(npz["achieved_motion0"])
    achieved_iou = float(npz["achieved_iou"])

    engine.latent_inversion(jnp.asarray(npz["latent0"][None]), seed=eval_seed)
    original = engine.mesh0
    assert len(original.vertices) > 0, "inversion replay produced empty mesh"
    ox = original.vertices[:, 0]
    handle = original.vertices[np.argmax(ox)].astype(np.float32)
    target = handle + np.array([0.25, 0, 0], np.float32)

    # baseline: scale-0 replay = the unguided trajectory
    engine.drag_edit(
        handle[None], target[None], scale=0.0, cof=0.0,
        seed=eval_seed, chunk=4, noise_mode="replay",
    )
    motion0 = float(engine.last_drag_losses["motion"][-1])
    # the baseline itself must reproduce (loose: platform fp drift only)
    assert motion0 == pytest.approx(achieved_motion0, rel=0.10), (
        f"scale-0 baseline motion loss drifted: {motion0:.4f} vs recorded "
        f"{achieved_motion0:.4f}"
    )

    edited = engine.drag_edit(
        handle[None], target[None], scale=scale, cof=cof,
        seed=eval_seed, chunk=4, noise_mode="replay",
    )
    motion = float(engine.last_drag_losses["motion"][-1])
    reduction = 1.0 - motion / motion0

    # gate at 50% of the recorded reduction (cross-XLA fp drift margin);
    # a regression that halves guidance effectiveness still fails, and a
    # sign/wiring bug (reduction <= 0) fails loudly
    assert reduction >= 0.5 * achieved_reduction, (
        f"guidance effectiveness regressed: motion {motion0:.4f}->{motion:.4f} "
        f"(reduction {reduction:+.1%} vs recorded {achieved_reduction:+.1%}, "
        f"gate {0.5 * achieved_reduction:+.1%})"
    )

    # sanity bounds on the decoded result: non-empty and not glaringly global
    assert len(edited.vertices) > 0, "edit produced an empty mesh"
    loc = locality_iou(original, edited, handle, target)
    assert loc >= 0.6 * achieved_iou, (
        f"edit turned global: IoU outside handle region {loc:.3f} vs "
        f"recorded {achieved_iou:.3f}"
    )


def test_multi_handle_guidance(gate_engine):
    """TWO-handle drag gate (reference supports K handles,
    drag_utils.py:302-399): per-handle masking/broadcast bugs don't show in
    the single-handle test. Recorded (round 5, tools/bench_quality.py::
    multi_handle_metrics): reduction +0.102, locality 0.788 at 2x the
    asset scale; gates at ~half."""
    from tools.bench_quality import multi_handle_metrics

    engine, npz = gate_engine
    m = multi_handle_metrics(
        engine, jnp.asarray(npz["latent0"][None]), int(npz["eval_seed"]),
        float(npz["scale"]), float(npz["cof"]),
    )
    assert m["edited_nonempty"], "multi-handle edit produced an empty mesh"
    assert m["motion_loss_reduction"] >= 0.05, (
        f"multi-handle guidance regressed: {m['motion_loss_reduction']:+.3f} "
        "(recorded +0.102)"
    )
    assert m["locality_iou"] >= 0.5, (
        f"multi-handle edit turned global: locality {m['locality_iou']:.3f} "
        "(recorded 0.788)"
    )


def test_fit_invert_drag_flagship_path(gate_engine):
    """Full real-shape flagship path: fit(mesh) -> invert -> drag on the
    FITTED latent (reference drag_utils.py:401-471 -> :302-399), asserting
    reconstruction CD/IoU and post-fit edit effectiveness/locality.
    Recorded (round 5, tools/bench_quality.py::fit_path_metrics): fit_cd
    0.0292, fit_iou 0.271, reduction +0.059, locality 0.250; gates at
    ~half (the fitted latent sits further off-manifold than a prior
    sample — see the metrics docstring)."""
    from tools.bench_quality import fit_path_metrics

    engine, npz = gate_engine
    m = fit_path_metrics(
        engine, jnp.asarray(npz["latent0"][None]), int(npz["eval_seed"]),
        float(npz["scale"]), float(npz["cof"]),
    )
    assert m["fit_cd"] <= 0.06, f"fit reconstruction CD {m['fit_cd']} too high"
    assert m["fit_iou"] >= 0.15, f"fit reconstruction IoU {m['fit_iou']} too low"
    assert m["edited_nonempty"], "post-fit edit produced an empty mesh"
    assert m["motion_loss_reduction"] >= 0.02, (
        f"post-fit guidance regressed: {m['motion_loss_reduction']:+.3f} "
        "(recorded +0.059)"
    )
    assert m["locality_iou"] >= 0.1, (
        f"post-fit edit locality {m['locality_iou']:.3f} (recorded 0.250)"
    )
