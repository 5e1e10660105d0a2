"""Fixed-seed edit-effect regression gate.

Loads the committed known-good toy instance (tests/assets/edit_gate.npz,
built by tools/make_edit_gate_asset.py) and re-runs the SAME fixed-seed
drag (noise mode / cof / scale recorded in the asset) it was validated
with. Asserts the drag actually
moves the +x pole by a minimum displacement AND stays local (occupancy IoU
outside the handle/target balls). This turns guidance effectiveness — the
composed trajectory, not just the loss math covered by
test_reference_parity.py::test_drag_losses_parity — into a deterministic CI
assertion; a regression that halves the guidance effect fails here
(reference behavior: drag_utils.py:302-399).

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


def test_fixed_seed_drag_displacement_and_locality(gate_engine):
    from tools.make_edit_gate_asset import locality_iou

    engine, npz = gate_engine
    eval_seed = int(npz["eval_seed"])
    scale = float(npz["scale"])
    cof = float(npz["cof"]) if "cof" in npz.files else 1.0
    mode = str(npz["noise_mode"]) if "noise_mode" in npz.files else "replay"
    achieved = float(npz["achieved_delta"])

    engine.latent_inversion(jnp.asarray(npz["latent0"][None]), seed=eval_seed)
    original = engine.mesh0
    ox = original.vertices[:, 0]
    handle = original.vertices[np.argmax(ox)].astype(np.float32)
    target = handle + np.array([0.25, 0, 0], np.float32)

    edited = engine.drag_edit(
        handle[None], target[None], scale=scale, cof=cof,
        seed=eval_seed, chunk=4, noise_mode=mode,
    )
    assert len(edited.vertices) > 0, "edit produced an empty mesh"
    delta = float(edited.vertices[:, 0].max() - ox.max())
    loc = locality_iou(original, edited, handle, target)

    # gate at 60% of the recorded displacement (cross-XLA fp drift margin);
    # a regression that halves effectiveness still fails
    assert delta >= 0.6 * achieved, (
        f"drag displacement regressed: {delta:+.3f} vs recorded "
        f"{achieved:+.3f} (gate {0.6 * achieved:+.3f})"
    )
    assert loc >= 0.70, f"edit not local: IoU outside handle region {loc:.3f}"
