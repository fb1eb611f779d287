"""Pallas -> Mosaic TPU *lowering* regression guard (no hardware needed).

``jax.export.export(..., platforms=['tpu'])`` lowers the real (non-interpret)
Pallas kernels through the Mosaic pipeline on a host with no TPU device.
This does NOT validate Mosaic layout legality — CLAUDE.md records that an
intentionally-illegal sublane extent still lowers cleanly — but it catches
lowering-time breakage early: bad primitive usage inside kernels, kernel
signature shape/dtype mismatches, ops unsupported on the TPU path.  The
reference's analogue is its CUDA extension either building or not
(reference README.md:69-71 installs the submodules); this is the CI-runnable
TPU-build counterpart.

Kept OUT of interpret mode on purpose: the rest of the suite runs
SKYFALL_INTERPRET=1, which would swap the kernels for the interpreter and
make the export vacuous.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import _make_state_and_camera


@pytest.fixture
def no_interpret(monkeypatch):
    # _interpret_default() reads the env at call time, so flipping it here
    # routes composite_tiled through the real Mosaic lowering.
    monkeypatch.setenv("SKYFALL_INTERPRET", "0")


def _export_tpu(fn, *args):
    exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)
    # The serialized artifact must contain the Mosaic custom calls — i.e.
    # the Pallas kernels actually went through the TPU path, not a fallback.
    text = exp.mlir_module()
    assert "tpu_custom_call" in text, "no Mosaic custom call in TPU export"
    return exp


def test_forward_render_lowers_for_tpu(no_interpret):
    state, cam = _make_state_and_camera(n_points=512, size=64)
    bg = jnp.zeros(3)

    from skyfall_gs_tpu.model.render import render

    def fn(state, camera, bg):
        return render(state, camera, bg, kernel_size=0.1,
                      backend="tiled").color

    _export_tpu(fn, state, cam, bg)


def test_train_step_lowers_for_tpu(no_interpret):
    """Full production step: forward + backward kernels + Adam update."""
    from skyfall_gs_tpu.config import OptimizationConfig
    from skyfall_gs_tpu.train.step import _build_step_fn, init_train_state

    size = 64
    state, cam = _make_state_and_camera(n_points=512, size=size)
    ts = init_train_state(state)
    step = _build_step_fn(OptimizationConfig(), use_depth=True)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (size, size, 3)), jnp.float32)
    mask = jnp.ones((size, size), jnp.float32)
    depth = jnp.ones((size, size), jnp.float32)
    _export_tpu(step, ts, cam, img, mask, depth, jnp.zeros(3),
                jax.random.PRNGKey(0), jnp.float32(1e-4), jnp.float32(0.01))
