"""Tests for aux subsystems: profiling counters, checkpoint/resume, CLI."""

import subprocess
import sys

import numpy as np
import jax
import optax

from raytracingproject_tpu.camera import Camera
from raytracingproject_tpu.render import render
from raytracingproject_tpu.scene import make_minimal_scene
from raytracingproject_tpu.utils.checkpoint import (
    render_checkpointed,
    save_training_state,
    load_training_state,
)
from raytracingproject_tpu.utils.profiling import RaysPerSecond, device_memory_stats
from raytracingproject_tpu.grad.inverse import extract_params


def small_camera(spp=16):
    return Camera(
        aspect_ratio=1.0,
        image_width=32,
        samples_per_pixel=spp,
        max_depth=4,
        vfov=60.0,
        lookfrom=(0.0, 0.0, 2.0),
        lookat=(0.0, 0.0, -1.0),
        defocus_angle=0.0,
    )


def test_rays_per_second_meter():
    m = RaysPerSecond()
    m.start()
    rate = m.stop(1000)
    assert rate > 0 and m.total_rays == 1000
    assert m.average > 0


def test_device_memory_stats():
    stats = device_memory_stats()
    assert len(stats) == 8  # CPU test mesh
    assert all("platform" in s for s in stats)


def test_render_checkpoint_resume(tmp_path):
    """A render interrupted mid-way must resume and produce the same image
    as an uninterrupted one (same keys per sample chunk)."""
    scene = make_minimal_scene()
    cam = small_camera(spp=12)
    key = jax.random.PRNGKey(7)
    ck = tmp_path / "acc.npz"

    from raytracingproject_tpu.config import RenderSettings

    # force chunking: rays_per_batch < pixels*spp => several chunks
    settings = RenderSettings(rays_per_batch=32 * 32 * 4)

    full = render_checkpointed(scene, cam, key, ck, settings)
    assert not ck.exists()  # cleaned up on completion

    # simulate preemption: run with checkpoint_every=1 and stop after
    # writing by monkeypatching — simpler: write a partial checkpoint by
    # rendering 4 spp manually through the same path
    import raytracingproject_tpu.utils.checkpoint as ckpt
    import numpy as _np

    calls = {"n": 0}
    orig = ckpt.render_pass

    def counting_render_pass(*a, **k):
        calls["n"] += 1
        if calls["n"] == 2 and not getattr(counting_render_pass, "resumed", False):
            # after writing chunk 1, force-save and bail like a preemption
            raise KeyboardInterrupt
        return orig(*a, **k)

    ckpt.render_pass = counting_render_pass
    try:
        try:
            render_checkpointed(scene, cam, key, ck, settings, checkpoint_every=1)
        except KeyboardInterrupt:
            pass
    finally:
        ckpt.render_pass = orig

    assert ck.exists()  # partial state persisted
    resumed = render_checkpointed(scene, cam, key, ck, settings)
    np.testing.assert_allclose(resumed, full, rtol=1e-6, atol=1e-6)


def test_training_state_roundtrip(tmp_path):
    scene = make_minimal_scene()
    params = extract_params(scene)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    p = tmp_path / "train.npz"
    save_training_state(p, params, opt_state, step=17)
    p2, o2, step = load_training_state(p, params, opt_state)
    assert step == 17
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(opt_state), jax.tree_util.tree_leaves(o2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cli_produces_ppm():
    """CLI smoke on CPU: P3 output with the right dimensions."""
    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS_FORCE_CPU_FOR_TEST"] = "1"
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; from raytracingproject_tpu.__main__ import main;"
        "sys.exit(main(['--scene','minimal','--width','32','--spp','2','--depth','3','-o','-']))"
    )
    res = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=300, env=env
    )
    assert res.returncode == 0, res.stderr[-2000:]
    lines = res.stdout.splitlines()
    assert lines[0] == "P3"
    assert lines[1] == "32 18"
    assert lines[2] == "255"
    assert len(lines) == 3 + 32 * 18
    assert "Done." in res.stderr
