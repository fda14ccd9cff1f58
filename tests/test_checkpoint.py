"""Progressive-render checkpoint/resume (orbax)."""

import numpy as np
import pytest


@pytest.fixture()
def pt_system(reference_scene_dir):
    from pupiloptixlab_tpu.passes import PTPass
    from pupiloptixlab_tpu.scene import load_scene
    from pupiloptixlab_tpu.system import System
    from pupiloptixlab_tpu.system.buffers import (
        DEFAULT_FINAL_RESULT_BUFFER_NAME, BufferDesc, BufferFlag)
    from pupiloptixlab_tpu.utils.event import SCENE_LOAD

    system = System()
    system.add_pass(PTPass(max_depth=2))
    scene = load_scene(reference_scene_dir / "cornellbox.xml")
    scene.sensor.film.w = scene.sensor.film.h = 16
    system.world.set_scene(scene)
    system.buffers.alloc(BufferDesc(
        name=DEFAULT_FINAL_RESULT_BUFFER_NAME, flag=BufferFlag.ALLOW_DISPLAY,
        width=16, height=16, channels=4))
    system.events.dispatch(SCENE_LOAD, system.world)
    return system


def test_checkpoint_resume_continues_accumulation(pt_system, tmp_path):
    from pupiloptixlab_tpu.utils.checkpoint import (
        restore_render_state, save_render_state)

    s = pt_system
    pt = s.passes[0]

    # reference: 6 uninterrupted progressive samples
    pt.seed = 0
    s.run(max_frames=6)
    reference = np.asarray(pt._accum)
    ref_cnt = pt.sample_cnt

    # restart: 3 samples, checkpoint, reset, restore, 3 more
    pt._set_scene(s.world)  # reset accumulation
    pt.seed = 0             # same RNG stream as the reference run
    s.run(max_frames=3)
    save_render_state(tmp_path / "ckpt", pt)

    pt._set_scene(s.world)  # simulate process restart (fresh state)
    assert pt.sample_cnt == 0
    restore_render_state(tmp_path / "ckpt", pt)
    assert pt.sample_cnt == 3
    s.run(max_frames=3)

    assert pt.sample_cnt == ref_cnt
    np.testing.assert_allclose(
        np.asarray(pt._accum), reference, rtol=1e-5, atol=1e-6
    )


def test_checkpoint_rejects_mismatched_film(pt_system, tmp_path):
    from pupiloptixlab_tpu.utils.checkpoint import (
        restore_render_state, save_render_state)
    import jax.numpy as jnp

    s = pt_system
    pt = s.passes[0]
    s.run(max_frames=1)
    save_render_state(tmp_path / "ckpt2", pt)
    pt._accum = jnp.zeros((8 * 8, 3), jnp.float32)  # different film
    with pytest.raises(ValueError):
        restore_render_state(tmp_path / "ckpt2", pt)
