"""Headless integration test for the web display client.

Boots a real System with the PT pass and a tiny cornell film, starts the
WebDisplay HTTP server on an ephemeral port, runs the render loop on the
worker thread, and drives the full GuiPass feature surface through plain
HTTP — exactly what a browser would send (gui.cpp parity: console,
buffer selector, canvas input, object edits, screenshot).
"""

import json
import threading
import time
import urllib.request
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture()
def web_system(reference_scene_dir, tmp_path):
    from pupiloptixlab_tpu.passes import PTPass
    from pupiloptixlab_tpu.scene import load_scene
    from pupiloptixlab_tpu.system import System

    system = System(display="web", web_port=0)  # ephemeral port
    system.add_pass(PTPass())
    scene = load_scene(reference_scene_dir / "cornellbox.xml")
    scene.sensor.film.w = scene.sensor.film.h = 32
    with system._render_mutex:
        system.world.set_scene(scene)
        from pupiloptixlab_tpu.system.buffers import (
            DEFAULT_FINAL_RESULT_BUFFER_NAME,
            BufferDesc,
            BufferFlag,
        )

        system.buffers.alloc(
            BufferDesc(
                name=DEFAULT_FINAL_RESULT_BUFFER_NAME,
                flag=BufferFlag.ALLOW_DISPLAY,
                width=32,
                height=32,
                channels=4,
            )
        )
        from pupiloptixlab_tpu.utils.event import SCENE_LOAD

        system.events.dispatch(SCENE_LOAD, system.world)
    system.display.start()
    thread = threading.Thread(
        target=system._render_loop, args=(None,), daemon=True
    )
    system._render_flag.set()
    thread.start()
    yield system
    system.quit()
    system.display.shutdown()
    thread.join(timeout=10)


def _url(system, path):
    return f"http://127.0.0.1:{system.display.port}{path}"


def _get(system, path):
    with urllib.request.urlopen(_url(system, path), timeout=30) as r:
        return r.read(), r.headers.get("Content-Type", "")


def _post(system, route, body):
    req = urllib.request.Request(
        _url(system, f"/api/{route}"), data=json.dumps(body).encode()
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


def _wait_for_frame(system, timeout=60.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if system.display.latest_image() is not None:
            return True
        time.sleep(0.1)
    return False


def test_page_and_state(web_system):
    page, ctype = _get(web_system, "/")
    assert b"Console" in page and "text/html" in ctype
    assert _wait_for_frame(web_system)
    state = json.loads(_get(web_system, "/api/state")[0])
    assert state["rendering"] is True
    assert "pt frame" in state["buffers"]
    assert any(p["name"] == "Path Tracing" for p in state["passes"])
    names = [o["name"] for o in state["objects"]]
    assert "ShortBox" in names and "TallBox" in names


def test_frame_png_and_buffer_select(web_system):
    assert _wait_for_frame(web_system)
    png, ctype = _get(web_system, "/frame.png")
    assert ctype == "image/png" and png[:8] == b"\x89PNG\r\n\x1a\n"
    # switch the displayable buffer like the dropdown would
    assert _post(web_system, "select", {"name": "pt normal"})["ok"]
    state = json.loads(_get(web_system, "/api/state")[0])
    assert state["selected"] == "pt normal"


def test_canvas_input_resets_accumulation(web_system):
    assert _wait_for_frame(web_system)
    pt = web_system.passes[0]
    time.sleep(0.3)
    assert pt.sample_cnt > 0
    before = pt.sample_cnt
    assert _post(web_system, "input", {"type": "drag", "dx": 30, "dy": 0})["ok"]
    time.sleep(0.3)
    # camera edit -> dirty -> accumulation restarted below the old count
    assert pt.sample_cnt < before + 2


def test_object_edit_via_http(web_system):
    assert _wait_for_frame(web_system)
    assert _post(
        web_system, "object", {"name": "ShortBox", "translate": [0.1, 0, 0]}
    )["ok"]
    assert _post(web_system, "object", {"name": "ShortBox", "visible": False})["ok"]
    state = json.loads(_get(web_system, "/api/state")[0])
    short = next(o for o in state["objects"] if o["name"] == "ShortBox")
    assert short["visible"] is False
    r = _post(web_system, "object", {"name": "NoSuchThing", "visible": True})
    assert r["ok"] is False


def test_screenshot_lands_in_images(web_system, tmp_path):
    assert _wait_for_frame(web_system)
    out = tmp_path / "shot.exr"
    r = _post(web_system, "screenshot", {"path": str(out)})
    assert r["ok"] and Path(r["path"]).exists()
    from pupiloptixlab_tpu.utils.image import read_exr

    img = read_exr(out)
    assert img.shape[:2] == (32, 32) and np.isfinite(img).all()


def test_mjpeg_stream_yields_frames(web_system):
    assert _wait_for_frame(web_system)
    with urllib.request.urlopen(_url(web_system, "/stream"), timeout=30) as r:
        data = r.read(20000)
    assert b"--frame" in data and b"image/jpeg" in data
    assert b"\xff\xd8" in data  # JPEG SOI marker


def test_pick_and_viewport_drag(web_system):
    """Viewport select + ctrl-drag manipulation (the ImGuizmo analog):
    a pick at the canvas center hits a cornell object, objdrag
    translates it along the camera plane, and the edit rides the same
    dirty chain (accumulation reset)."""
    assert _wait_for_frame(web_system)
    r = _post(web_system, "pick", {"x": 0.5, "y": 0.5})
    assert r["ok"] and r["name"] is not None and r["t"] > 0
    # off-canvas corner ray escapes through the open cornell front? a
    # top-left pick may still hit a wall; just check the route answers
    assert _post(web_system, "pick", {"x": 0.01, "y": 0.01})["ok"]

    world = web_system.world
    before = np.asarray(
        world.get_render_object("ShortBox").instance.transform.matrix
    ).copy()
    pt = web_system.passes[0]
    time.sleep(0.3)
    cnt_before = pt.sample_cnt
    assert _post(
        web_system, "objdrag",
        {"name": "ShortBox", "dx": 0.05, "dy": 0.0, "mode": "translate"},
    )["ok"]
    after = np.asarray(
        world.get_render_object("ShortBox").instance.transform.matrix
    )
    moved = np.linalg.norm(after[:3, 3] - before[:3, 3])
    assert moved > 1e-4  # translated in the camera plane
    time.sleep(0.3)
    # edit reset the accumulation (same gate as the drag-input test)
    assert pt.sample_cnt < cnt_before + 2

    # rotate + scale about the object center keep the route green and
    # change the linear part
    assert _post(
        web_system, "objdrag",
        {"name": "ShortBox", "dx": 0.1, "dy": 0.05, "mode": "rotate"},
    )["ok"]
    assert _post(
        web_system, "objdrag",
        {"name": "ShortBox", "dx": 0.0, "dy": -0.1, "mode": "scale"},
    )["ok"]
    final = np.asarray(
        world.get_render_object("ShortBox").instance.transform.matrix
    )
    assert not np.allclose(final[:3, :3], after[:3, :3])
    assert _post(
        web_system, "objdrag", {"name": "Nope", "dx": 0.1, "dy": 0.0}
    )["ok"] is False
