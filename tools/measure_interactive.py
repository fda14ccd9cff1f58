"""End-to-end interactivity measurement (BASELINE config 5).

Drives the REAL pass stack (System + PTPass) on the real TPU and
measures what a user at the web GUI experiences, per scene:

* render_fps     — sustained pass-loop rate (the reference GUI's
                   ms/frame counter, system/gui/gui.cpp:535)
* display_fps    — render + device->host fetch + ACES/gamma tonemap of
                   the 1080p frame (the DisplayClient pump,
                   display/client.py:76-96)
* jpeg_ms        — one 1080p JPEG encode (the MJPEG stream cost; the
                   stream runs on its own thread at its own rate)
* camera_edit_ms — CAMERA_MOVE event -> accumulation reset -> next
                   frame fetched (interactive camera latency)
* object_edit_ms — instance translate -> device refit -> next frame
                   fetched (the IAS-update edit latency)

Usage (repo root, real TPU):  python -m tools.measure_interactive
Writes one JSON line per scene; paste results into INTERACTIVE.md.
"""

from __future__ import annotations

import json
import pathlib
import time

import numpy as np


def _prep_scene(src: str, w: int, h: int) -> str:
    """Copy the XML with the film forced to w x h; symlink sibling
    asset dirs next to it (the verify-skill recipe)."""
    import re

    src_p = pathlib.Path(src)
    out_dir = pathlib.Path(f"/tmp/pupil_interactive/{src_p.stem}_{w}x{h}")
    out_dir.mkdir(parents=True, exist_ok=True)
    text = src_p.read_text()
    text = re.sub(
        r'(<integer name="width" value=")\d+', rf"\g<1>{w}", text, count=1
    )
    text = re.sub(
        r'(<integer name="height" value=")\d+', rf"\g<1>{h}", text, count=1
    )
    dst = out_dir / src_p.name
    dst.write_text(text)
    for sib in src_p.parent.iterdir():
        if sib.is_dir():
            link = out_dir / sib.name
            if not link.exists():
                link.symlink_to(sib)
    return str(dst)


def measure_scene(path: str, width=1920, height=1080, frames=30):
    from pupiloptixlab_tpu.display.tonemap import aces_gamma_to_display
    from pupiloptixlab_tpu.passes import PTPass
    from pupiloptixlab_tpu.system import System
    from pupiloptixlab_tpu.utils.event import CAMERA_MOVE
    from pupiloptixlab_tpu.utils.math import Transform

    system = System()  # headless: we pump frames ourselves
    pt = PTPass()
    system.add_pass(pt)
    scene_path = _prep_scene(path, width, height)
    t0 = time.perf_counter()
    if not system.set_scene(scene_path):
        raise SystemExit(f"scene load failed: {scene_path}")
    load_s = time.perf_counter() - t0

    bm = system.buffers

    def fetch():
        """device -> host + tonemap, exactly the display pump."""
        buf = bm.get("pt frame")
        img = np.asarray(aces_gamma_to_display(buf.array[:, :3]))
        return img.reshape(height, width, 3)

    # warm-up / compile
    t0 = time.perf_counter()
    pt.run()
    img = fetch()
    compile_s = time.perf_counter() - t0

    # sustained render-only fps
    t0 = time.perf_counter()
    for _ in range(frames):
        pt.run()
    fetch()  # one sync at the end
    render_fps = frames / (time.perf_counter() - t0)

    # sustained display fps (render + fetch + tonemap every frame)
    t0 = time.perf_counter()
    for _ in range(frames):
        pt.run()
        img = fetch()
    display_fps = frames / (time.perf_counter() - t0)

    # JPEG encode cost (the MJPEG stream's own-thread cost)
    from pupiloptixlab_tpu.display.web import _encode_jpeg

    t0 = time.perf_counter()
    _encode_jpeg(img)
    jpeg_ms = (time.perf_counter() - t0) * 1e3

    # camera-edit latency: event -> dirty -> reset -> next frame on host
    lat_cam = []
    for i in range(5):
        t0 = time.perf_counter()
        system.events.dispatch(CAMERA_MOVE, [0.01, 0.0, 0.0])
        pt.run()
        fetch()
        lat_cam.append(time.perf_counter() - t0)
        assert pt.sample_cnt == 1  # accumulation reset happened

    # object-edit latency: translate -> device refit -> next frame
    lat_obj = []
    ros = system.world.render_objects
    if ros:
        m = np.eye(4, dtype=np.float32)
        m[0, 3] = 0.001
        for i in range(5):
            t0 = time.perf_counter()
            ros[0].apply_transform(Transform(m))
            pt.run()
            fetch()
            lat_obj.append(time.perf_counter() - t0)

    return {
        "scene": pathlib.Path(path).stem,
        "film": f"{width}x{height}",
        "load_s": round(load_s, 2),
        "first_frame_s": round(compile_s, 2),
        "render_fps": round(render_fps, 2),
        "display_fps": round(display_fps, 2),
        "jpeg_ms": round(jpeg_ms, 1),
        "camera_edit_ms": round(min(lat_cam) * 1e3, 1),
        "object_edit_ms": round(min(lat_obj) * 1e3, 1) if lat_obj else None,
    }


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("scenes", nargs="*", default=[
        "/root/reference/data/static/cornellbox.xml",
        "/root/repo/data/mesh_env.xml",
    ])
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--frames", type=int, default=30)
    args = ap.parse_args()
    for s in args.scenes:
        print(json.dumps(measure_scene(
            s, args.width, args.height, args.frames
        )), flush=True)


if __name__ == "__main__":
    main()
