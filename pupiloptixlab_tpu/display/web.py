"""Web display client: the GuiPass replacement for remote TPU hosts.

The reference GUI is 1.1k LoC of Win32 + DX12 + ImGui (system/gui/
gui.cpp): a docked console (start/stop, ms/FPS, tone-map + gamma
toggles, displayable-buffer selector, per-pass inspectors,
gui.cpp:518-623), a scene panel (camera editor, object list with
visibility + ImGuizmo transforms, gui.cpp:689-816), a canvas capturing
mouse drag / wheel / WASDQE (gui.cpp:652-686), and menu actions (load
scene, screenshot -> EXR, gui.cpp:467-486). None of that maps to a TPU
host with no display — the TPU-native answer is a web client:

* frames stream as MJPEG over HTTP (multipart/x-mixed-replace) from the
  same flip-model double buffer the reference uses (gui.h:92-104,
  implemented in DisplayClient);
* the console/scene panels are a single embedded HTML page talking to a
  small JSON API; every control routes through the SAME event bus and
  RenderObject methods the reference's ImGui widgets call, so dirty
  propagation (camera edit -> accum reset, transform edit -> re-flatten)
  is identical;
* stdlib http.server only — no extra dependencies on the render host.

Endpoints:
  GET  /               the UI page
  GET  /stream         MJPEG frame stream of the selected buffer
  GET  /frame.png      one PNG frame (handy for headless screenshots)
  GET  /api/state      console + scene state (JSON)
  POST /api/select     {"name": buffer}         (buffer dropdown)
  POST /api/input      {"type": "drag"|"wheel"|"key", ...} (canvas input)
  POST /api/display    {"tone_mapping"?, "gamma"?} toggles
  POST /api/render     {"action": "start"|"stop"}
  POST /api/pass       {"name", "enabled"? , "set"?: {attr: value}}
  POST /api/camera     {"fov"?, "sensitivity"?}
  POST /api/object     {"name", "visible"?, "translate"?, "rotate"?,
                        "scale"?, "matrix"?}   (gizmo analog)
  POST /api/screenshot {"path"?} -> saves EXR (default images/)
  POST /api/scene      {"path"} -> async scene load (gui.cpp:852-869)
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np

from pupiloptixlab_tpu.display.client import DisplayClient
from pupiloptixlab_tpu.utils.log import get_logger
from pupiloptixlab_tpu.utils.math import Transform

log = get_logger(__name__)


def _encode_jpeg(img: np.ndarray, quality: int = 85) -> bytes:
    from PIL import Image

    u8 = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(u8).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def _encode_png(img: np.ndarray) -> bytes:
    from PIL import Image

    u8 = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(u8).save(buf, "PNG")
    return buf.getvalue()


class WebDisplay(DisplayClient):
    """DisplayClient whose ``run()`` serves the GUI over HTTP."""

    def __init__(self, system, host: str = "127.0.0.1", port: int = 8090):
        super().__init__(system)
        self.host = host
        self.port = port
        self._server: ThreadingHTTPServer | None = None

    # -- state for /api/state ------------------------------------------------
    def console_state(self) -> dict:
        sys_ = self.system
        objects = []
        if sys_.world.scene is not None:
            for ro in sys_.world.render_objects:
                objects.append(
                    {
                        "name": ro.name,
                        "visible": ro.visible,
                        "matrix": np.asarray(
                            ro.transform.matrix, np.float32
                        ).reshape(-1).tolist(),
                    }
                )
        cam = sys_.world.camera
        from pupiloptixlab_tpu.utils.camera import Camera

        return {
            "fps": round(self.fps, 1),
            "frame_time_ms": round(self.frame_time_ms, 3),
            "rendering": sys_._render_flag.is_set(),
            "buffers": self.buffer_names(),
            "selected": self.selected,
            "tone_mapping": self.tone_mapping,
            "gamma": self.gamma,
            "passes": [p.inspector() for p in sys_.pre_passes + sys_.passes],
            "objects": objects,
            "camera": {
                "fov": float(cam._fov_y) if cam else 0.0,
                "sensitivity": float(Camera.sensitivity),
            },
        }

    # -- actions (each routes through the reference's event/edit paths) ------
    def apply_action(self, route: str, body: dict) -> dict:
        sys_ = self.system
        if route == "select":
            self.select_buffer(str(body["name"]))
        elif route == "input":
            kind = body.get("type")
            if kind == "drag":
                self.mouse_drag(float(body["dx"]), float(body["dy"]))
            elif kind == "wheel":
                self.mouse_wheel(float(body["delta"]))
            elif kind == "key":
                self.key(str(body["key"]))
        elif route == "display":
            if "tone_mapping" in body:
                self.tone_mapping = bool(body["tone_mapping"])
            if "gamma" in body:
                self.gamma = bool(body["gamma"])
        elif route == "render":
            if body.get("action") == "start":
                from pupiloptixlab_tpu.utils.event import START_RENDERING

                sys_.events.dispatch(START_RENDERING)
            else:
                sys_.stop()
        elif route == "pass":
            name = body.get("name")
            for p in sys_.pre_passes + sys_.passes:
                if p.name == name:
                    if "enabled" in body:
                        p.enabled = bool(body["enabled"])
                    for key, value in (body.get("set") or {}).items():
                        setter = getattr(p, f"set_{key}", None)
                        if setter is not None:
                            setter(value)
                        elif hasattr(p, key):
                            setattr(p, key, value)
        elif route == "camera":
            cam = sys_.world.camera
            if cam is not None and "fov" in body:
                cam.set_fov(float(body["fov"]))
                sys_.world._camera_dirty = True
                from pupiloptixlab_tpu.utils.event import CAMERA_CHANGE

                sys_.events.dispatch(CAMERA_CHANGE)
            if "sensitivity" in body:
                from pupiloptixlab_tpu.utils.camera import Camera

                Camera.sensitivity = float(body["sensitivity"])
        elif route == "object":
            ro = sys_.world.get_render_object(str(body["name"]))
            if ro is None:
                return {"ok": False, "error": "no such object"}
            if "visible" in body:
                ro.set_visible(bool(body["visible"]))
            t = None
            if "matrix" in body:
                m = np.asarray(body["matrix"], np.float32).reshape(4, 4)
                ro.update_transform(Transform(m))
            if "translate" in body:
                t = Transform().translate(*[float(v) for v in body["translate"]])
            if "rotate" in body:
                ax, ay, az, deg = (float(v) for v in body["rotate"])
                t = Transform().rotate(ax, ay, az, deg)
            if "scale" in body:
                t = Transform().scale(*[float(v) for v in body["scale"]])
            if t is not None:
                ro.apply_transform(t)
        elif route == "screenshot":
            path = body.get("path") or str(
                Path("images") / f"screenshot_{int(time.time())}.exr"
            )
            Path(path).parent.mkdir(parents=True, exist_ok=True)
            self.save_screenshot(path)
            return {"ok": True, "path": path}
        elif route == "scene":
            # stop, zero the canvas, load async (gui.cpp:852-869)
            sys_.stop()
            threading.Thread(
                target=sys_.set_scene, args=(body["path"],), daemon=True
            ).start()
        else:
            return {"ok": False, "error": f"unknown route {route}"}
        return {"ok": True}

    # -- server ----------------------------------------------------------------
    def start(self) -> None:
        display = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def _json(self, payload, code=200):
                data = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                if self.path == "/" or self.path.startswith("/index"):
                    page = _PAGE.encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.send_header("Content-Length", str(len(page)))
                    self.end_headers()
                    self.wfile.write(page)
                elif self.path.startswith("/api/state"):
                    self._json(display.console_state())
                elif self.path.startswith("/frame.png"):
                    img = display.latest_image()
                    if img is None:
                        self.send_response(503)
                        self.end_headers()
                        return
                    data = _encode_png(img)
                    self.send_response(200)
                    self.send_header("Content-Type", "image/png")
                    self.send_header("Content-Length", str(len(data)))
                    self.end_headers()
                    self.wfile.write(data)
                elif self.path.startswith("/stream"):
                    self.send_response(200)
                    self.send_header(
                        "Content-Type",
                        "multipart/x-mixed-replace; boundary=frame",
                    )
                    self.end_headers()
                    try:
                        while not display.system._quit_flag.is_set():
                            img = display.latest_image()
                            if img is not None:
                                data = _encode_jpeg(img)
                                self.wfile.write(b"--frame\r\n")
                                self.wfile.write(b"Content-Type: image/jpeg\r\n")
                                self.wfile.write(
                                    f"Content-Length: {len(data)}\r\n\r\n".encode()
                                )
                                self.wfile.write(data)
                                self.wfile.write(b"\r\n")
                            time.sleep(1.0 / 15.0)
                    except (BrokenPipeError, ConnectionResetError):
                        pass
                else:
                    self.send_response(404)
                    self.end_headers()

            def do_POST(self):
                if not self.path.startswith("/api/"):
                    self.send_response(404)
                    self.end_headers()
                    return
                route = self.path[len("/api/"):]
                length = int(self.headers.get("Content-Length") or 0)
                try:
                    body = json.loads(self.rfile.read(length) or b"{}")
                    # semantic failures ride a 200 {ok: false, error}
                    self._json(display.apply_action(route, body))
                except Exception as exc:  # malformed request
                    self._json({"ok": False, "error": str(exc)}, 400)

        self._server = ThreadingHTTPServer((self.host, self.port), Handler)
        self.port = self._server.server_address[1]  # resolve port 0
        thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        thread.start()
        log.info("web display at http://%s:%d/", self.host, self.port)

    def run(self, refresh_hz: float = 30.0) -> None:
        """Serve until the system quits (the 'GUI thread')."""
        if self._server is None:
            self.start()
        while not self.system._quit_flag.is_set():
            time.sleep(0.1)
        self.shutdown()

    def shutdown(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server = None


_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>pupiloptixlab_tpu</title>
<style>
 body{margin:0;display:flex;font:13px system-ui;background:#15171a;color:#d7dae0}
 #panel{width:320px;padding:10px;overflow-y:auto;height:100vh;box-sizing:border-box;background:#1d2024}
 #canvaswrap{flex:1;display:flex;align-items:center;justify-content:center;height:100vh}
 img#canvas{max-width:100%;max-height:100%;outline:none;image-rendering:auto}
 h3{margin:12px 0 4px;font-size:12px;text-transform:uppercase;color:#8b93a1}
 .row{display:flex;justify-content:space-between;align-items:center;margin:3px 0}
 select,input[type=number],input[type=text]{background:#2a2e34;color:#d7dae0;border:1px solid #3a3f46;border-radius:3px;padding:2px 4px}
 button{background:#2f6fed;border:0;color:#fff;border-radius:3px;padding:3px 10px;cursor:pointer;margin-right:4px}
 button.sec{background:#3a3f46}
 .obj{border:1px solid #2a2e34;border-radius:4px;padding:5px;margin:4px 0}
 .nudge button{padding:1px 6px;font-size:11px}
</style></head><body>
<div id="panel">
 <h3>Console</h3>
 <div class="row"><span id="fps">-- fps</span><span id="ms">-- ms</span></div>
 <div class="row">
  <button onclick="api('render',{action:'start'})">start</button>
  <button class="sec" onclick="api('render',{action:'stop'})">stop</button>
  <button class="sec" onclick="api('screenshot',{})">screenshot</button>
 </div>
 <div class="row"><label>buffer</label><select id="buffer" onchange="api('select',{name:this.value})"></select></div>
 <div class="row"><label>tone map</label><input id="tm" type="checkbox" onchange="api('display',{tone_mapping:this.checked})"></div>
 <div class="row"><label>gamma</label><input id="gm" type="checkbox" onchange="api('display',{gamma:this.checked})"></div>
 <h3>Passes</h3><div id="passes"></div>
 <h3>Camera</h3>
 <div class="row"><label>fov</label><input id="fov" type="number" step="1" style="width:70px"
   onchange="api('camera',{fov:parseFloat(this.value)})"></div>
 <div class="row"><label>sensitivity</label><input id="sens" type="number" step="0.1" style="width:70px"
   onchange="api('camera',{sensitivity:parseFloat(this.value)})"></div>
 <h3>Scene</h3>
 <div class="row"><input id="scenepath" type="text" placeholder="scene.xml" style="flex:1">
  <button onclick="api('scene',{path:document.getElementById('scenepath').value})">load</button></div>
 <div id="objects"></div>
</div>
<div id="canvaswrap"><img id="canvas" src="/stream" tabindex="0"></div>
<script>
const api=(route,body)=>fetch('/api/'+route,{method:'POST',body:JSON.stringify(body)});
const canvas=document.getElementById('canvas');
let dragging=false,px=0,py=0;
canvas.onmousedown=e=>{dragging=true;px=e.clientX;py=e.clientY;canvas.focus();};
window.onmouseup=()=>dragging=false;
window.onmousemove=e=>{if(!dragging)return;api('input',{type:'drag',dx:e.clientX-px,dy:e.clientY-py});px=e.clientX;py=e.clientY;};
canvas.onwheel=e=>{e.preventDefault();api('input',{type:'wheel',delta:Math.sign(e.deltaY)});};
window.onkeydown=e=>{if('wasdqe'.includes(e.key))api('input',{type:'key',key:e.key});};
function nudge(name,axis,amt){const t=[0,0,0];t[axis]=amt;api('object',{name:name,translate:t});}
async function refresh(){
 try{
  const s=await (await fetch('/api/state')).json();
  document.getElementById('fps').textContent=s.fps+' fps';
  document.getElementById('ms').textContent=s.frame_time_ms+' ms';
  document.getElementById('tm').checked=s.tone_mapping;
  document.getElementById('gm').checked=s.gamma;
  if(document.activeElement.id!=='fov')document.getElementById('fov').value=s.camera.fov.toFixed(1);
  if(document.activeElement.id!=='sens')document.getElementById('sens').value=s.camera.sensitivity;
  const sel=document.getElementById('buffer');
  if(sel.options.length!==s.buffers.length){
   sel.innerHTML=s.buffers.map(b=>`<option${b===s.selected?' selected':''}>${b}</option>`).join('');
  }
  document.getElementById('passes').innerHTML=s.passes.map(p=>
   `<div class="row"><label><input type="checkbox" ${p.enabled?'checked':''}
      onchange="api('pass',{name:'${p.name}',enabled:this.checked})"> ${p.name}</label>
    <span>${p.time_ms} ms</span></div>`).join('');
  document.getElementById('objects').innerHTML=s.objects.map(o=>
   `<div class="obj"><div class="row"><b>${o.name}</b>
     <label><input type="checkbox" ${o.visible?'checked':''}
      onchange="api('object',{name:'${o.name}',visible:this.checked})">visible</label></div>
    <div class="row nudge">${[0,1,2].map(a=>
      `<span>${'xyz'[a]} <button onclick="nudge('${o.name}',${a},-0.1)">-</button><button onclick="nudge('${o.name}',${a},0.1)">+</button></span>`).join('')}
    </div></div>`).join('');
 }catch(e){}
 setTimeout(refresh,1000);
}
refresh();
</script></body></html>
"""
