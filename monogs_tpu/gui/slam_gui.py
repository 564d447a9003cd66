"""Live SLAM viewer: a dependency-free web GUI.

The reference ships an Open3D/OpenGL desktop GUI (gui/slam_gui.py, ~1.5k LoC
with GLSL splat shaders) that re-renders the map from an interactive camera
via the same CUDA rasterizer. A desktop GL stack makes no sense next to a
TPU pod, so this framework's GUI is a small threaded HTTP server:

  - GET /          an auto-refreshing HTML dashboard (rendered view, input
                   frame, depth, map/trajectory stats)
  - GET /view.jpg  the map rendered from the current tracked camera (or an
                   orbit offset via ?dx=&dy=&dz=&yaw=&pitch= — the
                   interactive viewpoint, rasterized by the same jax
                   renderer the SLAM loops use)
  - GET /input.jpg the latest ground-truth frame received from the frontend
  - GET /depth.jpg the rendered depth (turbo-mapped)
  - GET /stats     JSON: gaussian count, keyframes, window, fps
  - POST /pause, /unpause  the Packet_vis2main back-channel

run(params) mirrors the reference entry point (gui/slam_gui.py:696-700):
it drains q_main2vis to the latest GaussianPacket (backpressure-free, like
gui_utils.py:145-156) and serves until a finish packet arrives.
"""

from __future__ import annotations

import json
import queue
import threading
import time

import numpy as np

from ..ops import se3
from ..utils.logging import Log
from .gui_utils import GaussianPacket, Packet_vis2main

_PAGE = """<!DOCTYPE html>
<html><head><title>monogs-tpu</title>
<style>
 body { background:#111; color:#ddd; font-family:monospace; margin:16px; }
 img { image-rendering:pixelated; border:1px solid #333; }
 .row { display:flex; gap:12px; flex-wrap:wrap; }
 button { background:#333; color:#ddd; border:1px solid #555; padding:6px 14px; }
</style></head>
<body>
<h2>monogs-tpu live</h2>
<div class="row">
 <div><h4>rendered view</h4><img id="v" width="480"/></div>
 <div><h4>input frame</h4><img id="i" width="480"/></div>
 <div><h4>depth</h4><img id="d" width="480"/></div>
</div>
<p>
 <button onclick="fetch('/pause',{method:'POST'})">pause</button>
 <button onclick="fetch('/unpause',{method:'POST'})">unpause</button>
</p>
<pre id="s"></pre>
<script>
 async function tick() {
   const t = Date.now();
   document.getElementById('v').src = '/view.jpg?t=' + t;
   document.getElementById('i').src = '/input.jpg?t=' + t;
   document.getElementById('d').src = '/depth.jpg?t=' + t;
   const s = await (await fetch('/stats')).json();
   document.getElementById('s').textContent = JSON.stringify(s, null, 2);
 }
 setInterval(tick, 1000); tick();
</script>
</body></html>"""


class _State:
    def __init__(self, params):
        self.params = params
        self.latest = GaussianPacket()
        self.gaussians = params.gaussians
        self.current_T = None
        self.n_frames = 0
        self.t0 = time.time()
        self.lock = threading.Lock()
        self.finished = False


def _encode_jpg(img_chw):
    """[3,H,W] float in [0,1] -> jpeg bytes (cv2 if available, else PPM)."""
    arr = np.clip(np.asarray(img_chw), 0, 1)
    hwc = (arr.transpose(1, 2, 0) * 255).astype(np.uint8)
    try:
        import cv2

        ok, buf = cv2.imencode(".jpg", hwc[..., ::-1])
        if ok:
            return bytes(buf), "image/jpeg"
    except Exception:
        pass
    h, w = hwc.shape[:2]
    return (
        b"P6\n%d %d\n255\n" % (w, h) + hwc.tobytes(),
        "image/x-portable-pixmap",
    )


def _turbo(depth_hw):
    d = np.asarray(depth_hw)
    lo, hi = np.percentile(d[d > 0], [2, 98]) if (d > 0).any() else (0, 1)
    t = np.clip((d - lo) / max(hi - lo, 1e-6), 0, 1)
    rgb = np.stack([t, 4 * t * (1 - t), 1 - t], axis=0)
    return rgb


_render_jit = None


def _render_view(state: _State, offsets):
    import jax
    import jax.numpy as jnp

    from ..render import render

    global _render_jit
    if _render_jit is None:
        # one cached jit for all GUI requests — rebuilding jax.jit per
        # request would recompile every time
        _render_jit = jax.jit(render, static_argnames=("intr", "cfg"))

    p = state.params
    with state.lock:
        gauss = state.gaussians
        T = state.current_T
    if gauss is None or T is None:
        return None, None
    tau = jnp.asarray(offsets, jnp.float32)
    out = _render_jit(
        gauss.render_view(), jnp.asarray(T), p.intr,
        p.render_cfg._replace(with_n_touched=False), tau=tau,
    )
    return np.asarray(jnp.clip(out.image, 0, 1)), np.asarray(out.depth[0])


def run(params):
    """GUI process/thread entry (mirrors slam_gui.run)."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    state = _State(params)

    def drain():
        while not state.finished:
            try:
                pkt = params.q_main2vis.get(timeout=0.05)
            except queue.Empty:
                continue
            # drain to the latest packet (gui_utils.py:145-156)
            while True:
                try:
                    pkt = params.q_main2vis.get_nowait()
                except queue.Empty:
                    break
            with state.lock:
                if pkt.finish:
                    state.finished = True
                if pkt.gaussians is not None:
                    state.gaussians = pkt.gaussians
                if pkt.current_frame is not None:
                    state.current_T = pkt.current_frame.T
                state.latest = pkt
                state.n_frames += 1

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, body, ctype="text/html"):
            try:
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except (BrokenPipeError, ConnectionResetError):
                pass  # client gave up (e.g. curl timeout); not an error

        def do_POST(self):
            if self.path == "/pause":
                params.q_vis2main.put(Packet_vis2main(flag_pause=True))
            elif self.path == "/unpause":
                params.q_vis2main.put(Packet_vis2main(flag_pause=False))
            self._send(b"ok", "text/plain")

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                self._send(_PAGE.encode())
            elif url.path == "/stats":
                with state.lock:
                    g = state.gaussians
                    pkt = state.latest
                stats = {
                    "n_gaussians": int(g.n_active) if g is not None else 0,
                    "n_keyframes": len(pkt.keyframes),
                    "kf_window": {
                        str(k): v for k, v in (pkt.kf_window or {}).items()
                    },
                    "packets": state.n_frames,
                    "uptime_s": round(time.time() - state.t0, 1),
                }
                self._send(json.dumps(stats).encode(), "application/json")
            elif url.path == "/view.jpg":
                q = parse_qs(url.query)

                def f(k):
                    return float(q.get(k, ["0"])[0])

                offs = [f("dx"), f("dy"), f("dz"), f("pitch"), f("yaw"), f("roll")]
                img, _ = _render_view(state, offs)
                if img is None:
                    self._send(b"", "image/jpeg")
                    return
                body, ctype = _encode_jpg(img)
                self._send(body, ctype)
            elif url.path == "/depth.jpg":
                _, depth = _render_view(state, [0] * 6)
                if depth is None:
                    self._send(b"", "image/jpeg")
                    return
                body, ctype = _encode_jpg(_turbo(depth))
                self._send(body, ctype)
            elif url.path == "/input.jpg":
                with state.lock:
                    gt = state.latest.gtcolor
                if gt is None:
                    self._send(b"", "image/jpeg")
                    return
                body, ctype = _encode_jpg(np.asarray(gt))
                self._send(body, ctype)
            else:
                self.send_response(404)
                self.end_headers()

    drainer = threading.Thread(target=drain, daemon=True)
    drainer.start()
    server = ThreadingHTTPServer(("0.0.0.0", params.port), Handler)
    # non-daemon handler threads: the process waits for in-flight renders
    # instead of tearing down the jax runtime under them (which aborts)
    server.daemon_threads = False
    server.timeout = 0.5
    Log(f"GUI serving at http://localhost:{params.port}", tag="GUI")
    while not state.finished:
        server.handle_request()
    server.server_close()
    Log("GUI stopped", tag="GUI")
