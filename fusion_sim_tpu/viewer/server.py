"""Thin HTTP viewer: the reference's browser app layer, TPU-native.

Re-creates the L4-L6 application stack (fusionsim.js 'simulation' controller
+ index.html shell, SURVEY.md §2.5) as a headless service: the simulation
runs server-side on TPU; the browser shows streamed PNG frames and a
click-to-start/stop control with a live FPS counter (parity with
``$scope.start/stop/fps``, fusionsim.js:162-210, index.html:13-14).

JSON API (mirrors the full engine API surface, empic.js:1157-1526):

    POST /api/config            {spec..., scenario?: "default"} — or
                                {model: "es"|"em", scenario: "two_stream"|
                                 "landau"|"weibel", ...factory kwargs}
    POST /api/set               {position?, velocity?, sink_mask?, source_pdf?, E?, B?}
    POST /api/add_current_loop  {r, z, I}          (empic.js:1352)
    POST /api/add_current_z     {I}                (empic.js:1380)
    POST /api/add_bz            {Bz}               (empic.js:1391)
    POST /api/add_btheta        {Btheta}           (empic.js:1402)
    POST /api/add_spindle_cusp_plasma_field  {coil_current, n_power?}
                                                    (empic.js:1369)
    POST /api/precalc                               (empic.js:1413)
    POST /api/enable_fast_path  {sink_box?, source_box?, uniform_e?}
    POST /api/disable_fast_path
    POST /api/start | /api/stop                     (fusionsim.js:162,207)
    POST /api/step              {n}                 single-shot stepping
    GET  /api/state             {running, fps, steps, diagnostics}
    GET  /api/diagnostics?since=S  recorded diagnostics time series
    GET  /frame.png             latest rendered frame
    GET  /                      HTML shell
"""

from __future__ import annotations

import collections
import functools
import json
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from ..models.pusher import CylindricalParticlePusher
from ..scenarios import apply_default_scenario
from ..utils.diagnostics import pusher_diagnostics
from ..utils.png import encode_png
from ..utils.render import frame_to_uint8

_PAGE = """<!DOCTYPE html>
<html><head><title>fusion-sim tpu</title><style>
body { background:#111; color:#ddd; font-family:monospace; }
#plot { image-rendering:pixelated; cursor:pointer; border:1px solid #333; }
</style></head><body>
<div>fps = <span id="fps">0</span> &middot; steps = <span id="steps">0</span>
 &middot; click the plot to start/stop</div>
<img id="plot" width="400" height="800" src="/frame.png"/>
<script>
const img = document.getElementById('plot');
let running = false;
img.onclick = async () => {
  running = !running;
  await fetch(running ? '/api/start' : '/api/stop', {method: 'POST'});
};
setInterval(async () => {
  img.src = '/frame.png?' + Date.now();
  const s = await (await fetch('/api/state')).json();
  document.getElementById('fps').textContent = s.fps.toFixed(0);
  document.getElementById('steps').textContent = s.steps;
  running = s.running;
}, 100);
</script></body></html>"""




@functools.partial(jax.jit, static_argnames=("bins", "cells"))
def _phase_hist(pos, vel, v_lim, bins, cells):
    """Device-side (x, v) phase-space histogram (no 10M-row host copies)."""
    bx = jnp.clip((pos / cells * bins[0]).astype(jnp.int32), 0, bins[0] - 1)
    by = jnp.clip(((vel + v_lim) / (2.0 * v_lim) * bins[1]).astype(jnp.int32),
                  0, bins[1] - 1)
    flat = bx * bins[1] + by
    h = jnp.zeros((bins[0] * bins[1],), jnp.float32).at[flat].add(1.0)
    return h.reshape(bins)


class PusherAdapter:
    """The reference's live mode: cylindrical pusher + density/|B| frame."""

    model = "pusher"

    def __init__(self, sim: CylindricalParticlePusher):
        self.sim = sim

    def step(self, n: int = 1) -> None:
        self.sim.step(n)

    def render(self) -> np.ndarray:
        return np.asarray(frame_to_uint8(self.sim.density()))

    def diagnostics(self) -> dict:
        st = getattr(self.sim, "_sorted_state", None)
        if st is not None:  # tile-sorted fast path: mask filler rows
            d = pusher_diagnostics(st.position, st.velocity, st.alive,
                                   valid=st.valid)
        else:
            d = pusher_diagnostics(self.sim.state.position,
                                   self.sim.state.velocity,
                                   self.sim.state.alive)
        return {k: float(v) for k, v in d.items()}


class ESAdapter:
    """1D electrostatic PIC: (x, v) phase-space frame + energy diagnostics."""

    model = "es"

    def __init__(self, sim, bins=(400, 200)):
        self.sim = sim
        self.bins = bins
        v = np.asarray(sim.state.velocity)
        self.v_lim = float(max(3.0 * np.abs(v).max(), 1e-6))

    def step(self, n: int = 1) -> None:
        self.sim.step(n)

    def render(self) -> np.ndarray:
        from ..utils.colormaps import preset

        cells = self.sim.config.grid_shape[0]
        h = np.asarray(_phase_hist(
            self.sim.state.position[:, 0], self.sim.state.velocity[:, 0],
            jnp.float32(self.v_lim), self.bins, cells))
        top = float(np.percentile(h, 99.5)) or 1.0
        cm = preset("hot", 0.0, top)
        return np.ascontiguousarray(np.asarray(cm.apply(h.T[::-1])))

    def diagnostics(self) -> dict:
        return {k: float(v) for k, v in self.sim.energies().items()}


class EMAdapter:
    """2D electromagnetic PIC: B_x filamentation frame + energy diagnostics."""

    model = "em"

    def __init__(self, sim):
        self.sim = sim

    def step(self, n: int = 1) -> None:
        self.sim.step(n)

    def render(self) -> np.ndarray:
        from ..utils.colormaps import preset

        bx = np.asarray(self.sim.state.b)[..., 0]
        lim = float(np.abs(bx).max()) or 1.0
        cm = preset("doppler", -lim, lim)
        return np.ascontiguousarray(np.asarray(cm.apply(bx.T[::-1])))

    def diagnostics(self) -> dict:
        return {k: float(v) for k, v in self.sim.energies().items()}


def _make_adapter(body: dict):
    """Scenario registry: config body -> model adapter."""
    model = body.get("model", "pusher")
    if model == "pusher":
        spec = {k: body[k] for k in ("radius", "height", "nr", "nz", "dt",
                                     "nparticles", "particle_mass",
                                     "particle_charge")}
        sim = CylindricalParticlePusher(spec)
        if body.get("scenario") == "default":
            apply_default_scenario(sim)
        return PusherAdapter(sim)
    kwargs = {k: v for k, v in body.items() if k not in ("model", "scenario")}
    if model == "es":
        from ..models import electrostatic as es

        scenario = body.get("scenario", "two_stream")
        factory = {"two_stream": es.two_stream, "landau": es.landau}[scenario]
        return ESAdapter(factory(**kwargs))
    if model == "em":
        from ..models import electromagnetic as em

        scenario = body.get("scenario", "weibel")
        factory = {"weibel": em.weibel}[scenario]
        return EMAdapter(factory(**kwargs))
    raise KeyError(f"unknown model {model!r} (pusher|es|em)")


class SimulationService:
    """Owns the simulation + run thread; thread-safe via a single lock."""

    def __init__(self, sample_every: int = 10, series_len: int = 4096):
        self.lock = threading.Lock()
        self.sim = None  # a *Adapter
        self.running = False
        self.fps = 0.0
        self.steps = 0
        self.sample_every = sample_every
        self.series: collections.deque = collections.deque(maxlen=series_len)
        self._frame_png: bytes = encode_png(np.zeros((8, 8, 3), np.uint8))
        self._thread: threading.Thread | None = None

    # ------------------------------------------------------------- commands
    def configure(self, body: dict) -> dict:
        adapter = _make_adapter(body)
        with self.lock:
            self.sim = adapter
            self.steps = 0
            self.series.clear()
            self._render_locked()
            self._sample_locked()
        return {"ok": True, "model": adapter.model}

    def set_values(self, body: dict) -> dict:
        with self.lock:
            self.sim.sim.set({k: np.asarray(v, np.float32)
                              for k, v in body.items()})
        return {"ok": True}

    def field_command(self, name: str, body: dict) -> dict:
        with self.lock:
            sim = self.sim.sim  # field commands are pusher-engine surface
            if name == "add_current_loop":
                sim.add_current_loop(body["r"], body["z"], body["I"])
            elif name == "add_current_z":
                sim.add_current_z(body["I"])
            elif name == "add_bz":
                sim.add_bz(body["Bz"])
            elif name == "add_btheta":
                sim.add_btheta(body["Btheta"])
            elif name == "add_spindle_cusp_plasma_field":
                # engine surface of empic.js:1369-1378 (reference ignores its
                # own r/B_c/beta_c args and hard-codes the BEM solve; here
                # the physical inputs are explicit)
                sim.add_spindle_cusp_plasma_field(
                    body["coil_current"], int(body.get("n_power", 3)))
            elif name == "precalc":
                sim.precalc()
            elif name == "enable_fast_path":
                sim.enable_fast_path(**{
                    k: v for k, v in body.items()
                    if k in ("sink_box", "source_box", "uniform_e")})
            elif name == "disable_fast_path":
                sim.disable_fast_path()
            elif name == "enable_sorted_path":
                sim.enable_sorted_path(**{
                    k: v for k, v in body.items()
                    if k in ("resort_every", "spill_capacity", "backend",
                             "rng_impl", "repair", "repair_free_slots")})
            elif name == "disable_sorted_path":
                sim.disable_sorted_path()
            else:
                raise KeyError(name)
            self._render_locked()
        return {"ok": True}

    def step_once(self, n: int) -> dict:
        with self.lock:
            self.sim.step(n)
            self.steps += n
            self._render_locked()
            self._sample_locked()
        return {"ok": True, "steps": self.steps}

    # ------------------------------------------------------------- run loop
    def start(self) -> dict:
        if self.sim is None:
            return {"ok": False, "error": "not configured"}
        with self.lock:  # two concurrent POSTs must not spawn two run threads
            if not self.running:
                self.running = True
                self._thread = threading.Thread(target=self._run, daemon=True)
                self._thread.start()
        return {"ok": True}

    def stop(self) -> dict:
        self.running = False
        self.fps = 0.0  # parity: fps resets to 0 on stop (fusionsim.js:197-199)
        return {"ok": True}

    def _run(self):
        win_start = time.perf_counter()
        win_frames = 0
        while self.running:
            with self.lock:
                self.sim.step()
                self.steps += 1
                self._render_locked()
                if self.steps % self.sample_every == 0:
                    self._sample_locked()
            win_frames += 1
            now = time.perf_counter()
            if now - win_start >= 1.0:  # 1 s FPS window, fusionsim.js:186-192
                self.fps = win_frames / (now - win_start)
                win_start = now
                win_frames = 0

    def _render_locked(self):
        self._frame_png = encode_png(self.sim.render())

    def _sample_locked(self):
        self.series.append({"step": self.steps, "time": time.time(),
                            **self.sim.diagnostics()})

    # -------------------------------------------------------------- queries
    def state(self) -> dict:
        out = {"running": self.running, "fps": self.fps, "steps": self.steps,
               "configured": self.sim is not None}
        if self.sim is not None:
            out["model"] = self.sim.model
            with self.lock:
                out["diagnostics"] = self.sim.diagnostics()
        return out

    def diagnostics_series(self, since: int = -1) -> dict:
        with self.lock:
            samples = [s for s in self.series if s["step"] > since]
        return {"series": samples, "sample_every": self.sample_every}

    def frame_png(self) -> bytes:
        return self._frame_png


def make_handler(service: SimulationService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _json(self, obj, code=200):
            data = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            path = self.path.split("?")[0]
            if path == "/":
                data = _PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
            elif path == "/frame.png":
                data = service.frame_png()
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
            elif path == "/api/state":
                self._json(service.state())
            elif path == "/api/diagnostics":
                q = dict(p.split("=", 1) for p in
                         self.path.partition("?")[2].split("&") if "=" in p)
                self._json(service.diagnostics_series(
                    since=int(q.get("since", -1))))
            else:
                self._json({"error": "not found"}, 404)

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(length) or b"{}")
            path = self.path.split("?")[0]
            try:
                if path == "/api/config":
                    self._json(service.configure(body))
                elif path == "/api/set":
                    self._json(service.set_values(body))
                elif path == "/api/start":
                    self._json(service.start())
                elif path == "/api/stop":
                    self._json(service.stop())
                elif path == "/api/step":
                    self._json(service.step_once(int(body.get("n", 1))))
                elif path.startswith("/api/"):
                    self._json(service.field_command(path[len("/api/"):], body))
                else:
                    self._json({"error": "not found"}, 404)
            except Exception as e:  # surface errors as JSON, fail-fast style
                self._json({"ok": False, "error": f"{type(e).__name__}: {e}"}, 400)

    return Handler


def serve(host: str = "127.0.0.1", port: int = 8080) -> ThreadingHTTPServer:
    """Start the viewer server (returns the server; call serve_forever)."""
    service = SimulationService()
    server = ThreadingHTTPServer((host, port), make_handler(service))
    server.service = service
    return server


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    args = ap.parse_args()
    srv = serve(args.host, args.port)
    print(f"fusion-sim tpu viewer on http://{args.host}:{args.port}")
    srv.serve_forever()
