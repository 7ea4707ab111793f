"""Utility-layer tests: colormaps, figures, diagnostics, PNG, checkpoints,
block reductions, viewer HTTP API."""

import io
import json
import threading
import urllib.request

import numpy as np
import jax.numpy as jnp

from fusion_sim_tpu.ops.reduce import block_avg, block_max, pyramid_sum
from fusion_sim_tpu.utils import figure
from fusion_sim_tpu.utils.checkpoint import load_npz, save_npz
from fusion_sim_tpu.utils.colormaps import ColorMap, Range, preset
from fusion_sim_tpu.utils.diagnostics import (
    DiagnosticsRecorder,
    energy_drift,
    pusher_diagnostics,
)
from fusion_sim_tpu.utils.png import _encode_python, encode_png


def test_range_norm():
    r = Range(min=2.0, max=4.0)
    assert r.norm(2.0) == 0.0 and r.norm(4.0) == 1.0
    assert r.norm(3.0) == 0.5
    assert r.norm(0.0) == 0.0 and r.norm(10.0) == 1.0  # clamped


def test_colormap_gray_identity():
    cm = preset("gray", 0, 1, 256)
    np.testing.assert_array_equal(cm.rgb(0.0), [0, 0, 0])
    assert (cm.rgb(1.0) >= 254).all()
    mid = cm.rgb(0.5)
    assert abs(int(mid[0]) - 127) <= 1 and (mid == mid[0]).all()


def test_colormap_jet_structure():
    cm = preset("jet", 0, 1, 256)
    low = cm.rgb(0.0)   # blue end
    high = cm.rgb(1.0)  # red end
    assert low[2] > low[0] and high[0] > high[2]


def test_all_presets_build():
    from fusion_sim_tpu.utils.colormaps import PRESETS
    assert len(PRESETS) == 25
    for name in PRESETS:
        cm = preset(name)
        assert cm.lut.shape == (256, 3)


def test_colormap_apply_device():
    cm = preset("hot", 0, 10, 64)
    field = jnp.linspace(0, 10, 128).reshape(8, 16)
    rgb = np.asarray(cm.apply(field))
    assert rgb.shape == (8, 16, 3)
    assert rgb[0, 0].sum() <= 3 and rgb[-1, -1].sum() >= 750


def test_figure_compositing_and_click():
    cm = preset("gray", 0, 1)
    fig = figure.CanvasFigure(40, 30, background=(10, 10, 10))
    fig.add_layer(figure.Plot2DArea(0, 0, 20, 30, cm, np.ones((30, 20)) * 0.5))
    fig.add_layer(figure.ColorBar(25, 0, 5, 30, cm))
    canvas = fig.redraw()
    assert canvas.shape == (30, 40, 3)
    assert (canvas[:, 21:24] == 10).all()          # gap keeps background
    assert abs(int(canvas[5, 5, 0]) - 127) <= 1    # plot area mid-gray
    assert canvas[0, 26, 0] > canvas[-1, 26, 0]    # colorbar top = max

    a = figure.ClickArea(0, 0, 10, 10, "a")
    b = figure.ClickArea(20, 0, 10, 10, "b")
    fig.add_click_area(a)
    fig.add_click_area(b)
    assert fig.click(5, 5) == [a]
    assert set(fig.click(25, 5, ctrl=True)) == {a, b}   # ctrl adds
    assert fig.click(25, 5) == [b]                      # plain click exclusive
    assert fig.click(15, 15) == []                      # miss clears


def test_image_click_area_mask():
    mask = np.zeros((10, 10), np.float32)
    mask[2:5, 2:5] = 1.0
    area = figure.ImageClickArea(0, 0, 10, 10, "img", mask=mask)
    assert area.contains(3, 3)        # opaque pixel
    assert not area.contains(8, 8)    # transparent pixel
    assert not area.contains(15, 3)   # outside rect


def test_animation_loop_runs_and_stops():
    fig = figure.CanvasFigure(4, 4)
    seen = []
    anim = figure.Animation([fig])
    frames = anim.run(lambda t: seen.append(t), max_frames=5)
    assert frames == 5 and len(seen) == 5


def test_block_reductions():
    f = jnp.arange(16.0).reshape(4, 4)
    mx = np.asarray(block_max(f, (2, 2)))
    np.testing.assert_array_equal(mx, [[5, 7], [13, 15]])
    av = np.asarray(block_avg(f, (2, 2)))
    np.testing.assert_array_equal(av, [[2.5, 4.5], [10.5, 12.5]])
    ps = np.asarray(pyramid_sum(f, 2))
    np.testing.assert_allclose(ps, [[f.sum()]])


def test_diagnostics():
    pos = jnp.array([[0.3, 0.4, 0.5], [0.0, 0.1, 0.9]])
    vel = jnp.array([[0.001, 0.0, 0.0], [0.0, 0.002, 0.0]])
    alive = jnp.array([1.0, 0.0])
    d = pusher_diagnostics(pos, vel, alive)
    np.testing.assert_allclose(float(d["respawn_fraction"]), 0.5)
    np.testing.assert_allclose(float(d["kinetic"]),
                               0.5 * (0.001**2 + 0.002**2), rtol=1e-5)
    assert energy_drift([1.0, 1.0005, 0.9995]) <= 5.1e-4
    rec = DiagnosticsRecorder(n_particles=100, window_seconds=0.0)
    rec.record(0, d)
    assert rec.series("kinetic")[0] > 0
    rate = rec.tick(10)
    assert rate["pushes_per_sec"] >= 0


def test_png_roundtrip_both_paths():
    from PIL import Image
    rng = np.random.default_rng(1)
    img = (rng.random((32, 48, 3)) * 255).astype(np.uint8)
    for data in (encode_png(img), _encode_python(img, 3)):
        back = np.asarray(Image.open(io.BytesIO(data)))
        np.testing.assert_array_equal(back, img)


def test_checkpoint_npz_roundtrip(tmp_path):
    blob = {"a": np.arange(5.0), "b.c": np.ones((2, 3), np.float32)}
    p = str(tmp_path / "ck.npz")
    save_npz(p, blob)
    out = load_npz(p)
    assert set(out) == {"a", "b.c"}
    np.testing.assert_array_equal(out["a"], blob["a"])


def test_debug_sanitizers():
    import jax
    import pytest

    from fusion_sim_tpu.utils.debug import assert_finite, checked, debug_nans

    # assert_finite flags the offending leaf
    good = {"a": jnp.ones(3), "b": jnp.zeros((2, 2))}
    assert_finite(good)
    bad = {"a": jnp.ones(3), "b": jnp.array([1.0, np.nan])}
    with pytest.raises(FloatingPointError, match="b"):
        assert_finite(bad)

    # checkify wrapper surfaces a NaN as an error value
    def f(x):
        return jnp.log(x)

    err, out = checked(f)(jnp.array(-1.0))
    with pytest.raises(Exception):
        err.throw()

    # debug_nans restores the flag
    prev = jax.config.jax_debug_nans
    with debug_nans(True):
        assert jax.config.jax_debug_nans is True
    assert jax.config.jax_debug_nans == prev


def test_profiling_timer():
    import time as _time

    from fusion_sim_tpu.utils.profiling import Timer

    t = Timer()
    with t.phase("work"):
        _time.sleep(0.01)
    with t.phase("work"):
        _time.sleep(0.01)
    rep = t.report()
    assert rep["work"]["count"] == 2
    assert rep["work"]["total_s"] >= 0.02


def test_scenarios_factory_matches_reference_setup():
    from fusion_sim_tpu.scenarios import default_scenario_arrays

    spec = {"nr": 400, "nz": 800, "nparticles": 4, "height": 2.0}
    arrs = default_scenario_arrays(spec)
    sink = arrs["sink_mask"]
    # fusionsim.js:103-112: r_max wall absorbs at all z; z walls absorb for
    # r-rows 1..nr-2 (axis row kept)
    assert (sink[-1, :] == 0).all()
    assert (sink[1:-1, 0] == 0).all() and (sink[1:-1, -1] == 0).all()
    assert sink[0, 0] == 1 and sink[0, -1] == 1
    # source box: r-cells [0,50), z-cells [350,450) at this grid
    src = arrs["source_pdf"]
    assert src[:50, 350:450].all() and src.sum() == 50 * 100


def test_checkpoint_orbax_roundtrip(tmp_path):
    from fusion_sim_tpu.utils.checkpoint import load_orbax, save_orbax

    tree = {"pos": jnp.arange(12.0).reshape(3, 4), "step": jnp.int32(7)}
    path = str(tmp_path / "orbax_ck")
    save_orbax(path, tree)
    template = {"pos": jnp.zeros((3, 4)), "step": jnp.int32(0)}
    out = load_orbax(path, template)
    np.testing.assert_array_equal(np.asarray(out["pos"]), np.asarray(tree["pos"]))
    assert int(out["step"]) == 7


def test_viewer_http_api():
    """End-to-end: configure a tiny sim over HTTP, step it, fetch the frame."""
    from fusion_sim_tpu.viewer.server import serve

    srv = serve(port=0)  # ephemeral port
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"

    def post(path, obj=None):
        req = urllib.request.Request(
            base + path, data=json.dumps(obj or {}).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            return json.loads(r.read())

    def get(path):
        with urllib.request.urlopen(base + path, timeout=60) as r:
            return r.read()

    try:
        out = post("/api/config", {
            "radius": 1.0, "height": 2.0, "nr": 16, "nz": 32, "dt": 2e-9,
            "nparticles": 8, "particle_mass": 1.67e-27,
            "particle_charge": 1.602e-19, "scenario": "default"})
        assert out["ok"]
        out = post("/api/add_bz", {"Bz": 0.01})
        assert out["ok"]
        out = post("/api/precalc")
        assert out["ok"]
        out = post("/api/step", {"n": 3})
        assert out["steps"] == 3
        state = json.loads(get("/api/state"))
        assert state["configured"] and state["steps"] == 3
        assert "diagnostics" in state
        frame = get("/frame.png")
        assert frame[:8] == b"\x89PNG\r\n\x1a\n"
        page = get("/")
        assert b"fusion-sim tpu" in page
        # fast-path toggle endpoints
        out = post("/api/enable_fast_path", {})
        assert out["ok"]
        out = post("/api/step", {"n": 2})
        assert out["steps"] == 5
        out = post("/api/disable_fast_path", {})
        assert out["ok"]
        # sorted-path toggle endpoints (tile-sorted windowed gathers)
        out = post("/api/enable_sorted_path", {"resort_every": 4})
        assert out["ok"]
        out = post("/api/step", {"n": 2})
        assert out["steps"] == 7
        state = json.loads(get("/api/state"))
        assert "diagnostics" in state
        out = post("/api/disable_sorted_path", {})
        assert out["ok"]
        # error path: unknown field command
        try:
            post("/api/bogus", {})
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.shutdown()

def test_viewer_model_registry_and_diagnostics_series():
    """ES/EM scenario serving, the spindle endpoint, and the diagnostics
    time-series endpoint (the full engine surface of empic.js:1157-1526)."""
    from fusion_sim_tpu.viewer.server import serve

    srv = serve(port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"

    def post(path, obj=None):
        req = urllib.request.Request(
            base + path, data=json.dumps(obj or {}).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read())

    def get(path):
        with urllib.request.urlopen(base + path, timeout=120) as r:
            return r.read()

    try:
        # ES two-stream scenario served with phase-space frames
        out = post("/api/config", {"model": "es", "scenario": "two_stream",
                                   "n_particles": 2048, "n_cells": 32})
        assert out["ok"] and out["model"] == "es"
        assert post("/api/step", {"n": 4})["steps"] == 4
        assert get("/frame.png")[:4] == b"\x89PNG"
        diag = json.loads(get("/api/diagnostics"))
        assert len(diag["series"]) >= 2  # configure sample + step sample
        assert {"step", "field", "kinetic"} <= set(diag["series"][-1])
        # since= filters by step
        diag0 = json.loads(get("/api/diagnostics?since=3"))
        assert all(s["step"] > 3 for s in diag0["series"])

        # EM weibel scenario
        out = post("/api/config", {"model": "em", "scenario": "weibel",
                                   "n_particles": 4096, "n_cells": 16})
        assert out["ok"] and out["model"] == "em"
        assert post("/api/step", {"n": 2})["steps"] == 2
        assert get("/frame.png")[:4] == b"\x89PNG"
        assert json.loads(get("/api/state"))["model"] == "em"

        # pusher + the spindle-cusp BEM endpoint (empic.js:1369-1378)
        out = post("/api/config", {
            "radius": 1.0, "height": 2.0, "nr": 16, "nz": 32, "dt": 2e-9,
            "nparticles": 8, "particle_mass": 1.67e-27,
            "particle_charge": 1.602e-19})
        assert out["ok"] and out["model"] == "pusher"
        out = post("/api/add_spindle_cusp_plasma_field",
                   {"coil_current": 1e6, "n_power": 2})
        assert out["ok"]
        assert post("/api/precalc")["ok"]
        assert post("/api/step", {"n": 1})["steps"] == 1
    finally:
        srv.shutdown()
