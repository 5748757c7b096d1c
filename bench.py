"""Driver benchmark: one JSON line, all five BASELINE.md configs.

The headline metric (top-level keys) is BASELINE config 4 — wide-area
~100-tile terrain, 4096x1024 360-degree panorama with atmospheric shading on
one chip, target <= 16 ms. ``vs_baseline`` = target_ms / measured_ms (>= 1
means the target is met; higher is better).

The ``configs`` key carries all five BASELINE configs so the driver's
BENCH_r{N}.json can catch regressions outside the headline mode:

  1. exact-parity perspective frame, 800x450, engine-default knobs
     (guided quad-track march; stage breakdown under "stages")
  2. 2048x512 360-degree panorama with distance fog ("correct + fast")
  3. peak-label pass through the PRODUCTION fused frame+labels program
     (one dispatch; the packed visibility rides INSIDE the frame's wire
     pull — zero extra transfers; host layout memoized)
  4. the headline atmospheric panorama (+ per-stage breakdown)
  5. batched throughput: 256 viewpoints, 1024x256 panoramas (>= 256/s)
  6. interactive 800x450 fast frame, sustained pipelined (server-side
     frame loop: render + yuv420 wire encode + ONE host pull per frame)

Terrain is generated on device (12001^2 texels — ~100 COP-90 tiles of
3-arcsec data, ~5 GB of tables) to keep the benchmark independent of
host->device tunnel bandwidth; the clipmap makes render cost independent of
the loaded-tile count.
"""

import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

TARGET_MS = 16.0  # config 4
TARGET_PANOS_PER_S = 256.0  # config 5

HEADLINE = "ms per 4096x1024 panorama (atmospheric shading, 1 chip)"

# BENCH_SMOKE=1: tiny shapes so the full script (incl. stats/JSON
# assembly) executes in minutes on CPU — a code-path check, NOT a
# measurement. The driver runs without it.
SMOKE = bool(int(os.environ.get("BENCH_SMOKE", "0")))


def _sustained_stats(run, reps=20, chunks=4):
    """Sustained pipelined wall-clock with dispersion.

    Dispatches ``reps // chunks`` iterations back-to-back per chunk (so
    pipelining inside a chunk matches production serving) and reports the
    chunk means: tunnel sessions drift ±30-50% between rounds (NOTES.md), so
    the driver needs min/stddev to tell session drift from regressions
    (round-3 verdict item 7)."""
    jax.block_until_ready(run())  # compile
    per = max(1, reps // chunks)
    samples = []
    for _ in range(chunks):
        t0 = time.perf_counter()
        outs = [run() for _ in range(per)]
        jax.block_until_ready(outs)
        samples.append((time.perf_counter() - t0) / per * 1e3)
    mean = sum(samples) / len(samples)
    var = sum((s - mean) ** 2 for s in samples) / len(samples)
    return {
        "mean": mean,
        "min": min(samples),
        "stddev": var ** 0.5,
        "reps": per * chunks,
    }


def _stats_field(st):
    return {
        "min": round(st["min"], 2),
        "stddev": round(st["stddev"], 2),
        "reps": st["reps"],
    }


def _sustained_ms(run, reps=20):
    return _sustained_stats(run, reps=reps)["mean"]


def _emit(configs, error=None, tunnel_down=False):
    """One JSON line, always — even when the device backend is gone.

    The headline keys are derived from config 4 when it completed; a
    tunnel outage mid-run still publishes every config that finished
    (round-4 lost its whole measurement record to a bare traceback —
    VERDICT r4 'what's weak' item 2)."""
    configs = sorted(configs, key=lambda c: c["config"])
    c4 = next((c for c in configs if c["config"] == 4), None)
    out = {
        "metric": HEADLINE,
        "value": c4["value"] if c4 else None,
        "unit": "ms",
        "vs_baseline": c4["vs_baseline"] if c4 else None,
        "configs": configs,
    }
    if tunnel_down:
        out["tunnel_down"] = True
    if error is not None:
        out["error"] = error
    print(json.dumps(out))


def _probe_backend():
    """Wait (bounded) for a usable device backend before the heavy run.

    The axon TPU tunnel is single-client and a killed jax process can wedge
    it for minutes (NOTES.md) — so probe in a SUBPROCESS (a failed backend
    init is cached for the life of a jax process) with retry/backoff for a
    bounded budget. Returns None when a device op succeeds, else the last
    error line."""
    budget_s = float(os.environ.get("BENCH_PROBE_BUDGET_S", "720"))
    deadline = time.time() + budget_s
    delay = 15.0
    last_err = "no probe attempt completed"
    code = (
        "import jax, jax.numpy as jnp;"
        "jnp.ones((8,), jnp.float32).sum().block_until_ready();"
        "print('BENCH_PROBE_OK')"
    )
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True, timeout=max(180.0, budget_s / 2),
            )
            if r.returncode == 0 and "BENCH_PROBE_OK" in r.stdout:
                return None
            tail = (r.stderr or r.stdout or "").strip().splitlines()
            last_err = tail[-1] if tail else f"probe rc={r.returncode}"
        except subprocess.TimeoutExpired:
            last_err = "probe subprocess timed out"
        if time.time() + delay > deadline:
            return last_err
        time.sleep(delay)
        delay = min(delay * 1.7, 120.0)


def main(configs):
    sys.path.insert(0, "scripts")
    from perf_probe import eye_at, synthetic_mosaic_device

    from topo_renderer_tpu.models.camera import Camera
    from topo_renderer_tpu.ops.panorama import (
        PanoramaSpec,
        extract_clipmap_windows,
        panorama_crossing_prepass,
        render_panorama,
    )
    from topo_renderer_tpu.ops.raycast import render_perspective
    from topo_renderer_tpu.render import text as text_mod

    mosaic = synthetic_mosaic_device(n=801 if SMOKE else 12001)
    jax.block_until_ready(mosaic.heights_flat)

    eye = eye_at(47.0, 23.0, 2800.0)  # mosaic center
    sun = jnp.array([0.3, 0.5, 0.8], jnp.float32)

    # ---- config 4 (headline): 4096x1024 atmospheric panorama, LOD fast ----
    spec4 = (
        PanoramaSpec.fast(width=512, height=128, n_steps=128)
        if SMOKE
        else PanoramaSpec.fast(width=4096, height=1024, n_steps=512)
    )

    def run4():
        # Two-program path (like render/engine.py): window extraction keeps
        # the full tables out of the render program's parameter uses, so XLA
        # doesn't re-stream them cross-program-prefetching every frame.
        win = extract_clipmap_windows(mosaic, eye, spec4)
        return render_panorama(
            mosaic, eye, spec4, sun, fog="atmosphere", windows=win
        )

    st4 = _sustained_stats(lambda: run4()["color"])
    ms4 = st4["mean"]

    # Per-stage breakdown (round-2 verdict item 9): extraction alone, then
    # extraction + render; the render program's internal split
    # (profile/crossing/tail) is taken from scripts/stage_probe.py's
    # decomposition methodology at the same shapes.
    ms4_extract = _sustained_ms(
        lambda: extract_clipmap_windows(mosaic, eye, spec4), reps=20
    )
    stages4 = {
        "extract_ms": round(ms4_extract, 2),
        "render_ms": round(ms4 - ms4_extract, 2),
    }
    configs.append(
        {
            "config": 4,
            "metric": "ms per 4096x1024 panorama (atmospheric shading, 1 chip)",
            "value": round(ms4, 2),
            "unit": "ms",
            "target": TARGET_MS,
            "vs_baseline": round(TARGET_MS / ms4, 4),
            "stats": _stats_field(st4),
            "stages": stages4,
        }
    )

    # ---- config 2: 2048x512 panorama, distance fog ----
    spec2 = (
        PanoramaSpec.fast(width=256, height=64, n_steps=128)
        if SMOKE
        else PanoramaSpec.fast(width=2048, height=512, n_steps=512)
    )

    def run2():
        win = extract_clipmap_windows(mosaic, eye, spec2)
        return render_panorama(
            mosaic, eye, spec2, sun, fog="distance", windows=win
        )["color"]

    st2 = _sustained_stats(run2)
    ms2 = st2["mean"]
    configs.append(
        {
            "config": 2,
            "metric": "ms per 2048x512 panorama (distance fog)",
            "value": round(ms2, 2),
            "unit": "ms",
            "target": None,
            "vs_baseline": None,
            "stats": _stats_field(st2),
        }
    )

    # ---- peak fixtures (config 3, 5) ----
    rng = np.random.default_rng(7)
    P = 512
    lat = 47.0 + rng.uniform(-0.9, 0.9, P)
    lon = 23.0 + rng.uniform(-0.9, 0.9, P)
    alt = rng.uniform(800.0, 3200.0, P)
    peaks = np.stack(
        [np.asarray(eye_at(a, o, h)) for a, o, h in zip(lat, lon, alt)]
    ).astype(np.float32)
    pos = jnp.asarray(peaks)
    valid = jnp.ones((P,), bool)
    names = [f"Peak {i}" for i in range(P)]

    from topo_renderer_tpu.geo import GeoLocation

    loc = GeoLocation.from_coord(47, 23)

    _layout_memo = {}

    def layout_from_packed(packed_np):
        key = packed_np.tobytes()
        if key in _layout_memo:
            return _layout_memo[key]
        visible, xs, ys = packed_np[0].astype(bool), packed_np[1], packed_np[2]
        labels = {
            loc: [(i, (int(xs[i]), int(ys[i]))) for i in range(P) if visible[i]]
        }
        out = text_mod.layout_labels(
            labels, lambda _loc, i: text_mod.measure_text(names[i])
        )
        _layout_memo[key] = out
        return out

    # (config 3 is measured AFTER config 6: its label_overhead stage is the
    # delta between the fused frame+labels wire loop and config 6's
    # label-free wire loop at the same viewport — apples to apples.)

    # ---- config 5: batched throughput, 256 viewpoints at 1024x256 ----
    spec5 = (
        PanoramaSpec.fast(width=256, height=64, n_steps=128)
        if SMOKE
        else PanoramaSpec.fast(width=1024, height=256, n_steps=512)
    )
    B = 4 if SMOKE else 256
    eyes = [
        eye_at(47.0 + float(a), 23.0 + float(o), 2500.0)
        for a, o in zip(
            rng.uniform(-0.8, 0.8, B), rng.uniform(-0.8, 0.8, B)
        )
    ]

    from topo_renderer_tpu.ops.panorama import render_batch_scan

    eyes_arr = jnp.stack(eyes)
    suns5 = jnp.broadcast_to(sun, (B, 3))

    def run5():
        # One program for the whole batch: device-side scan over per-eye
        # extract+render (single dispatch, single-eye gather locality).
        return render_batch_scan(mosaic, eyes_arr, suns5, spec5, fog="atmosphere")

    jax.block_until_ready(run5())  # compile
    samples5 = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run5())
        samples5.append(B / (time.perf_counter() - t0))
    panos_per_s = sum(samples5) / len(samples5)
    var5 = sum((s - panos_per_s) ** 2 for s in samples5) / len(samples5)
    configs.append(
        {
            "config": 5,
            "metric": "1024x256 panoramas/sec (256 viewpoints, 1 chip)",
            "value": round(panos_per_s, 1),
            "unit": "panoramas/s",
            "target": TARGET_PANOS_PER_S,
            "vs_baseline": round(panos_per_s / TARGET_PANOS_PER_S, 4),
            "stats": {
                "min": round(min(samples5), 1),
                "stddev": round(var5 ** 0.5, 1),
                "reps": 3 * B,
            },
        }
    )

    # ---- config 1: exact-parity perspective frame, 800x450 ----
    # Engine-default knobs (render/engine.py::render fast=False):
    # guided quad-track march, n_steps=1024, n_refine=24.
    cam = Camera(eye=eye, pitch=-0.05, yaw=0.8)

    import math

    fov = math.radians(45.0)

    W1, H1 = (160, 90) if SMOKE else (800, 450)

    def run1():
        return render_perspective(
            mosaic, cam, width=W1, height=H1, n_steps=1024, n_refine=24,
            guided=True, fov_hint=fov,
        )["color"]

    st1 = _sustained_stats(run1, reps=12)
    ms1 = st1["mean"]

    # Stage split: the prepass (profile gathers + crossing search) vs the
    # per-pixel windowed march (the remainder). The prepass spec comes from
    # the march itself (`guided_prepass_spec`) so a knob change cannot
    # silently skew the attribution (round-3 verdict item 8).
    from topo_renderer_tpu.ops.raycast import (
        guided_march_defaults,
        guided_march_rounds,
        guided_prepass_spec,
    )

    gmd = guided_march_defaults()  # the march's ACTUAL shipped knobs
    spec_pre, _, _ = guided_prepass_spec(
        height=H1, fov_hint=fov, aspect=W1 / H1, n_steps=1024,
        supersample=gmd["supersample"],
        elev_supersample=gmd.get("elev_supersample", 1.0),
    )
    ms1_pre = _sustained_ms(
        lambda: panorama_crossing_prepass(
            mosaic, eye, spec_pre, bound_stride=gmd["bound_stride"]
        )["d_lo"],
        reps=12,
    )
    # Round-count decomposition (both derived from the engine, never
    # re-derived here): the march's cost unit is one packed cell-row
    # gather per pixel per round; NOTES.md's gather-rate ground truth puts
    # the per-round floor at ~50-75 M rows/s regardless of table layout.
    rounds1 = guided_march_rounds(
        n_window=gmd["n_window"], n_cells=gmd["n_cells"],
        guard_legs=gmd["guard_legs"], nw_guard=gmd["nw_guard"],
        split_brackets=gmd["split_brackets"],
    )

    # The engine's exact_quality="auto" policy serves MOTION frames on the
    # 9-round union+own rung (render/engine.py::_resolve_exact_quality) and
    # settle frames on the full budget above — measure the rung too, so the
    # BENCH record carries the shipped ladder and the per-round gather wall
    # (march-class gathers are lane-duplication-bound, NOTES.md: no table
    # or layout trick moves them; cost scales with ROUND COUNT).
    from topo_renderer_tpu.render.engine import RenderEngine

    rung_kw = RenderEngine._EXACT_RUNG_INTERACTIVE

    def run1_rung():
        return render_perspective(
            mosaic, cam, width=W1, height=H1, n_steps=1024, n_refine=24,
            guided=True, fov_hint=fov, guided_kw=rung_kw,
        )["color"]

    st1r = _sustained_stats(run1_rung, reps=12)
    rkw = dict(rung_kw)
    rounds1_rung = guided_march_rounds(
        n_window=rkw.get("n_window", gmd["n_window"]),
        n_cells=rkw.get("n_cells", gmd["n_cells"]),
        guard_legs=rkw.get("guard_legs", gmd["guard_legs"]),
        nw_guard=rkw.get("nw_guard", gmd["nw_guard"]),
        split_brackets=rkw.get("split_brackets", gmd["split_brackets"]),
    )
    configs.append(
        {
            "config": 1,
            "metric": "ms per exact 800x450 perspective frame (engine-default guided march)",
            "value": round(ms1, 1),
            "unit": "ms",
            "target": None,
            "vs_baseline": None,
            "stats": _stats_field(st1),
            "stages": {
                "prepass_ms": round(ms1_pre, 2),
                "march_ms": round(ms1 - ms1_pre, 2),
                "gather_rounds": rounds1,
                "ms_per_round": round(max(ms1 - ms1_pre, 0.0) / rounds1, 2),
                # exact_quality="auto" motion-frame rung (settle = value).
                "interactive_rung_ms": round(st1r["mean"], 1),
                "rung_rounds": rounds1_rung,
                "rung_ms_per_round": round(
                    max(st1r["mean"] - ms1_pre, 0.0) / rounds1_rung, 2
                ),
            },
        }
    )

    # ---- config 6: interactive fast frame, sustained pipelined wire pull ----
    # The production web frame loop (`frontends/web/server.py::frame`):
    # device renders + encodes the one-transfer wire vector
    # (`render/transport.py`, yuv420 = half the raw-u8 bytes at
    # JPEG-equivalent quality), the host pulls ONE buffer per frame
    # (1-deep pipelined) and decodes it outside the render lock.
    from topo_renderer_tpu.render import transport
    from topo_renderer_tpu.render.engine import _fast_frame_with_labels, _frame_wire

    W6, H6 = (160, 90) if SMOKE else (800, 450)

    def wire_loop(frame_fn, consume, reps=5, chunks=4):
        jax.block_until_ready(frame_fn())  # compile
        samples = []
        for _chunk in range(chunks):
            t0 = time.perf_counter()
            prev = None
            for _ in range(reps):
                cur = frame_fn()
                cur.copy_to_host_async()  # overlap the pull with the render
                if prev is not None:
                    consume(np.asarray(prev))
                prev = cur
            consume(np.asarray(prev))
            samples.append((time.perf_counter() - t0) / reps * 1e3)
        mean = sum(samples) / len(samples)
        var = sum((s - mean) ** 2 for s in samples) / len(samples)
        return {
            "mean": mean, "min": min(samples), "stddev": var ** 0.5,
            "reps": reps * chunks,
        }

    def frame6(mode="yuv420"):
        _out, wirebuf = _frame_wire(
            mosaic, cam, width=W6, height=H6, n_steps=512, n_refine=0,
            pixelize_n=None, fov_hint=fov, fast=True, guided=False,
            wire_mode=mode,
        )
        return wirebuf

    st6 = wire_loop(
        frame6, lambda b: transport.decode_pixels(b, H6, W6, mode="yuv420")
    )
    ms6 = st6["mean"]
    st6_raw = wire_loop(
        lambda: frame6("rgb888"),
        lambda b: transport.decode_pixels(b, H6, W6, mode="rgb888"),
    )
    # Device-only sustained cost (no host pull): what co-located serving
    # pays per frame — the gap to ms6 is pure tunnel/host-transfer RTT.
    ms6_dev = _sustained_ms(frame6, reps=20)
    configs.append(
        {
            "config": 6,
            "metric": (
                "interactive 800x450 fast frame incl. one-transfer host pull"
                " (yuv420 wire, 1-deep pipeline)"
            ),
            "value": round(ms6, 2),
            "unit": "ms",
            "target": None,
            "vs_baseline": None,
            "fps": round(1000.0 / ms6, 1),
            "stats": _stats_field(st6),
            "stages": {
                "device_ms": round(ms6_dev, 2),
                "transport_ms": round(max(ms6 - ms6_dev, 0.0), 2),
                "wire_bytes": transport.pixel_bytes(H6, W6, "yuv420"),
                "rgb888_ms": round(st6_raw["mean"], 2),
                "rgb888_bytes": transport.pixel_bytes(H6, W6, "rgb888"),
            },
        }
    )

    # ---- config 3: peak-label pass through the PRODUCTION fused program ----
    # 512 synthetic peaks; the fused frame+labels program appends the packed
    # visibility bytes to the SAME wire vector (`render/transport.py`), so
    # the label pass adds zero extra transfers: overhead vs config 6 is the
    # device-side visibility test + the memoized host layout.
    def frame3():
        _out, wirebuf = _fast_frame_with_labels(
            mosaic, cam, pos, valid, width=W6, height=H6, n_steps=512,
            pixelize_n=None, fov_hint=fov, tolerance_rel=0.05,
            wire_mode="yuv420",
        )
        return wirebuf

    n_laid = 0

    def consume3(buf):
        nonlocal n_laid
        _img, lab = transport.decode_frame(buf, H6, W6, P, mode="yuv420")
        n_laid = len(layout_from_packed(lab))

    st3 = wire_loop(frame3, consume3)
    ms3 = st3["mean"]
    configs.append(
        {
            "config": 3,
            "metric": (
                f"ms per fused 800x450 frame+label pass (512 peaks -> "
                f"{n_laid} laid out, labels ride the frame pull)"
            ),
            "value": round(ms3, 2),
            "unit": "ms",
            "target": None,
            "vs_baseline": None,
            "stats": _stats_field(st3),
            # min-vs-min delta: the overhead is a few ms riding on a
            # tunnel-RTT-dominated loop whose chunk means absorb transient
            # stalls tens of ms wide (a single wedged pull corrupted the
            # mean-based delta to 84 ms in an early r5 run); the chunk
            # minima are the stall-free samples of the SAME pipelined loop.
            "stages": {
                "label_overhead_ms": round(max(st3["min"] - st6["min"], 0.0), 2)
            },
        }
    )

if __name__ == "__main__":
    probe_err = _probe_backend()
    if probe_err is not None:
        _emit([], error=probe_err, tunnel_down=True)
        sys.exit(0)
    completed = []
    try:
        main(completed)
    except Exception as e:  # tunnel died mid-run: publish what finished
        _emit(completed, error=f"{type(e).__name__}: {e}"[:500], tunnel_down=True)
        sys.exit(0)
    _emit(completed)
