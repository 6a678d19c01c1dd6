#!/usr/bin/env python
"""Headline benchmark: DCVC-DC (DMC) 1080p encode+decode frames/s per chip.

Runs the flagship P-frame codec at 1080p on the available accelerator and
prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N, "extra": {...}}

The headline value is the estimated-bits path (the reference's
write_stream=0 protocol, DCVC-DC/test_video.py) with the RD-gated row-tile
warp (see RDNOTES.md / tools/od_warp_study.py). ``extra`` carries the
exact-warp fps, and the real-coding (write_stream) compress/decompress fps
with actual rANS entropy coding — the reference baseline includes its CPU
entropy coder, so both comparisons are recorded
(timing brackets: DCVC-DC/src/models/video_model.py:526-540).

vs_baseline is measured fps / reference GPU fps. No GPU fps figure is
published in-repo (BASELINE.md); external context for DCVC-DC on A100-era
GPUs is ~0.7 fps for encode+decode at 1080p RGB (~0.8 s enc + 0.6 s dec per
frame) — used as the provisional denominator until a measured reference
number is recorded.
"""

import json
import os
import sys
import threading
import time

import jax

# --- global deadline ---------------------------------------------------
# The driver runs bench.py under `timeout` with a ~30 min budget (round 3's
# artifact is rc=124 exactly 30 min after the first log line — the device
# connect hung for the whole window and nothing was printed). Everything
# below is budgeted against DEADLINE_S so that ONE parseable JSON line is
# ALWAYS emitted before the external kill, whatever the tunnel does.
_T0 = time.time()
DEADLINE_S = float(os.environ.get("DCVC_TPU_BENCH_DEADLINE_S", "1680"))


def _remaining():
    return DEADLINE_S - (time.time() - _T0)

# persistent compilation cache: the DMC program is large and the remote AOT
# compile is slow; cache compiled executables across runs. Skipped when the
# run is forced onto CPU (JAX_PLATFORMS=cpu): XLA:CPU AOT results encode the
# build machine's vector features and loading them on a different host warns
# "+prefer-no-gather not supported... could lead to SIGILL" (MULTICHIP_r03).
if "cpu" not in os.environ.get("JAX_PLATFORMS", "").lower():
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_dcvc")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
import jax.numpy as jnp
import numpy as np

from dcvc_tpu.models.video_dc import DMC

REFERENCE_GPU_FPS = 0.71  # 1/(0.8s enc + 0.6s dec) @1080p, DCVC-DC paper-era
V5E_BF16_PEAK_TFLOPS = 197.0  # per-chip bf16 peak, TPU v5e public spec



# RD-gated TPU default (tools/od_warp_study.py + RDNOTES.md §6): the
# Pallas DMA block warp at the OffsetDiversity site ONLY, exact mc/me —
# the round-5 converged-proxy gate (16 pairs x 3 rate points x 2
# datasets, out/r5_gate.log) passes od-only with 10-60x margin (worst
# dPSNR -0.010 dB) and FAILS the all-sites variant (worst -0.326 dB), so
# the previous all-sites headline default was demoted. The all-sites
# mode is still measured as the alt section for the A/B record.
# DCVC_TPU_BENCH_WARP overrides the headline od-site mode; "all:<mode>"
# applies <mode> to all three sites.
from dcvc_tpu.ops.warp import RD_GATED_BLOCK_MODE

_BW = os.environ.get("DCVC_TPU_BENCH_WARP", RD_GATED_BLOCK_MODE)
if _BW.startswith("all:"):
    HEADLINE_MODES = (_BW[4:],) * 3
elif _BW.startswith("alltile:"):
    HEADLINE_MODES = ("tile:" + _BW.split(":", 1)[1],) * 3
else:
    HEADLINE_MODES = (_BW, None, None)
TILE_MODE = _BW  # recorded in the artifact's warp_mode field


def _wait_for_device(max_tries: int = 8, delay: float = 30.0):
    """The axon chip claim can linger after a killed client; retry."""
    for i in range(max_tries):
        try:
            jax.block_until_ready(jnp.ones((8, 8)).sum())
            return
        except Exception as e:  # noqa: BLE001
            print(f"# device probe failed ({i + 1}/{max_tries}): {e}",
                  flush=True)
            if _remaining() < delay + 30:
                break
            time.sleep(delay)
    raise RuntimeError("accelerator unavailable")


def _probe_device_subprocess(budget_s: float, try_timeout: float = 150.0):
    """Probe the accelerator from SHORT-LIVED subprocesses until one
    round-trips, a hard per-try timeout bounding each attempt.

    Round 3's driver bench hung inside the first in-process device call for
    the full 30 min budget without raising — an in-process probe cannot be
    cancelled, a subprocess can. Returns True once a probe succeeds; False
    when ``budget_s`` is exhausted (the device is unreachable and the main
    process should emit its partial artifact instead of touching jax).
    """
    import subprocess

    t0 = time.time()
    code = ("import jax, jax.numpy as jnp; "
            "jax.block_until_ready(jnp.ones((8, 8)).sum()); print('ok')")
    i = 0
    while time.time() - t0 < budget_s:
        i += 1
        tmo = min(try_timeout, max(30.0, budget_s - (time.time() - t0)))
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True, timeout=tmo)
            if r.returncode == 0 and "ok" in r.stdout:
                return True
            err = (r.stderr or r.stdout).strip().splitlines()
            err = err[-1] if err else f"rc={r.returncode}"
        except subprocess.TimeoutExpired:
            err = f"probe hung >{tmo:.0f}s (killed)"
        print(f"# subprocess device probe {i} failed: {err[:200]}",
              flush=True)
        time.sleep(10)
    return False


class _Emitter:
    """Single-shot JSON emitter shared by the main flow and the watchdog."""

    def __init__(self, payload):
        self.payload = payload
        self._lock = threading.Lock()
        self._done = False

    def emit(self, note=None):
        with self._lock:
            if self._done:
                return
            self._done = True
            if note:
                self.payload["extra"]["bench_note"] = note
            _checkpoint_partial(self.payload)
            print(json.dumps(self.payload), flush=True)

    def start_watchdog(self, margin_s: float = 45.0):
        def _run():
            while True:
                left = _remaining() - margin_s
                if left <= 0:
                    break
                time.sleep(min(left, 15.0))
            self.emit(note=f"deadline watchdog fired at "
                           f"{time.time() - _T0:.0f}s; sections after this "
                           f"point were skipped")
            os._exit(0)

        t = threading.Thread(target=_run, daemon=True)
        t.start()


def _resilient(label, fn, retries=4, delay=45.0):  # noqa: C901
    """Run one measurement section with connection-drop recovery.

    The remote-TPU tunnel can drop mid-measurement (round 2's whole BENCH
    artifact was voided by one drop inside ``bench_estimated``). Each retry
    re-probes the device and re-runs the section from scratch, so a timing
    loop interrupted by a drop is re-measured rather than reported torn.
    Returns the section's value, or the stringified error after all retries.
    """
    for i in range(retries):
        try:
            t0 = time.time()
            out = fn()
            print(f"# section {label} done in {time.time() - t0:.0f}s "
                  f"(t+{time.time() - _T0:.0f}s)", flush=True)
            return out
        except Exception as e:  # noqa: BLE001
            err = f"{type(e).__name__}: {e}"
            print(f"# section {label} failed (try {i + 1}/{retries}): "
                  f"{err[:300]}", flush=True)
            if _remaining() < delay + 120:
                break  # not enough budget for another attempt
            if i + 1 < retries:
                time.sleep(delay)
                try:
                    _wait_for_device()
                except RuntimeError:
                    continue
    return f"failed: {err[:300]}"


def _checkpoint_partial(payload):
    """Persist whatever has been measured so far — a hard crash later still
    leaves a parseable artifact on disk."""
    try:
        with open("BENCH_partial.json", "w") as f:
            json.dump(payload, f)
    except OSError:
        pass


_PARAMS_CACHE = {}


def _build(warp_mode, mc_warp_mode=None, me_warp_mode=None,
           dtype=jnp.bfloat16):
    # bf16 compute (f32 params): the TPU-idiomatic inference dtype; f32
    # activations at 1080p exceed single-chip HBM in the grouped warp
    module = DMC(dtype=dtype, od_warp_mode=warp_mode,
                 mc_warp_mode=mc_warp_mode, me_warp_mode=me_warp_mode)
    qs = {k: jnp.ones(()) for k in ("mv_enc", "mv_dec", "y_enc", "y_dec")}
    # params are warp-mode independent (warp ops are parameterless), so one
    # init compile serves every A/B build in the run — but key the cache on
    # everything init-relevant (dtype) so a future parameterized mode or
    # dtype A/B cannot silently reuse mismatched params (ADVICE r4).
    key = str(jnp.dtype(dtype))
    if key not in _PARAMS_CACHE:
        x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
        dpb_init = {"ref_frame": x0, "ref_feature": None,
                    "ref_mv_feature": None, "ref_y": None, "ref_mv_y": None}
        _PARAMS_CACHE[key] = jax.jit(module.init, static_argnums=(4,))(
            jax.random.PRNGKey(0), x0, dpb_init, qs, 0)
    return module, _PARAMS_CACHE[key], qs


def bench_estimated(module, params, qs, H, W, n_iter=4, repeats=3):
    """Chained dependent P-frames (the real GOP recurrence), one readback
    probe at the end — block_until_ready alone does not reliably block on
    remote-tunnel platforms.

    Returns {"fps": median-of-``repeats``, "spread": [min, max]} — single
    timing loops on a noisy shared tunnel produced round-to-round swings
    the artifact could not distinguish from real regressions (VERDICT r4)."""

    @jax.jit
    def p_frame(p, x, dpb, qs):
        out = module.apply(p, x, dpb, qs, 1)
        return out["dpb"], out["bit"], jnp.sum(out["dpb"]["ref_frame"])

    frame = jax.random.uniform(jax.random.PRNGKey(1), (1, H, W, 3),
                               jnp.float32)
    dpb0 = {"ref_frame": frame, "ref_feature": None, "ref_mv_feature": None,
            "ref_y": None, "ref_mv_y": None}
    # Skip the I->P transition executable: a populated-feature dpb (shapes
    # from eval_shape, zero-filled) means ONE 1080p compile per build instead
    # of two — on a cold-cache driver host each compile is minutes of remote
    # AOT, and the steady-state executable is the one being timed.
    dpb_shape = jax.eval_shape(
        lambda p, x, d, q: module.apply(p, x, d, q, 1)["dpb"],
        params, frame, dpb0, qs)
    dpb = {k: (jnp.asarray(frame, v.dtype) if k == "ref_frame" else
               jnp.zeros(v.shape, v.dtype))
           for k, v in dpb_shape.items()}
    for _ in range(2):
        dpb, bit, probe = p_frame(params, frame, dpb, qs)
    float(probe)
    cur = dpb
    samples = []
    for _ in range(repeats):
        t0 = time.time()
        for _ in range(n_iter):
            cur, bit, probe = p_frame(params, frame, cur, qs)
        float(probe)
        samples.append(n_iter / (time.time() - t0))
    samples.sort()
    out = {"fps": samples[len(samples) // 2],
           "spread": [round(samples[0], 3), round(samples[-1], 3)]}
    # post-optimization FLOPs of the full enc+dec graph (MFU accounting,
    # VERDICT r4 #5): lower+compile of the SAME program hits the in-memory/
    # persistent compilation cache, so this costs one retrace, not a
    # second 1080p AOT compile. Lowered.cost_analysis() is None on this
    # jax — only Compiled carries the analysis.
    try:
        cost = p_frame.lower(params, frame, cur, qs).compile(
        ).cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        out["flops_per_frame"] = float(cost.get("flops", 0.0))
    except Exception as e:  # noqa: BLE001 — accounting must not kill timing
        out["flops_error"] = f"{type(e).__name__}: {e}"[:200]
    return out


def bench_real_coding(module, params, H, W, n_iter=6, deadline_at=None):
    """write_stream path: actual rANS bitstreams, enc/dec timed separately
    (reference brackets: video_model.py:526-540 + test_video.py:224-227).
    stream_part=3 + ec_thread are the same protocol-legal knobs the reference
    CLI exposes (test_video.py:29-31); on the 1-vCPU bench host the 3-part
    stream rides the interleaved single-thread rANS decode (~1.25x).

    Runs in a FRESH SUBPROCESS (--child real_coding) with the CODING warp
    defaults: measured on clean hosts (out/r3_diag_pattern*.log), a process
    loaded with many live executables degrades every compress/decompress
    roundtrip 4-8x, and Pallas-bearing programs another 3-4x — both
    tunnel-dispatch artifacts the estimated-bits headline does not see."""
    from dcvc_tpu.models.runtime import DmcRuntime

    rt = DmcRuntime(module, params, ec_thread=True, stream_part=3)
    rt.update(force=True)
    frame = jax.random.uniform(jax.random.PRNGKey(2), (1, H, W, 3),
                               jnp.float32)
    ref = jnp.roll(frame, 2, axis=2)
    dpb = {"ref_frame": ref, "ref_feature": None, "ref_mv_feature": None,
           "ref_y": None, "ref_mv_y": None}
    # warm both executables + let the tunnel dispatch path reach steady
    # state: fresh processes ramp over the first few dispatch-sync cycles
    # (intra spread [1.18, 9.83] after a single warmup, r5 capture), so
    # two warm frames precede the timed loop.
    t_w0 = time.time()
    comp = rt.compress(frame, dpb, q_in_ckpt=True, q_index=0, frame_idx=1)
    dec = rt.decompress(dpb, comp["bit_stream"], H, W, q_in_ckpt=True,
                        q_index=0, frame_idx=1)
    cur = dec["dpb"]
    # second warm frame only if the budget can afford it: under tunnel
    # degradation the compile+first-frame warmup alone can eat the child
    # budget (bench4: "hit 1315s during warmup"), and a ramp-contaminated
    # median beats an empty stub
    if deadline_at is None or (time.time() - t_w0) < 0.25 * max(
            deadline_at - t_w0, 1.0):
        comp = rt.compress(frame, cur, q_in_ckpt=True, q_index=0,
                           frame_idx=2)
        dec = rt.decompress(cur, comp["bit_stream"], H, W, q_in_ckpt=True,
                            q_index=0, frame_idx=2)
        cur = dec["dpb"]
    enc_ts, dec_ts = [], []
    bits = 0
    for i in range(n_iter):
        t0 = time.time()
        comp = rt.compress(frame, cur, q_in_ckpt=True, q_index=0,
                           frame_idx=i + 3)
        t1 = time.time()
        out = rt.decompress(cur, comp["bit_stream"], H, W, q_in_ckpt=True,
                            q_index=0, frame_idx=i + 3)
        t2 = time.time()
        enc_ts.append(t1 - t0)
        dec_ts.append(t2 - t1)
        bits += len(comp["bit_stream"]) * 8
        cur = out["dpb"]
        # adaptive iteration count: per-frame enc+dec over the remote
        # tunnel is tens of seconds (host rANS readbacks between decode
        # stages) — report what was measured rather than overrun the
        # budget and report nothing (rounds 1-3 all lost this section)
        if deadline_at is not None and len(enc_ts) >= 1 \
                and time.time() + (t2 - t0) > deadline_at:
            break
    done = len(enc_ts)
    # MEDIAN per-frame times: tunnel-health excursions hit single frames
    # with 5-10x stalls (r5 A/B: identical children measured 0.041-0.237
    # encdec fps mean); the median is the honest steady-state number, the
    # spread records the excursions.
    enc_med = sorted(enc_ts)[done // 2]
    dec_med = sorted(dec_ts)[done // 2]
    return {
        "real_enc_fps": round(1.0 / enc_med, 3),
        "real_dec_fps": round(1.0 / dec_med, 3),
        "real_encdec_fps": round(1.0 / (enc_med + dec_med), 3),
        "real_enc_spread_s": [round(min(enc_ts), 2), round(max(enc_ts), 2)],
        "real_dec_spread_s": [round(min(dec_ts), 2), round(max(dec_ts), 2)],
        "real_bpp": round(bits / done / (H * W), 4),
        "real_n_iter": done,
        # measurement conditions — keeps BENCH artifacts comparable across
        # rounds (these knobs changed between r01 and r02)
        "real_stream_part": rt.stream_part,
        "real_ec_thread": rt.ec_thread,
    }


def _timed_image_fps(step, params, x, n_iter=4, repeats=3):
    """Median-of-``repeats`` fps for a chained image-codec step fn."""
    # 3 warmup rounds: the r5 capture showed the FIRST timed repeat still
    # 8x slow after a single warmup call (intra spread [1.18, 9.83]) —
    # remote-platform dispatch needs a few calls to reach steady state.
    for _ in range(3):
        x, probe = step(params, x)
    float(probe)
    samples = []
    for _ in range(repeats):
        t0 = time.time()
        for _ in range(n_iter):
            x, probe = step(params, x)  # chained: recon feeds next frame
        float(probe)
        samples.append(n_iter / (time.time() - t0))
    samples.sort()
    return (samples[len(samples) // 2],
            [round(samples[0], 3), round(samples[-1], 3)])


def bench_intra(H, W):
    """IntraNoAR (DC generation) 1080p estimated-bits fps."""
    from dcvc_tpu.models.intra_dc import IntraNoAR

    module = IntraNoAR(dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = jax.jit(module.init)(jax.random.PRNGKey(0), x0, jnp.ones(()),
                                  jnp.ones(()))

    @jax.jit
    def step(p, x):
        out = module.apply(p, x, jnp.ones(()), jnp.ones(()))
        return out["x_hat"], jnp.sum(out["x_hat"])

    x = jax.random.uniform(jax.random.PRNGKey(3), (1, H, W, 3), jnp.float32)
    return _timed_image_fps(step, params, x)


def bench_evc(H, W, variant="evc_SS"):
    """EVC (speed-oriented image codec) 1080p estimated-bits fps."""
    from dcvc_tpu.models.registry import build

    module, params, _ = build(variant, dtype=jnp.bfloat16)

    @jax.jit
    def step(p, x):
        out = module.apply(p, x, jnp.ones(()))
        return out["x_hat"], jnp.sum(out["x_hat"])

    x = jax.random.uniform(jax.random.PRNGKey(4), (1, H, W, 3), jnp.float32)
    return _timed_image_fps(step, params, x)


def bench_evc_real(H, W, n_iter=3, variant="evc_SS"):
    """EVC write_stream path: real rANS bitstreams, enc/dec fps (reference
    bracket: EVC/run_test_image.py:59-63)."""
    from dcvc_tpu.models.registry import build

    _, _, rt = build(variant, dtype=jnp.bfloat16)
    rt.ec_thread, rt.stream_part = True, 3
    rt.update(force=True)
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, H, W, 3), jnp.float32)
    q = jnp.ones(())
    comp = rt.compress(x, q)           # warm both executables
    rt.decompress(comp["bit_stream"], H, W, q)
    enc_t = dec_t = 0.0
    bits = 0
    for _ in range(n_iter):
        t0 = time.time()
        comp = rt.compress(x, q)
        t1 = time.time()
        rt.decompress(comp["bit_stream"], H, W, q)
        t2 = time.time()
        enc_t += t1 - t0
        dec_t += t2 - t1
        bits += len(comp["bit_stream"]) * 8
    enc_t /= n_iter
    dec_t /= n_iter
    return {
        "evc_real_enc_fps": round(1.0 / enc_t, 3),
        "evc_real_dec_fps": round(1.0 / dec_t, 3),
        "evc_real_bpp": round(bits / n_iter / (H * W), 4),
    }


def _run_child(section, timeout=2700):
    """Run one measurement section in a fresh interpreter (fresh remote
    session, no resident-executable interference); the persistent
    compilation cache keeps the child's compiles cheap. The child gets its
    budget on argv and self-terminates (emitting partial results) before
    the parent's kill."""
    import subprocess

    budget = max(60, min(timeout, _remaining() - 90))
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", section,
         str(int(budget))],
        capture_output=True, text=True, timeout=budget + 60)
    for line in r.stdout.splitlines():
        if line.startswith("CHILD_JSON:"):
            return json.loads(line[len("CHILD_JSON:"):])
    raise RuntimeError(
        f"child {section} rc={r.returncode}: {(r.stderr or r.stdout)[-400:]}")


def child_main(section, budget_s=2700.0):
    t0 = time.time()
    deadline_at = t0 + budget_s - 30

    def _watchdog():
        while time.time() < deadline_at + 15:
            time.sleep(5)
        # measurement never completed (stuck in compile/warmup): emit a
        # diagnostic stub so the parent records WHERE the budget went
        print("CHILD_JSON:" + json.dumps(
            {section + "_note": f"child hit {budget_s:.0f}s budget during "
                                f"warmup/compile; no steady-state sample"}),
            flush=True)
        os._exit(0)

    threading.Thread(target=_watchdog, daemon=True).start()
    _wait_for_device()
    H, W = 1088, 1920
    if section == "real_coding":
        from dcvc_tpu.ops.warp import default_coding_warp_modes

        od, mc, me = default_coding_warp_modes()
        module, params, _ = _build(od, mc, me)
        out = bench_real_coding(module, params, H, W,
                                deadline_at=deadline_at)
        out["real_warp_mode"] = od
    elif section == "evc_real":
        out = bench_evc_real(H, W)
    elif section == "intra":
        # fresh process: measured in the loaded parent, intra reads 0.47
        # fps vs 8.8 in a clean process (resident-executable dispatch
        # degradation, out/r3_diag_pattern*.log)
        fps, spread = bench_intra(H, W)
        out = {"intra_dc_est_fps": round(fps, 3),
               "intra_dc_est_spread": spread}
    elif section == "evc":
        fps, spread = bench_evc(H, W)
        out = {"evc_ss_est_fps": round(fps, 3), "evc_ss_est_spread": spread}
    else:
        raise SystemExit(f"unknown child section {section}")
    print("CHILD_JSON:" + json.dumps(out), flush=True)
    os._exit(0)


def main():
    H, W = 1088, 1920  # 1080p padded to /16

    extra = {"warp_mode": TILE_MODE}
    payload = {
        "metric": "dcvc_dc_1080p_p_frame_encdec_bf16",
        "value": None,
        "unit": "fps",
        "vs_baseline": None,
        "extra": extra,
    }
    em = _Emitter(payload)
    em.start_watchdog()

    # Bounded device acquisition: subprocess probes that CAN be killed. If
    # the tunnel is unreachable for half the budget, emit the (empty but
    # parseable) artifact rather than hanging into the driver's kill.
    if not _probe_device_subprocess(budget_s=min(900.0, _remaining() * 0.5)):
        em.emit(note="accelerator unreachable within probe budget; "
                     "no measurements taken")
        return
    _wait_for_device(max_tries=3, delay=20.0)

    def _skip(section, need_s):
        if _remaining() < need_s:
            print(f"# skipping {section}: {_remaining():.0f}s left "
                  f"< {need_s}s budget", flush=True)
            extra[section + "_skipped"] = "deadline"
            return True
        return False

    def _headline():
        module, params, qs = _build(*HEADLINE_MODES)
        stats = bench_estimated(module, params, qs, H, W)
        return stats, module, params, qs

    # The headline number gets the most retries — a torn timing loop is
    # re-measured from scratch (round 2 lost its artifact to one drop here).
    head = _resilient("headline", _headline, retries=6, delay=60.0)
    module = params = qs = None
    if isinstance(head, tuple):
        stats, module, params, qs = head
        payload["value"] = round(stats["fps"], 3)
        payload["vs_baseline"] = round(stats["fps"] / REFERENCE_GPU_FPS, 3)
        extra["headline_spread"] = stats["spread"]
    else:
        extra["headline_error"] = head
    _checkpoint_partial(payload)

    # real coding BEFORE the exact-warp A/B: it is the honest
    # with-entropy-coding number the baseline includes, and it has never
    # survived to a driver artifact (rounds 1-3) — give it budget priority
    if not _skip("real_coding", 420):
        extra_rc = _resilient(
            "real_coding", lambda: _run_child("real_coding"), retries=2,
            delay=20.0)
        if isinstance(extra_rc, dict):
            extra.update(extra_rc)
        else:
            extra["real_coding"] = extra_rc
        _checkpoint_partial(payload)

    exact_flops = {}

    def _exact():
        module_e, params_e, qs_e = _build("exact")
        stats = bench_estimated(module_e, params_e, qs_e, H, W)
        extra["est_fps_exact_warp_spread"] = stats["spread"]
        if "flops_per_frame" in stats:
            exact_flops["flops"] = stats["flops_per_frame"]
        return round(stats["fps"], 3)

    if not _skip("exact_warp", 240):
        extra["est_fps_exact_warp"] = _resilient("exact_warp", _exact,
                                                 retries=2, delay=20.0)
        _checkpoint_partial(payload)

    # MFU / roofline accounting (VERDICT r4 missing #5): XLA cost-analysis
    # FLOPs for the full enc+dec P-frame graph (captured by the timing
    # sections from their own compiled executables) x measured fps, vs the
    # v5e bf16 peak — answers "fast, or merely faster than a provisional
    # baseline?" from the artifact alone. Reference analogue:
    # EVC/model_complexity.py:26-32 (ptflops MACs on 1920x1088).
    mfu = {"peak_bf16_tflops": V5E_BF16_PEAK_TFLOPS}
    for name, flops, fps in (
            ("block", head[0].get("flops_per_frame")
             if isinstance(head, tuple) else None, payload["value"]),
            ("exact", exact_flops.get("flops"),
             extra.get("est_fps_exact_warp"))):
        if flops is None:
            continue
        mfu[name + "_flops_per_frame_g"] = round(flops / 1e9, 1)
        if isinstance(fps, (int, float)):
            ach = flops * fps / 1e12
            mfu[name + "_achieved_tflops"] = round(ach, 3)
            mfu[name + "_mfu_pct"] = round(
                100.0 * ach / V5E_BF16_PEAK_TFLOPS, 2)
    if len(mfu) > 1:
        extra["mfu"] = mfu
        _checkpoint_partial(payload)

    if not _skip("intra", 180):
        def _intra():
            r = _run_child("intra", timeout=300)
            if isinstance(r, dict) and all(k.endswith("_note") for k in r):
                raise RuntimeError(f"child stub: {r}")
            return r

        r = _resilient("intra", _intra, retries=2, delay=20.0)
        if isinstance(r, dict):
            extra.update(r)
        else:
            extra["intra"] = r
        _checkpoint_partial(payload)

    # Previous default (all-sites block, demoted by the round-5 gate) —
    # recorded so each BENCH artifact carries the A/B against the prior
    # round's shipped mode and the cost of the demotion stays visible.
    alt = os.environ.get("DCVC_TPU_BENCH_ALT", "all:" + RD_GATED_BLOCK_MODE)
    if alt and not _skip("alt_mode", 240):
        if alt.startswith("alltile:"):
            modes = ("tile:" + alt.split(":", 1)[1],) * 3
        elif alt.startswith("all:"):
            modes = (alt[4:],) * 3
        else:
            modes = (alt, None, None)  # od-site only (the r2 default shape)

        def _alt():
            m, p, q = _build(*modes)
            stats = bench_estimated(m, p, q, H, W)
            extra["est_fps_alt_spread"] = stats["spread"]
            return round(stats["fps"], 3)

        extra["est_fps_alt"] = _resilient("alt_mode", _alt, retries=2,
                                          delay=20.0)
        extra["alt_mode"] = alt
        _checkpoint_partial(payload)

    if not _skip("evc_real", 240):
        evc_rc = _resilient("evc_real", lambda: _run_child("evc_real"),
                            retries=2, delay=20.0)
        if isinstance(evc_rc, dict):
            extra.update(evc_rc)
        else:
            extra["evc_real"] = evc_rc
        _checkpoint_partial(payload)

    # evc estimated-bits runs LAST with a larger child budget: its 1080p
    # compile alone overran the old 300s budget every round (r4 note:
    # "child hit 300s budget during warmup/compile"), and at the end of
    # the run it can consume whatever budget remains without starving the
    # sections that have always landed. A child killed mid-warmup returns
    # a *_note stub — treated as FAILURE so _resilient retries; the
    # persistent compile cache makes the second child's warmup nearly free.
    if not _skip("evc", 180):
        def _evc():
            r = _run_child("evc", timeout=540)
            if isinstance(r, dict) and all(k.endswith("_note") for k in r):
                raise RuntimeError(f"child stub: {r}")
            return r

        r = _resilient("evc", _evc, retries=2, delay=20.0)
        if isinstance(r, dict):
            extra.update(r)
        else:
            extra["evc"] = r
        _checkpoint_partial(payload)

    # Last-resort headline: if the gated default never completed but the
    # exact-warp section did, report that (it is the slower, conservative
    # number) rather than emitting no value at all.
    if payload["value"] is None and isinstance(
            extra.get("est_fps_exact_warp"), (int, float)):
        payload["value"] = extra["est_fps_exact_warp"]
        payload["vs_baseline"] = round(
            payload["value"] / REFERENCE_GPU_FPS, 3)
        extra["headline_fallback"] = "exact_warp"

    em.emit()


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        child_main(sys.argv[2],
                   float(sys.argv[3]) if len(sys.argv) > 3 else 2700.0)
    else:
        main()
