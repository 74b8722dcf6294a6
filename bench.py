"""Benchmark: multiview fused inference throughput on one TPU chip.

Measures the flagship configuration (zresidual epipolar PoseResNet-50,
256px images, 64x64 heatmaps, K=64 epipolar samples — the reference's
33.1mm config, configs/epipolar/keypoint_h36m_zresidual_fixed.yaml):
full fused multiview inference = other-view backbone + reference backbone
+ epipolar attention + heatmap head + soft-argmax decode, per frame.

Timing methodology (round 4 — self-validating by construction):
  * On this environment `jax.block_until_ready` does NOT synchronize (the
    axon tunnel acks dispatch, not completion), and the round-3 estimator
    (per-iteration fetch minus a measured sync floor) degenerated: when the
    jittery floor estimate exceeded the jittery forward estimate, the clamp
    `max(delta, 1e-6)` silently printed BATCH/1e-6 = 8,000,000 f/s
    (BENCH_r03.json).  No subtraction survives here.
  * Instead, each iteration's input now CARRIES A DATA DEPENDENCY on the
    previous iteration's output (a denormal-scaled reduction of the decoded
    scores is folded into the next input image), so the single final fetch
    cannot be acknowledged until every chained iteration has actually
    computed.  We time N>=30 chained iterations end-to-end and divide once.
  * Before printing, the number must pass `validate_fps`: implied FLOP/s
    (measured XLA cost-analysis FLOPs/frame x fps) below any current chip's
    physical peak, and fps inside a wide plausibility band around the
    PERF.md measured history.  An implausible number exits nonzero with a
    structured {"error": ...} line instead of poisoning the grading record.
    tests/test_bench_guard.py pins the guard behavior on CPU.

Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "frames/sec/chip", "vs_baseline": x,
   "v100_est": 55.0, "flops_per_frame": ...}

vs_baseline is fps / (3 x V100_EST_FPS): the BASELINE.md target is
'>= 3x V100 frames/sec per chip'.  V100_EST_FPS is a conservative estimate
of the reference torch pipeline's fused multiview inference on one V100;
PERF.md "V100 baseline derivation" derives it from the pipeline's FLOPs,
V100 peak throughput with a realistic MFU band, and the measured cost
structure of the reference's 64-iteration python epipolar loop.
"""

from __future__ import annotations

import json
import time

import numpy as np

V100_EST_FPS = 55.0  # derived in PERF.md "V100 baseline derivation"
TARGET_MULTIPLIER = 3.0
BATCH = 8
ITERS = 30
BLOCKS = 3

# Physical ceiling: no current single TPU chip exceeds ~1e15 dense FLOP/s
# (v5e bf16 peak is ~3.94e14; the margin covers future chips so the guard
# only ever fires on genuinely impossible numbers).
PEAK_FLOPS = 1.0e15
# Analytic fallback when cost_analysis is unavailable over the tunnel:
# XLA cost_analysis of the compiled flagship forward measured 30.28 GFLOP
# /frame on the v5e (2026-08-18: profile_model(_flagship_cfg(), 1) —
# two R-50 trunk+deconv passes @256px + epipolar attention + decode).
ANALYTIC_FLOPS_PER_FRAME = 30.3e9
# Measured history for THIS benchmark: the (min, max) official driver
# captures across rounds, per PERF.md's headline table (769.8 r02, 997.8
# r02-probe, 847.2 r04).  This is the ONE constant the plausibility band
# derives from.  UPDATE RULE: when a landed, PERF.md-recorded change
# (optimization, recipe, quantization) legitimately moves the official
# capture outside the current band, extend the violated endpoint to the
# new PERF.md headline in the same commit that records it — never widen
# the margins below, and never touch this constant for a number that is
# not in PERF.md.  tests/test_bench_guard.py asserts the band covers the
# current headline with jitter and admits a genuine 2x improvement.
MEASURED_HISTORY_FPS = (769.0, 998.0)
# Sanity margins around the history: a reading >5x below or >10x above
# every capture ever recorded is far more likely a broken measurement
# than a real change, and a silent wrong number in the grading record is
# worse than a loud error.  The asymmetry is deliberate — the upper
# margin leaves room for genuine step improvements (the physical-peak
# gate above, ~34,000 f/s at the measured FLOPs, remains the hard
# ceiling), while regressions past 5x have always meant methodology
# breakage, not slow code.
BAND_MARGIN = (5.0, 10.0)
PLAUSIBLE_BAND = (MEASURED_HISTORY_FPS[0] / BAND_MARGIN[0],
                  MEASURED_HISTORY_FPS[1] * BAND_MARGIN[1])


class ImplausibleMeasurement(Exception):
    """A throughput reading that cannot be physically real."""


def validate_fps(
    fps: float,
    flops_per_frame: float,
    band=PLAUSIBLE_BAND,
    peak_flops: float = PEAK_FLOPS,
) -> None:
    """Reject throughput numbers that cannot be real (see module docstring).

    Raises ImplausibleMeasurement; never returns a value.  Unit-tested on
    CPU (tests/test_bench_guard.py) including the exact r03 failure mode.
    """
    if not np.isfinite(fps) or fps <= 0:
        raise ImplausibleMeasurement(f"non-finite/non-positive fps {fps!r}")
    implied = fps * flops_per_frame
    if implied >= peak_flops:
        raise ImplausibleMeasurement(
            f"fps={fps:.1f} x {flops_per_frame:.3g} FLOPs/frame implies "
            f"{implied:.3g} FLOP/s >= chip physical peak {peak_flops:.3g} "
            "(degenerate timing: the r03 failure mode)"
        )
    lo, hi = band
    if not (lo <= fps <= hi):
        raise ImplausibleMeasurement(
            f"fps={fps:.1f} outside plausibility band [{lo:.0f}, {hi:.0f}] "
            f"({BAND_MARGIN[0]:.0f}x/{BAND_MARGIN[1]:.0f}x margins around "
            f"the PERF.md measured history {MEASURED_HISTORY_FPS}); if this "
            "is a REAL landed improvement, extend MEASURED_HISTORY_FPS in "
            "the commit that records it in PERF.md (see the update rule at "
            "its definition) — otherwise rerun / investigate the measurement"
        )


def _chained_bench(step, first_args, iters: int, blocks: int) -> float:
    """End-to-end seconds/iteration over a chain of data-dependent steps.

    `step(img, *rest) -> (img_next, checksum)`; img_next depends on THIS
    iteration's computed outputs, so fetching the final checksum forces the
    whole chain.  One division, no subtraction — the estimator cannot go
    negative or degenerate.  Best of `blocks` blocks (the axon tunnel adds
    multi-ms host jitter; min over blocks is the standard robust estimator
    of sustained device throughput).
    """
    img, rest = first_args[0], first_args[1:]
    # compile + sync
    out = step(img, *rest)
    _ = float(np.asarray(out[1]))
    best = float("inf")
    for _ in range(blocks):
        x = img
        t0 = time.perf_counter()
        for _ in range(iters):
            x, checksum = step(x, *rest)
        _ = float(np.asarray(checksum))  # one fetch forces every iteration
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def make_chained_step(model, variables):
    """The chained benchmark step: fused multiview forward whose output is
    folded (denormal-scaled, numerically a no-op) into the next input, so a
    single final fetch forces every iteration (see module docstring).

    ONE definition shared by bench.py and the sweep probes
    (scripts/bench_batch_sweep.py) — the r03 incident was a methodology
    bug, and two hand-synced copies of the methodology would reintroduce
    exactly that risk."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(img, other_img, KRT, other_KRT):
        feed = {"img": img, "other_img": other_img,
                "KRT": KRT, "other_KRT": other_KRT}
        _, _, out = model.apply(variables, feed, is_train=False)
        locs, scores = out["batch_locs"], out["score_pred"]
        # Chain: numerically a no-op on the image (scores are O(1); 1e-30
        # underflows the bf16/f32 add) but XLA cannot remove the
        # dependency, so iteration i+1 cannot start — and the final fetch
        # cannot complete — until iteration i actually computed.
        feedback = (jnp.mean(scores) + jnp.mean(locs)) * jnp.asarray(1e-30, img.dtype)
        return img + feedback, jnp.sum(scores)

    return step


def _require_device(timeout_s: float = 120.0):
    """Fail fast (structured) when the TPU tunnel is unreachable.

    jax.devices() on an uninitialized backend BLOCKS indefinitely if the
    axon tunnel is down (observed 2026-08-17: multi-hour outage) — probe it
    on a daemon thread and exit nonzero with a parseable error line instead
    of hanging the driver's bench capture."""
    import threading

    got = []

    def probe():
        import jax

        got.append(len(jax.devices()))

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if not got:
        print(json.dumps({
            "metric": "multiview_fused_inference_throughput",
            "error": f"device backend unreachable after {timeout_s:.0f}s "
                     "(TPU tunnel down?)",
        }))
        raise SystemExit(2)


def main():
    _require_device()

    import jax

    from __graft_entry__ import _example_batch, _flagship_cfg
    from epipolar_transformers_tpu.models import ModelBuilder

    cfg = _flagship_cfg()
    inputs = _example_batch(cfg, batch=BATCH)

    model = ModelBuilder(cfg)
    # jit the init: eager init dispatches every conv separately through the
    # device tunnel (minutes); one compiled program initializes in seconds
    variables = jax.jit(
        lambda rng: model.init(rng, inputs, is_train=False)
    )(jax.random.PRNGKey(0))

    step = make_chained_step(model, variables)

    args = jax.device_put(
        (inputs["img"], inputs["other_img"], inputs["KRT"], inputs["other_KRT"])
    )

    per_iter = _chained_bench(step, args, ITERS, BLOCKS)
    fps = BATCH / per_iter

    # Measured FLOPs/frame from XLA's own cost model of the compiled chained
    # step (falls back to the documented analytic estimate if the backend
    # doesn't report cost analysis over the tunnel).
    try:
        from epipolar_transformers_tpu.utils.profiling import cost_analysis

        flops_total = float(cost_analysis(step, *args).get("flops", float("nan")))
    except Exception:
        flops_total = float("nan")
    flops_per_frame = (
        flops_total / BATCH if np.isfinite(flops_total) and flops_total > 0
        else ANALYTIC_FLOPS_PER_FRAME
    )

    try:
        validate_fps(fps, flops_per_frame)
    except ImplausibleMeasurement as e:
        print(json.dumps({
            "metric": "multiview_fused_inference_throughput",
            "error": str(e),
            "value_rejected": round(fps, 2),
            "flops_per_frame": flops_per_frame,
        }))
        raise SystemExit(3)

    result = {
        "metric": "multiview_fused_inference_throughput",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / (V100_EST_FPS * TARGET_MULTIPLIER), 3),
        "v100_est": V100_EST_FPS,
        "flops_per_frame": round(flops_per_frame, 0),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
