"""bench.py self-validation: the r03 degenerate-measurement class is
rejected by construction (VERDICT r03 item 1).

The round-3 driver capture recorded 8,000,000 f/s — exactly BATCH/1e-6,
the floor-subtraction clamp.  These tests pin that (a) the guard rejects
that exact number and anything physically impossible, (b) plausible
readings pass, and (c) the chained-dependency estimator divides elapsed
time once and cannot go negative.
"""

import sys
import time
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


class TestValidateFps:
    def test_r03_failure_mode_rejected(self):
        # BATCH/1e-6 with the flagship's ~30 GFLOPs/frame implies ~2e17
        # FLOP/s — hundreds of times past chip peak.
        with pytest.raises(bench.ImplausibleMeasurement, match="physical peak"):
            bench.validate_fps(8_000_000.0, 30.3e9)

    def test_band_guard_high(self):
        # Implied FLOP/s below peak but far outside measured history:
        # still rejected (a >10x jump is a broken measurement, not a win).
        with pytest.raises(bench.ImplausibleMeasurement, match="band"):
            bench.validate_fps(50_000.0, 1.0e9)

    def test_band_guard_low(self):
        with pytest.raises(bench.ImplausibleMeasurement, match="band"):
            bench.validate_fps(10.0, 30.3e9)

    def test_nonfinite_rejected(self):
        for bad in (float("inf"), float("nan"), 0.0, -5.0):
            with pytest.raises(bench.ImplausibleMeasurement):
                bench.validate_fps(bad, 30.3e9)

    def test_plausible_readings_pass(self):
        # The PERF.md measured band across rounds (r01 73 was pre-band;
        # current band centers on 769-998) and readings inside the margins.
        for fps in (200.0, 769.8, 997.8, 3000.0):
            bench.validate_fps(fps, 30.3e9)

    def test_band_derives_from_measured_history(self):
        """PLAUSIBLE_BAND is a pure function of the documented history
        constant — the r04 weakness was a free-floating hardcode whose
        ceiling silently bound before the physical-peak gate."""
        lo_hist, hi_hist = bench.MEASURED_HISTORY_FPS
        assert bench.PLAUSIBLE_BAND == (lo_hist / bench.BAND_MARGIN[0],
                                        hi_hist * bench.BAND_MARGIN[1])
        # the history endpoints themselves must obviously pass
        bench.validate_fps(lo_hist, bench.ANALYTIC_FLOPS_PER_FRAME)
        bench.validate_fps(hi_hist, bench.ANALYTIC_FLOPS_PER_FRAME)

    def test_band_covers_current_headline_with_jitter(self):
        """The current PERF.md headline (847.2 f/s, BENCH_r04.json) must
        pass with a generous +/-2x jitter allowance, so normal round-to-
        round variance can never turn the official capture into an error."""
        headline = 847.2
        for fps in (headline / 2, headline, headline * 2):
            bench.validate_fps(fps, bench.ANALYTIC_FLOPS_PER_FRAME)

    def test_genuine_2x_improvement_passes(self):
        """A real 2x win (e.g. quantization / smaller recipe) at the
        measured FLOPs must be recordable — the r04 band's 5000 ceiling
        would have rejected ~2000+ f/s readings the peak gate permits."""
        bench.validate_fps(2.0 * 998.0, bench.ANALYTIC_FLOPS_PER_FRAME)
        # ...while the r03 degenerate number still cannot pass (peak gate)
        with pytest.raises(bench.ImplausibleMeasurement):
            bench.validate_fps(8_000_000.0, bench.ANALYTIC_FLOPS_PER_FRAME)

    def test_peak_guard_uses_measured_flops(self):
        # At 1e12 FLOPs/frame even 999 f/s exceeds 1e15 peak — the guard
        # keys on implied FLOP/s, not on fps alone.
        with pytest.raises(bench.ImplausibleMeasurement, match="physical peak"):
            bench.validate_fps(2_000.0, 1.0e12)


class TestChainedBench:
    def test_divides_once_no_subtraction(self):
        """A fake step that sleeps a known time per call: the estimator must
        report ~that time, never a clamped epsilon."""
        calls = []

        def step(img, delay):
            time.sleep(delay)
            calls.append(1)
            return img, np.float32(img.sum())

        per_iter = bench._chained_bench(step, (np.ones(4, np.float32), 0.003),
                                        iters=5, blocks=2)
        assert per_iter >= 0.003  # cannot be below the true per-call floor
        assert per_iter < 0.05
        # warmup call + blocks*iters
        assert len(calls) == 1 + 2 * 5

    def test_fps_from_estimator_is_finite_positive(self):
        def step(img):
            return img, np.float32(0.0)

        per_iter = bench._chained_bench(step, (np.zeros(2, np.float32),),
                                        iters=30, blocks=1)
        assert per_iter > 0 and np.isfinite(per_iter)
