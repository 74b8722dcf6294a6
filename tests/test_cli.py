"""CLI entry point (main.py): full dispatch with config overrides, plus the
--trace profiler capture (reference main.py:21-75 UX)."""

import pytest
import os

import main as cli


@pytest.mark.slow
def test_cli_train_eval_with_trace(tmp_path):
    out_dir = tmp_path / "out"
    trace_dir = tmp_path / "trace"
    results = cli.main([
        "--cfg", "configs/epipolar/synthetic_zresidual.yaml",
        "--max-steps", "1", "--max-eval-batches", "1",
        "--trace", str(trace_dir),
        "DATASETS.IMAGE_SIZE", "(32, 32)",
        "KEYPOINT.HEATMAP_SIZE", "(8, 8)",
        "EPIPOLAR.SAMPLESIZE", "4",
        "BACKBONE.BODY", "epipolarposeR-18",
        "SOLVER.IMS_PER_BATCH", "2",
        "TEST.IMS_PER_BATCH", "1",
        "OUTPUT_DIR", str(out_dir),
    ])
    assert "EPEmean_global" in results
    traced = [f for _, _, fs in os.walk(trace_dir) for f in fs]
    assert any(f.endswith(".xplane.pb") for f in traced), traced
