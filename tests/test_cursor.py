"""Interactive epipolar cursor: headless event-driven test (Agg backend)."""

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg")


def test_cursor_updates_on_hover(rng):
    import matplotlib.pyplot as plt
    from matplotlib.backend_bases import MouseEvent

    from epipolar_transformers_tpu.vis.cursor import show_epipolar_cursor

    K, H, W = 6, 8, 8
    dump = {
        "sample_locs": rng.rand(1, K, H, W, 2).astype(np.float32) * 2 - 1,
        "attention": rng.rand(1, K, H, W).astype(np.float32),
    }
    img = rng.rand(32, 32, 3)
    fig, cursor = show_epipolar_cursor(img, img, dump, downsample=4)
    fig.canvas.draw()

    ax_ref = fig.axes[0]
    # synthesize a hover over display pixel (16, 16)
    xdisp, ydisp = ax_ref.transData.transform((16, 16))
    event = MouseEvent("motion_notify_event", fig.canvas, xdisp, ydisp)
    out = cursor.on_move(event)
    assert out is not None
    fx, fy, xs, ys, weights = out
    assert 0 <= fx < W and 0 <= fy < H
    assert len(xs) == K and len(weights) == K
    # samples drawn on the other axis
    assert cursor._scatter is not None
    plt.close(fig)


def test_cursor_ignores_other_axes(rng):
    import matplotlib.pyplot as plt
    from matplotlib.backend_bases import MouseEvent

    from epipolar_transformers_tpu.vis.cursor import show_epipolar_cursor

    dump = {
        "sample_locs": rng.rand(1, 4, 4, 4, 2).astype(np.float32),
        "attention": rng.rand(1, 4, 4, 4).astype(np.float32),
    }
    fig, cursor = show_epipolar_cursor(rng.rand(16, 16, 3), rng.rand(16, 16, 3), dump)
    fig.canvas.draw()
    ax_other = fig.axes[1]
    xdisp, ydisp = ax_other.transData.transform((8, 8))
    event = MouseEvent("motion_notify_event", fig.canvas, xdisp, ydisp)
    assert cursor.on_move(event) is None
    plt.close(fig)
