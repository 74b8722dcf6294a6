"""Support utils + vis tools: meters, checkpointer, zipreader, timer,
skeleton tables, AUC, video assembly."""

import os
import pickle
import zipfile

import numpy as np
import pytest

from epipolar_transformers_tpu.utils.metric_logger import MetricLogger, SmoothedValue, prefix_dict
from epipolar_transformers_tpu.utils.checkpoint import Checkpointer
from epipolar_transformers_tpu.utils.timer import Timer
from epipolar_transformers_tpu.utils import zipreader
from epipolar_transformers_tpu.vis import (
    CONNECTIVITY_DICT,
    assemble_video,
    auc_curve,
    export_pointclouds,
)


def test_smoothed_value_window():
    v = SmoothedValue(window_size=3)
    for x in [1, 2, 3, 4]:
        v.update(x)
    assert v.median == 3
    assert v.avg == 3
    assert v.global_avg == 2.5


def test_metric_logger_str_and_avg():
    m = MetricLogger()
    m.update(loss=1.0, acc=0.5)
    m.update(loss=3.0, acc=0.7)
    s = str(m)
    assert "loss" in s and "acc" in s
    avg = m.get_all_avg()
    assert avg["loss"] == 2.0
    assert prefix_dict({"a": 1}, "val") == {"val/a": 1}


def test_checkpointer_roundtrip(tmp_path):
    ckpt = Checkpointer(str(tmp_path))
    state = {"w": np.arange(5.0), "b": np.float32(3.0)}
    ckpt.save("model_000", state, epoch=7)
    assert ckpt.has_checkpoint()
    assert ckpt.get_checkpoint_file() == "model_000.ckpt"
    restored, extra = ckpt.load({"w": np.zeros(5), "b": np.float32(0)})
    np.testing.assert_allclose(restored["w"], state["w"])
    assert extra["epoch"] == 7
    # newer save wins via last_checkpoint
    ckpt.save("model_001", {"w": np.ones(5), "b": np.float32(1.0)}, epoch=9)
    restored, extra = ckpt.load({"w": np.zeros(5), "b": np.float32(0)})
    assert extra["epoch"] == 9


def test_zipreader(tmp_path):
    cv2 = pytest.importorskip("cv2")
    img = (np.random.RandomState(0).rand(8, 8, 3) * 255).astype(np.uint8)
    png = cv2.imencode(".png", img)[1].tobytes()
    zpath = tmp_path / "images.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        z.writestr("images/a.png", png)
    out = zipreader.imread(f"{zpath}@/images/a.png")
    np.testing.assert_array_equal(out, img)
    zipreader.close_all()


def test_timer():
    t = Timer()
    t.tic()
    d = t.toc(average=False)
    assert d >= 0
    assert t.calls == 1


def test_connectivity_tables():
    assert len(CONNECTIVITY_DICT["human36m"]) == 16
    assert all(0 <= a < 17 and 0 <= b < 17 for a, b in CONNECTIVITY_DICT["human36m"])


def test_auc_curve():
    err_joints = np.tile(np.arange(20), (4, 1)).astype(float)  # monotone counts
    total = np.full((4, 1), 19.0)
    th, acc, auc = auc_curve(err_joints, total, 20)
    assert len(th) == 20
    assert 0 <= auc <= 1.1
    assert acc[-1] == pytest.approx(1.0)


def test_export_pointclouds(tmp_path):
    preds = [{"pred3d": np.zeros((17, 3))} for _ in range(3)]
    p = tmp_path / "predictions.pkl"
    with open(p, "wb") as f:
        pickle.dump(preds, f)
    n = export_pointclouds(str(p), str(tmp_path / "pc"), limit=2)
    assert n == 2
    assert os.path.exists(tmp_path / "pc" / "pointcloud_00000.pkl")


def test_assemble_video(tmp_path):
    cv2 = pytest.importorskip("cv2")
    dirs = []
    for v in range(2):
        d = tmp_path / f"view{v}"
        os.makedirs(d)
        for i in range(3):
            cv2.imwrite(str(d / f"{i:03d}.png"),
                        np.full((16, 16, 3), v * 100 + i, np.uint8))
        dirs.append(str(d))
    n = assemble_video(dirs, str(tmp_path / "out.mp4"), fps=2)
    assert n == 3
    assert os.path.getsize(tmp_path / "out.mp4") > 0
