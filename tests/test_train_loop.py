"""The full train() orchestrator: loop, checkpointing, last_checkpoint
resume (reference trainer.py:18-141 behaviors)."""

import os

import numpy as np
import pytest

from epipolar_transformers_tpu.config import Config, update_from_dict
from epipolar_transformers_tpu.engine import train
from epipolar_transformers_tpu.utils.checkpoint import Checkpointer


def _cfg(tmp_path):
    d = {
        "DATASETS": {"TRAIN": ("synthetic_multiview_train",),
                     "TEST": ("synthetic_multiview_val",),
                     "TASK": "keypoint", "IMAGE_SIZE": (32, 32),
                     "IMAGE_RESIZE": 1.0, "PREDICT_RESIZE": 1.0},
        "BACKBONE": {"ENABLED": True, "BODY": "poseR-18", "DOWNSAMPLE": 4,
                     "PRETRAINED": False},
        "KEYPOINT": {"ENABLED": True, "NUM_PTS": 3, "HEATMAP_SIZE": (8, 8),
                     "SIGMA": 2.0, "LOSS": "joint", "LOSS_PER_JOINT": False},
        "SOLVER": {"OPTIMIZER": "adam", "BASE_LR": 1e-3, "IMS_PER_BATCH": 8,
                   "MAX_EPOCHS": 1, "CHECKPOINT_PERIOD": 1},
        "TENSORBOARD": {"USE": False},
        "LOG_FREQ": 2,
        "OUTPUT_DIR": str(tmp_path),
    }
    return update_from_dict(Config(), d)


@pytest.mark.slow
def test_train_checkpoints_and_resumes(tmp_path):
    cfg = _cfg(tmp_path)
    state = train(cfg, max_steps=3)
    assert int(state.step) == 3
    # max_steps returns early (before the epoch checkpoint); run a full
    # 1-epoch train to produce checkpoints
    state = train(cfg)
    ckpt = Checkpointer(str(tmp_path))
    assert ckpt.has_checkpoint()
    files = os.listdir(tmp_path)
    assert any(f.endswith(".ckpt") for f in files)

    # resume: a fresh train() must restore from last_checkpoint and, with
    # MAX_EPOCHS already reached, run zero additional steps — the returned
    # state carries the checkpointed step count (1 epoch = 256/8 = 32 steps)
    state2 = train(cfg)
    assert int(state2.step) == 32
