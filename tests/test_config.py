"""Config system: frozen/hashable tree, YAML loading of the reference's own
config files, CLI overrides."""

import dataclasses

import pytest

from epipolar_transformers_tpu.config import Config, load_config, update_from_dict


def test_defaults_match_reference_schema():
    cfg = Config()
    assert cfg.BACKBONE.BODY == "R-50"
    assert cfg.EPIPOLAR.SAMPLESIZE == 64
    assert cfg.EPIPOLAR.SOFTMAXSCALE == pytest.approx(1 / 8.0)
    assert cfg.KEYPOINT.HEATMAP_SIZE == (224, 224)
    assert cfg.SOLVER.STEPS == (20, 30)


def test_frozen_and_hashable():
    cfg = Config()
    with pytest.raises(dataclasses.FrozenInstanceError):
        cfg.SEED = 1
    assert hash(cfg) == hash(Config())
    assert hash(cfg.replace(SEED=1)) != hash(cfg)


def test_update_from_dict_nested():
    cfg = update_from_dict(Config(), {"SOLVER": {"BASE_LR": 0.01}, "SEED": 3})
    assert cfg.SOLVER.BASE_LR == 0.01
    assert cfg.SEED == 3
    with pytest.raises(KeyError):
        update_from_dict(Config(), {"NOPE": 1})


def test_cli_overrides():
    cfg = load_config(
        overrides=["SOLVER.BASE_LR", "0.02", "EPIPOLAR.MERGE", "late",
                   "KEYPOINT.HEATMAP_SIZE", "(64, 64)"]
    )
    assert cfg.SOLVER.BASE_LR == 0.02
    assert cfg.EPIPOLAR.MERGE == "late"
    assert cfg.KEYPOINT.HEATMAP_SIZE == (64, 64)


def test_loads_reference_zresidual_yaml(tmp_path):
    """The flagship 33.1mm config (reference
    configs/epipolar/keypoint_h36m_zresidual_fixed.yaml) loads unchanged."""
    yaml_text = """
DATASETS:
    TRAIN: ('multiview_h36m_train',)
    TEST: ('multiview_h36m_val', )
    TASK: multiview_keypoint
    IMAGE_SIZE: (256, 256)
    IMAGE_RESIZE: 1.
    PREDICT_RESIZE: 1.
    H36M:
        TRAIN_SAMPLE: 0
        MAPPING: False
BACKBONE:
    ENABLED: True
    BODY: epipolarposeR-50
    DOWNSAMPLE: 4
SOLVER:
    OPTIMIZER: adam
    BASE_LR: 0.001
    STEPS: (2, 3)
    MAX_EPOCHS: 4
    IMS_PER_BATCH: 16
EPIPOLAR:
    TOPK: 1
    MERGE: late
    SHARE_WEIGHTS: True
    ATTENTION: avg
    PARAMETERIZED: ('z',)
    PRETRAINED: False
    ZRESIDUAL: True
    USE_CORRECT_NORMALIZE: True
KEYPOINT:
    HEATMAP_SIZE: (64, 64)
    SIGMA: 8.
    NUM_PTS: 17
    TRIANGULATION: pymvg
    LOSS: joint
    LOSS_PER_JOINT: False
TEST:
    IMS_PER_BATCH: 1
VIS:
    MULTIVIEW: True
OUTPUT_DIR: outs/epipolar/keypoint_h36m_fixed
"""
    p = tmp_path / "zres.yaml"
    p.write_text(yaml_text)
    cfg = load_config(str(p))
    assert cfg.DATASETS.TASK == "multiview_keypoint"
    # yaml tuples come through as strings via yacs convention? No: our loader
    # uses yaml.safe_load, which parses '(256, 256)' as a string — the loader
    # must coerce it. Verify it did.
    assert cfg.DATASETS.IMAGE_SIZE == (256, 256)
    assert cfg.EPIPOLAR.PARAMETERIZED == ("z",)
    assert cfg.EPIPOLAR.ZRESIDUAL is True
    assert cfg.KEYPOINT.NUM_PTS == 17
    assert cfg.is_h36m
    assert cfg.DATASET_FAMILY == "h36m"
