"""Backbone registry (reference modeling/registry.py:5 + resnet.py:495-519).

Maps BACKBONE.BODY names to Flax module constructors taking the frozen cfg.
"""

from __future__ import annotations

from ..utils.registry import Registry

BACKBONES = Registry()


def register_default_backbones():
    # imported lazily to avoid cycles
    from .resnet import PoseResNet, ResNet

    def make_pose_resnet(cfg, name=None):
        return PoseResNet(cfg, name=name)

    def make_resnet(cfg, name=None):
        depth = cfg.BACKBONE.BODY.split("-")[-1]
        return ResNet(cfg, depth=depth, name=name)

    for depth in ("18", "34", "50", "101", "152"):
        BACKBONES.register(f"R-{depth}", make_resnet)
        BACKBONES.register(f"poseR-{depth}", make_pose_resnet)
        BACKBONES.register(f"epipolarposeR-{depth}", make_pose_resnet)

    try:
        from .hourglass import HourglassNet

        def make_hg(cfg, name=None):
            return HourglassNet(cfg, name=name)

        for body in ("HG", "HG1", "HG11", "epipolarHG", "epipolarHG1", "epipolarHG11",
                     "metaHG", "simplemultiviewHG"):
            BACKBONES.register(body, make_hg)
    except ImportError:
        pass


register_default_backbones()
