from .builder import ModelBuilder
from .epipolar import Epipolar
from .lifting import LiftingNet
from .registry import BACKBONES
from .resnet import BackboneOutput, PoseResNet, ResNet
