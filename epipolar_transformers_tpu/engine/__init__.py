from .solver import make_lr_schedule, make_optimizer
from .trainer import TrainState, create_train_state, make_train_step, train
from .tester import test
