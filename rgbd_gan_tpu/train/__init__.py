from .losses import dis_adv_loss, downsize_real, gen_adv_loss, l2_loss, r1_penalty, smooth_depth_loss
from .optim import LR_SCALE_TABLE, get_lr_scale_factor, make_optimizer, make_stylegan_gen_optimizer
from .ema import soft_copy_params
from .state import TrainState
from .steps import StepSpec, make_rgb_train_step, make_rgbd_train_step

__all__ = [
    "gen_adv_loss",
    "dis_adv_loss",
    "l2_loss",
    "r1_penalty",
    "downsize_real",
    "smooth_depth_loss",
    "make_optimizer",
    "make_stylegan_gen_optimizer",
    "get_lr_scale_factor",
    "LR_SCALE_TABLE",
    "soft_copy_params",
    "TrainState",
    "StepSpec",
    "make_rgbd_train_step",
    "make_rgb_train_step",
]
