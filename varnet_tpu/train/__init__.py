from .causal import train_causal
from .checkpoint import list_checkpoint_steps, load_checkpoint, save_checkpoint
from .gauss_newton import LMState, make_lm_step, make_residual_fn
from .loss import make_loss_fn
from .optim import OptimizerConfig, make_optimizer
from .trainer import TrainResult, make_eval_fn, make_train_step
