from downgan_tpu.training.state import GANTrainState, create_state, make_models  # noqa: F401
from downgan_tpu.training.wgan import (  # noqa: F401
    build_train_step,
    build_eval_metrics,
    build_epoch_scan,
    gradient_penalty,
)
from downgan_tpu.training.trainer import Trainer  # noqa: F401
from downgan_tpu.training.wgan import build_eval_scan, build_fused_round, make_loss_fns  # noqa: F401
