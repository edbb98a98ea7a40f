"""Training drivers (L5/L6): optimizers, checkpoint/resume, eval harness,
XE and SCST-RL train loops."""

from .checkpoint import load_checkpoint, save_checkpoint  # noqa: F401
from .optim import lr_for_epoch, make_optimizer, ss_prob_for_epoch  # noqa: F401
