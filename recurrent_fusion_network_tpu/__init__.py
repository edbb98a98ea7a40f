"""TPU-native Recurrent Fusion Network (RFNet) image-captioning framework.

A brand-new JAX/XLA implementation with the full capabilities of the
PyTorch reference `cswhjiang/Recurrent_Fusion_Network` (ECCV 2018): ShowTell,
ReviewNet and RecurrentFusionModel captioners over multi-CNN precomputed
feature arrays, cross-entropy and self-critical (SCST) RL training with
vectorized CIDEr-D rewards, batched beam search, multi-checkpoint ensemble
decoding, a COCO caption-metric harness, and checkpoint/resume — redesigned
idiomatically for TPU (batched `lax.scan` decoding, XLA-fused cells,
pjit/`shard_map` data parallelism) rather than ported. All compute-path
kernels are XLA-owned by a measured decision: a round-1 hand-written fused
attention-LSTM kernel was removed after profiling showed XLA already at the
chip's practical peak on these shapes (PERF_NOTES.md §3).

Layer map (mirrors SURVEY.md §1 of the reference analysis):
  config.py / feat_registry.py      — L1 config + encoder registry
  data/                             — L0 prepro + L2 data runtime
  ops/                              — L3 cores (attention, LSTM cells, MoS, losses)
  models/                           — L4 models + factory
  decoding/                         — batched greedy/beam/ensemble engines
  training/                         — L5/L6 optimizers + train drivers + checkpoints
  rewards/                          — SCST reward kernel (vectorized CIDEr-D)
  metrics/                          — L8 caption metrics (pure Python/NumPy)
  parallel/                         — mesh/sharding helpers (DP over ICI)
"""

__version__ = "0.1.0"

# Optional backend override: some sandboxes pin JAX_PLATFORMS via
# sitecustomize before user code runs; RFNET_JAX_PLATFORM=cpu (etc.) wins if
# set before the first backend initialization.
import os as _os

if _os.environ.get("RFNET_JAX_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["RFNET_JAX_PLATFORM"])
