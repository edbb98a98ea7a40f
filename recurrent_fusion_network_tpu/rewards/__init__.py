"""SCST reward computation (L6 reward plumbing).

  cider_d.py        — vectorized int-id CIDEr-D scorer (the RL reward kernel,
                      replacing cider/pyciderevalcap/ciderD)
  self_critical.py  — sampled-vs-greedy baseline reward assembly
                      (replacing get_rewards.py)
"""

from .cider_d import CiderD  # noqa: F401
from .self_critical import compute_reward, get_self_critical_reward  # noqa: F401
