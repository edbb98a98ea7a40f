"""Core ops: attention, attention-LSTM cells, MoS head, losses.

Functional equivalents of the reference's ``misc/*Core.py`` single-timestep
``nn.Module`` cells, redesigned as pure functions over explicit parameter
pytrees so they can be stacked over untied review steps and driven by
``jax.lax.scan`` (decode over time) and ``jax.vmap`` (beam / ensemble lanes).
"""

from . import attention, cells, initializers, losses, mos  # noqa: F401
