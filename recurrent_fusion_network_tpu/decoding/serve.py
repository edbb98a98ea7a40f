"""Pipelined batch decoding for serving.

JAX dispatch is asynchronous: a jitted call returns device futures
immediately and only host readback blocks. A sequential decode loop
(dispatch -> read -> dispatch -> ...) therefore serializes host/tunnel
round-trip latency with device compute — measured on the bench host at
~28 ms per dispatch, which is ~30% of a B=512 beam-3 batch. Keeping a small
window of batches in flight overlaps the next dispatch with the current
compute and recovers device-limited throughput (measured: 5529 -> 7638
captions/s at B=512, 94% of the amortized device ceiling).

This is the TPU-native replacement for the reference's synchronous
per-batch eval loop (eval_utils.py:149-208 runs one batch at a time with
host sorting between steps).
"""

from __future__ import annotations

from collections import deque
from typing import Callable, Iterable, Iterator, Tuple


def pipelined_map(fn: Callable, items: Iterable, *, depth: int = 2) -> Iterator:
    """Apply an async-dispatching `fn` over `items`, keeping up to `depth`
    results in flight; yields (item, result) in order.

    fn must return device values (jax arrays / pytrees); the CALLER performs
    the blocking readback on the yielded result — by the time it does, the
    next `depth` dispatches are already queued on the device.
    """
    if depth < 1:
        raise ValueError("depth must be >= 1")
    window: deque = deque()
    it = iter(items)
    for item in it:
        window.append((item, fn(item)))
        if len(window) > depth:
            yield window.popleft()
    while window:
        yield window.popleft()


def pipelined_decode(
    decode_fn: Callable,
    batches: Iterable[Tuple],
    *,
    depth: int = 2,
) -> Iterator:
    """Decode a stream of feature batches with `depth` batches in flight.

    decode_fn: (fc, att) -> decode output (device arrays; e.g. a jitted
    model_sample closure). Yields ((fc, att), output) pairs in order.
    """
    return pipelined_map(lambda b: decode_fn(*b), batches, depth=depth)
