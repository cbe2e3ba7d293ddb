"""Input prefetching: overlap host->device batch transfers with compute.

The training loop otherwise serialises [transfer batch k] -> [step k] ->
[transfer k+1] ...; ``jax.device_put`` is async, so placing a couple of
batches ahead hides the transfer under the previous step (on the axon
tunnel the transfer is a large fraction of the step at N~2000).

NOTE (measured, v5e via axon tunnel): explicit device_put prefetch was
SLOWER than implicit transfer-at-call (225 vs 206 ms/step at the EXPY-TKY
shape) — the tunnel serializes placements — so the training loop does NOT
use this by default; it is an opt-in utility for locally-attached devices.
"""
from __future__ import annotations

import collections
from typing import Callable, Iterable, Iterator


def device_prefetch(batches: Iterable, place_fn: Callable = None,
                    depth: int = 2) -> Iterator:
    """Yield batches with up to ``depth`` already placed on device.

    place_fn: e.g. ``jax.device_put`` or a sharding placement; identity if
    None. Works for any pytree batches.
    """
    import jax

    place = place_fn or jax.device_put
    queue = collections.deque()
    it = iter(batches)
    try:
        for _ in range(depth):
            queue.append(place(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(place(next(it)))
        except StopIteration:
            pass
        yield out
