"""Shared window-streaming machinery for the fused Mosaic kernels.

Every fused substep kernel (ES/EM x 2D/3D, plus the grid-parity pusher)
consumes one field window per particle block, where the block's window is
selected by its scalar-prefetched tile index.  When the window set lives in
HBM the kernels DMA each block's window into a double-buffered VMEM scratch
one grid step ahead.  This module is the single home of that recipe:

- :func:`make_window_streamer` — the in-kernel start/prefetch/wait logic;
- :func:`resolve_stream` — the host-side resident-vs-streamed auto choice
  (stream once the lane-padded resident set would exceed ~48 MB of VMEM);
- :func:`stream_scratch_shapes` — the matching double-buffer VMEM scratch +
  DMA-semaphore allocations.

The kernels are traced Python, so sharing these helpers changes nothing in
the lowered Mosaic program; bit-exact stream-vs-resident equivalence is
covered per kernel in tests/test_pallas_pic.py and the 3D/pusher suites.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# stream once the lane-padded resident window set would crowd VMEM
STREAM_THRESHOLD_BYTES = 48 * 2 ** 20


def make_window_streamer(tile_ref, triples, s, ns, n_g, n_tiles):
    """Set up double-buffered per-block window DMA for one grid step.

    ``tile_ref``: the scalar-prefetched (nb_pad,) block->tile index (filler
    blocks carry the sentinel ``n_tiles``, clamped to the last real tile —
    their rows are dead so any window is harmless).  ``triples``: a list of
    ``(hbm_ref, scratch_ref, sem_ref)`` with scratch/sem leading dims
    ``(2, n_g)``.  ``s``/``ns``: this grid step and the step count.

    Starts the slot-0 fetch on step 0 and the next step's prefetch into the
    alternate slot, then returns ``wait_get(g) -> [window_view, ...]``
    (one VMEM view per triple, valid for block ``g`` of step ``s``).
    """

    def window_dma(slot, step, g):
        t = jnp.minimum(tile_ref[step * n_g + g], n_tiles - 1)
        return [pltpu.make_async_copy(hbm.at[t], sc.at[slot, g],
                                      sm.at[slot, g])
                for hbm, sc, sm in triples]

    def start_fetch(slot, step):
        for g in range(n_g):
            for dma in window_dma(slot, step, g):
                dma.start()

    @pl.when(s == 0)
    def _():
        start_fetch(0, 0)

    @pl.when(s + 1 < ns)
    def _():
        start_fetch((s + 1) % 2, s + 1)

    slot = s % 2

    def wait_get(g):
        for dma in window_dma(slot, s, g):
            dma.wait()
        return [sc[slot, g] for _, sc, _ in triples]

    return wait_get


def resolve_stream(win_args, lane_dim: int, stream: bool | None) -> bool:
    """Host-side auto choice: stream when the resident set is too big.

    ``win_args``: the per-tile window arrays as passed to the kernel;
    ``lane_dim`` is their minor (lane) dimension, whose padding to 128
    determines what actually lands in VMEM.
    """
    if stream is not None:
        return stream
    win_bytes = sum(int(np.prod(w.shape)) * w.dtype.itemsize
                    for w in win_args)
    win_bytes = win_bytes * (-(-lane_dim // 128) * 128) // lane_dim
    return win_bytes > STREAM_THRESHOLD_BYTES


def stream_scratch_shapes(win_args, n_g: int) -> list:
    """Double-buffer VMEM scratch + DMA semaphores matching ``win_args``.

    One ``(2, n_g, *window_shape)`` VMEM buffer and one ``(2, n_g)`` DMA
    semaphore array per window operand, in the order
    ``[scratch...] + [semaphores...]`` the kernels slice them.
    """
    return ([pltpu.VMEM((2, n_g, *w.shape[1:]), w.dtype) for w in win_args]
            + [pltpu.SemaphoreType.DMA((2, n_g)) for _ in win_args])
