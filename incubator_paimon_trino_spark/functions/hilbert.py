"""Vectorized Hilbert-curve index (Skilling's transform).

Maps k-dimensional grid coordinates to their distance along the Hilbert
space-filling curve — the clustering key behind ``compact(...,
strategy='hilbert')`` (Paimon ``order_strategy => 'hilbert'``). The curve
visits every cell of the 2^bits grid exactly once and each step moves one
cell in one dimension, so sorting by the index groups spatial neighbors
more tightly than the Morton/Z-order interleave (which takes long jumps at
power-of-two boundaries).

The algorithm is John Skilling's public-domain transform ("Programming the
Hilbert curve", AIP Conf. Proc. 707, 2004): undo excess Gray-code work from
the most significant bit down, then Gray-decode the transposed bit matrix.
Implemented over numpy arrays so one call indexes a whole Arrow batch; the
per-element loop count is bits × dims (≤ 60 iterations), each a vectorized
mask/xor over the batch.

Only invariants-tested public API: ``hilbert_index(points, bits)``.
"""

from __future__ import annotations

import numpy as np


def hilbert_index(points: "np.ndarray", bits: int) -> "np.ndarray":
    """Hilbert-curve distance of each row of ``points``.

    ``points``: (n, k) integer array, every value in [0, 2^bits).
    Returns (n,) int64 distances in [0, 2^(bits*k)); bits*k must be ≤ 62.
    """
    if points.ndim != 2:
        raise ValueError(f"points must be (n, k), got shape {points.shape}")
    n, k = points.shape
    if bits < 1 or bits * k > 62:
        raise ValueError(f"bits*dims must be in [1, 62], got {bits}*{k}")
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    x = points.astype(np.uint64, copy=True)
    if (points < 0).any() or (x >> np.uint64(bits)).any():
        raise ValueError(f"coordinates out of [0, 2^{bits})")

    one = np.uint64(1)
    # ---- inverse undo: AxesToTranspose (Skilling, loop from high bit down)
    q = one << np.uint64(bits - 1)
    while q > one:
        p = q - one
        for i in range(k):
            hit = (x[:, i] & q) != 0
            x[hit, 0] ^= p  # invert low bits of x[0]
            # exchange low bits of x[0] and x[i] where the q-bit is clear
            t = (x[~hit, 0] ^ x[~hit, i]) & p
            x[~hit, 0] ^= t
            x[~hit, i] ^= t
        q >>= one
    # ---- Gray encode (inverse of the decode the transpose form implies)
    for i in range(1, k):
        x[:, i] ^= x[:, i - 1]
    t = np.zeros(n, dtype=np.uint64)
    q = one << np.uint64(bits - 1)
    while q > one:
        hit = (x[:, k - 1] & q) != 0
        t[hit] ^= q - one
        q >>= one
    for i in range(k):
        x[:, i] ^= t

    # ---- interleave the transposed bits into one integer: bit b of axis i
    # lands at position (b * k + (k - 1 - i)) — axis 0 most significant
    h = np.zeros(n, dtype=np.uint64)
    for b in range(bits - 1, -1, -1):
        for i in range(k):
            h = (h << one) | ((x[:, i] >> np.uint64(b)) & one)
    return h.astype(np.int64)
