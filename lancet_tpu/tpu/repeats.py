"""Batched repeat gates: isRepeat / isAlmostRepeat over all windows and all
k values in one device pass.

The reference runs an O(L^2*K) CPU scan per (window, k) retry
(util.cc:295-360, called at Microassembler.cc:118-131, 799-800). Here all
shifted self-comparisons are computed once per window ([W, L, L] mismatch
prefix sums) and every k's verdict is a masked windowed reduction —
shared across k since prefix sums are k-independent.

Semantics preserved exactly, including the reference's quirks: the final
k-mer offset L-k is excluded, and the "almost" window is K+1 long.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnums=(2, 3))
def _gates(seq, lens, ks: tuple, max_mismatch: int):
    """seq: [W, L] uint8; lens: [W] int32.
    Returns bool [W, len(ks)]: True if k is gated (repeat or near-repeat)."""
    W, L = seq.shape
    # neq[w, d, p] = seq[p + d + 1] != seq[p]   (d axis = shift-1, shifts 1..L-1)
    # build via broadcasting: shifted[w, d, p] = seq[w, p + d + 1]
    p_idx = jnp.arange(L)
    d_idx = jnp.arange(L - 1)
    gather_idx = jnp.minimum(p_idx[None, :] + d_idx[:, None] + 1, L - 1)
    shifted = seq[:, gather_idx]  # [W, L-1, L]
    neq = (shifted != seq[:, None, :]).astype(jnp.int32)
    # zero out positions beyond the sequence (p + d + 1 >= len)
    valid_p = (p_idx[None, :] + d_idx[:, None] + 1) < lens[:, None, None]
    neq = jnp.where(valid_p, neq, 0)
    pref = jnp.concatenate(
        [jnp.zeros((W, L - 1, 1), jnp.int32), jnp.cumsum(neq, axis=2)], axis=2)

    o_full = jnp.arange(L + 1)

    def per_k(_, k):
        # windowed sums via clamped gathers (k is traced -> one compile)
        def win(width):
            hi_idx = jnp.minimum(o_full + width, L)
            return pref[:, :, hi_idx] - pref  # [W, L-1, L+1]

        cnt_k = win(k)
        cnt_k1 = win(k + 1)
        # valid offsets: o <= len - k - 1 - (d+1)
        lim = lens[:, None, None] - k - 1 - (d_idx[None, :, None] + 1)
        mask = o_full[None, None, :] <= lim
        exact = jnp.any(mask & (cnt_k == 0), axis=(1, 2))
        almost = jnp.any(mask & (cnt_k1 <= max_mismatch), axis=(1, 2))
        return None, (exact | almost, exact)

    _, (gates, exact) = jax.lax.scan(per_k, None, jnp.asarray(ks, jnp.int32))
    return gates.T, exact.T  # each [W, nk]


def repeat_gates(windows: list[str], ks: list[int], max_mismatch: int,
                 with_exact: bool = False):
    """Per-window, per-k gate verdicts (True = skip this k); optionally
    also the exact-repeat matrix (used for the maxK window skip)."""
    if not windows:
        z = np.zeros((0, len(ks)), bool)
        return (z, z) if with_exact else z
    L = max(8, max(len(w) for w in windows))
    W = len(windows)
    seq = np.zeros((W, L), np.uint8)
    lens = np.zeros(W, np.int32)
    for i, w in enumerate(windows):
        seq[i, : len(w)] = np.frombuffer(w.encode("latin-1"), np.uint8)
        lens[i] = len(w)
    gates, exact = _gates(jnp.asarray(seq), jnp.asarray(lens),
                          tuple(ks), max_mismatch)
    if with_exact:
        return np.asarray(gates), np.asarray(exact)
    return np.asarray(gates)
