"""Pallas TPU kernel for the batched wavefront Gotoh affine-gap DP fill.

Same recurrence/tie-breaking as engine.align (fuzz-verified against the
reference's align.cc:235-336 Gotoh M/X/Y formulation). The grid is
(pair_blocks, diagonals); the M/X/Y wavefront carries live in VMEM scratch
and persist across the sequential diagonal axis, so each step is a pure
VPU sweep over [PB, NP] lanes with a single packed-traceback row written
to HBM.

Mosaic constraints shape the layout:
- all lane widths are multiples of 128 (NP = round_up(N+1, 128); the
  reversed-T buffer width W is 128-aligned); lanes beyond the real DP
  cells are don't-cares the traceback never reads.
- the diagonal T-character gather tc[p, i] = T[p, d-i] is a dynamic
  *rotate* (pltpu.roll, which lowers to tpu.dynamic_rotate and accepts a
  traced shift) of the left-padded reversed-T row, not a dynamic slice
  (lane-dim dynamic slice offsets must be 128-aligned, which d is not):
      TR2[p, x] = T[p, M - (x - (N+1))],  tc_i = TR2[(N+1) + M - d + i].

The O(n+m) traceback stays in XLA (tpu.align_batch) and reads the packed
planes produced here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..engine.align import GAP_EXTEND, GAP_OPEN, MATCH, MISMATCH

_DIAG, _LEFT, _UP = 1, 2, 3

PB = 8  # pairs per grid block (int32 sublane tile)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(S_ref, TR2_ref, tb_ref, Mp, Xp, Yp, Mp2, *, N: int, M: int,
            NP: int, W: int):
    d = pl.program_id(1) + 2  # diagonals d = 2 .. N+M
    go = jnp.int32(GAP_OPEN)
    ge = jnp.int32(GAP_EXTEND)
    idx = jax.lax.broadcasted_iota(jnp.int32, (PB, NP), 1)

    @pl.when(d == 2)
    def _init():
        # diagonal d=1 state (cells (0,1) and (1,0)) and d=0 (M[0][0]=0)
        b1 = go + ge
        Mp[:] = jnp.where(idx <= 1, b1, 0)
        Xp[:] = jnp.where(idx == 0, b1, 0)
        Yp[:] = jnp.where(idx == 1, b1, 0)
        Mp2[:] = jnp.zeros((PB, NP), jnp.int32)

    Mpv, Xpv, Ypv = Mp[:], Xp[:], Yp[:]
    # value at lane i-1 (lane 0 garbage -> overwritten by boundary)
    Mp_s = pltpu.roll(Mpv, 1, 1)
    Xp_s = pltpu.roll(Xpv, 1, 1)
    Mp2_s = pltpu.roll(Mp2[:], 1, 1)

    # X (vertical, consumes S): tie -> open
    ext = Xp_s + ge
    opn = Mp_s + go
    xgt = ext > opn
    Xc = jnp.where(xgt, ext, opn)

    # Y (horizontal, consumes T): tie -> open
    exty = Ypv + ge
    opny = Mpv + go
    ygt = exty > opny
    Yc = jnp.where(ygt, exty, opny)

    # T char at j = d - i: rotate TR2 left by start = (N+1) + M - d.
    # tpu.dynamic_rotate requires 32-bit lanes, so chars travel as int32.
    start = jnp.int32(N + 1 + M) - d
    tc = pltpu.roll(TR2_ref[:], jnp.int32(W) - start, 1)[:, :NP]
    sub = jnp.where(S_ref[:] == tc, jnp.int32(MATCH), jnp.int32(MISMATCH))
    diagv = Mp2_s + sub

    best = diagv
    mtb = jnp.full((PB, NP), _DIAG, jnp.int32)
    xw = Xc > best
    best = jnp.where(xw, Xc, best)
    mtb = jnp.where(xw, _LEFT, mtb)
    yw = Yc > best
    best = jnp.where(yw, Yc, best)
    mtb = jnp.where(yw, _UP, mtb)
    Mc = best

    # boundary columns: cell (0, d) at lane 0, cell (d, 0) at lane d
    b = go + d * ge
    is0 = idx == 0
    isd = idx == d
    Mc = jnp.where(is0 | isd, b, Mc)
    Xc = jnp.where(is0, b, Xc)
    Yc = jnp.where(isd, b, Yc)

    tb_ref[0] = (mtb | jnp.where(xgt, 4, 0) | jnp.where(ygt, 8, 0)).astype(
        jnp.uint8)

    Mp2[:] = Mpv
    Mp[:] = Mc
    Xp[:] = Xc
    Yp[:] = Yc


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def pallas_dp_fill(S, TR2, N: int, M: int, interpret: bool = False):
    """S: [P, N+1] uint8 (1-indexed query chars); TR2: from make_tr2.
    Returns packed tb planes [D, P, NP] uint8, NP = round_up(N+1, 128) —
    a lane-padded superset of align_batch._dp_fill's [D, P, N+1] layout
    (the traceback gathers by index, so the pad lanes are inert)."""
    P = S.shape[0]
    assert P % PB == 0
    D = N + M - 1
    NP = _round_up(N + 1, 128)
    W = TR2.shape[1]
    if S.shape[1] != NP:
        S = jnp.pad(S, ((0, 0), (0, NP - S.shape[1])))
    S = S.astype(jnp.int32)
    grid = (P // PB, D)
    return pl.pallas_call(
        functools.partial(_kernel, N=N, M=M, NP=NP, W=W),
        grid=grid,
        in_specs=[
            pl.BlockSpec((PB, NP), lambda i, d: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, W), lambda i, d: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, PB, NP), lambda i, d: (d, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, P, NP), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((PB, NP), jnp.int32) for _ in range(4)],
        interpret=interpret,
    )(S, TR2)


def make_tr2(T, N: int, M: int):
    """Left-padded reversed-T rotate buffer: TR2[p, (N+1)+k] = T[p, M-k],
    width rounded up to a 128 multiple."""
    P = T.shape[0]
    W = _round_up((N + 1) + (M + 1) + (N + 1), 128)
    T = T.astype(jnp.int32)
    left = jnp.zeros((P, N + 1), T.dtype)
    right = jnp.zeros((P, W - (N + 1) - T.shape[1]), T.dtype)
    return jnp.concatenate([left, T[:, ::-1], right], axis=1)
