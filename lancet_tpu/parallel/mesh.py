"""Device mesh + sharded batched step.

The reference's parallelism is share-nothing windows over pthreads with a
serial merge (Lancet.cc:844-959). The TPU-native equivalent: a 1-D mesh
over the window/pair axis; each device runs the batched kernels on its
shard; per-step counters are reduced with psum and fixed-width per-shard
results are gathered with all_gather (ICI collectives, no NCCL/MPI).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..engine.align import GAP_EXTEND, GAP_OPEN, MATCH, MISMATCH


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("w",))


def _dp_scores_local(S, T, n_len, m_len):
    """Per-shard wavefront Gotoh DP returning M[n, m] scores for the
    shard's pairs (scores-only variant of tpu.align_batch used by the
    sharded step; traceback planes stay shard-local in the full path)."""
    P_, N1 = S.shape
    M_ = T.shape[1] - 1
    N = N1 - 1
    go = jnp.int32(GAP_OPEN)
    ge = jnp.int32(GAP_EXTEND)
    idx = jnp.arange(N + 1)
    TR = jnp.concatenate([T[:, ::-1], jnp.zeros((P_, N + 1), T.dtype)], axis=1)

    def boundary(d):
        return go + jnp.int32(d) * ge

    M1 = jnp.where(idx[None, :] <= 1, boundary(1), 0) * jnp.ones((P_, 1), jnp.int32)
    X1 = jnp.where(idx[None, :] == 0, boundary(1), 0) * jnp.ones((P_, 1), jnp.int32)
    Y1 = jnp.where(idx[None, :] == 1, boundary(1), 0) * jnp.ones((P_, 1), jnp.int32)
    M0 = jnp.zeros((P_, N + 1), jnp.int32)
    # inside shard_map the carry must be marked varying along the mesh axis
    try:
        M1, X1, Y1, M0 = (jax.lax.pvary(x, ("w",)) for x in (M1, X1, Y1, M0))
    except Exception:
        pass  # outside shard_map / axis not bound

    sc0 = jnp.zeros((P_,), jnp.int32)
    try:
        sc0 = jax.lax.pvary(sc0, ("w",))
    except Exception:
        pass

    def step(carry, d):
        Mp, Xp, Yp, Mp2, sc = carry
        Mp_s = jnp.roll(Mp, 1, axis=1)
        Xp_s = jnp.roll(Xp, 1, axis=1)
        Mp2_s = jnp.roll(Mp2, 1, axis=1)
        Xc = jnp.maximum(Xp_s + ge, Mp_s + go)
        Yc = jnp.maximum(Yp + ge, Mp + go)
        start = jnp.maximum(M_ - d, 0)
        tc = jax.lax.dynamic_slice_in_dim(TR, start, N + 1, axis=1)
        tc = jnp.roll(tc, jnp.maximum(d - M_, 0), axis=1)
        sub = jnp.where(S == tc, jnp.int32(MATCH), jnp.int32(MISMATCH))
        Mc = jnp.maximum(Mp2_s + sub, jnp.maximum(Xc, Yc))
        b = boundary(d)
        is0 = idx[None, :] == 0
        isd = idx[None, :] == d
        Mc = jnp.where(is0 | isd, b, Mc)
        Xc = jnp.where(is0, b, Xc)
        Yc = jnp.where(isd, b, Yc)
        # capture the (n, m) cell when its diagonal is filled
        val = jnp.take_along_axis(Mc, n_len[:, None], axis=1)[:, 0]
        sc = jnp.where(d == n_len + m_len, val, sc)
        return (Mc, Xc, Yc, Mp, sc), None

    (_, _, _, _, sc), _ = jax.lax.scan(step, (M1, X1, Y1, M0, sc0),
                                       jnp.arange(2, N + M_ + 1))
    return sc


def sharded_window_step(mesh: Mesh, seq, lens, S, T, n_len, m_len,
                        ks: tuple, max_mismatch: int):
    """One full SPMD step over the window/pair axis, exercising every
    collective the framework's scale-out story needs (SURVEY.md §2.3):

    - per-device repeat-gate kernel over its window shard ([W, nk] local)
    - per-device wavefront Gotoh scores over its pair shard
    - psum counter reduction (the reference's cross-thread counter merge,
      Lancet.cc:930-970)
    - tiled all_gather of fixed-width per-pair records (the variant-record
      merge path: fixed-width structs ride ICI; host dedups by signature)

    Returns (gates[W, nk], scores[P], records[P, 3], stats[2]) with gates/
    scores/records sharded over "w" and stats replicated.
    """
    from ..tpu.repeats import gates_impl

    def local(seq_l, lens_l, S_l, T_l, n_l, m_l):
        gates, _ = gates_impl(seq_l, lens_l, ks, max_mismatch, axis="w")
        sc = _dp_scores_local(S_l, T_l, n_l, m_l)
        gated = jax.lax.psum(jnp.sum(gates[:, 0].astype(jnp.int32)), "w")
        total = jax.lax.psum(jnp.sum(sc), "w")
        cnt = jax.lax.psum(jnp.asarray(sc.shape[0], jnp.int32), "w")
        rec = jnp.stack([sc, n_l, m_l], axis=1)  # fixed-width records
        allrec = jax.lax.all_gather(rec, "w", axis=0, tiled=True)
        stats = jnp.stack([total.astype(jnp.float32) / cnt,
                           gated.astype(jnp.float32)])
        return gates, sc, allrec, stats

    kw = dict(mesh=mesh,
              in_specs=(P("w", None), P("w"), P("w", None),
                        P("w", None), P("w"), P("w")),
              out_specs=(P("w", None), P("w"), P(None, None), P(None)))
    try:
        # the all_gather-ed records are replicated by construction, which
        # the varying-mesh-axes checker cannot infer
        fn = shard_map(local, check_vma=False, **kw)
    except TypeError:  # older jax spelling
        fn = shard_map(local, check_rep=False, **kw)
    return jax.jit(fn)(seq, lens, S, T, n_len, m_len)


def sharded_step(mesh: Mesh, S, T, n_len, m_len):
    """One SPMD step over the pair axis: per-shard DP + collective stats.

    Returns (scores[P], global_mean_score[1]) — the psum emulates the
    reference's cross-thread counter merge (Lancet.cc:930-959)."""

    def local(S_l, T_l, n_l, m_l):
        sc = _dp_scores_local(S_l, T_l, n_l, m_l)
        total = jax.lax.psum(jnp.sum(sc), "w")
        cnt = jax.lax.psum(sc.shape[0], "w")
        return sc, (total.astype(jnp.float32) / cnt) * jnp.ones((1,), jnp.float32)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P("w", None), P("w", None), P("w"), P("w")),
                   out_specs=(P("w"), P(None)))
    return jax.jit(fn)(S, T, n_len, m_len)


# ---------------------------------------------------------------------------
# Production path: the real batched Gotoh fill + traceback sharded over the
# mesh. Each device fills its slice of the pair axis; the packed traceback
# ops (fixed-width per-pair records) ride ICI via tiled all_gather so every
# host can decode and merge — the TPU-native analog of the reference's
# per-thread VariantDB merge (Lancet.cc:938-959; SURVEY.md §2.3).
# ---------------------------------------------------------------------------

_MESH_DP_CACHE: dict = {}


def _mesh_dp_fn(mesh: Mesh, N: int, M: int, use_pallas: bool):
    key = (id(mesh), N, M, use_pallas)
    fn = _MESH_DP_CACHE.get(key)
    if fn is not None:
        return fn
    from ..tpu.align_batch import _dp_and_traceback

    def local(S, T, n_len, m_len):
        ops, k = _dp_and_traceback(S, T, n_len, m_len, N, M, use_pallas)
        ops = jax.lax.all_gather(ops, "w", axis=0, tiled=True)
        k = jax.lax.all_gather(k, "w", axis=0, tiled=True)
        return ops, k

    kw = dict(mesh=mesh,
              in_specs=(P("w", None), P("w", None), P("w"), P("w")),
              out_specs=(P(None, None), P(None)))
    try:
        sm = shard_map(local, check_vma=False, **kw)
    except TypeError:  # older jax spelling
        sm = shard_map(local, check_rep=False, **kw)
    fn = jax.jit(sm)
    _MESH_DP_CACHE[key] = fn
    return fn


def mesh_batch_align_async(pairs: list, mesh: Mesh):
    """Dispatch the batched Gotoh DP sharded over `mesh` (pair axis).
    Returns the same state contract as tpu.align_batch.batch_align_async —
    decode with batch_align_wait. Per-pair results are independent of the
    sharding, so any mesh size yields identical alignments (the VCF is
    device-count invariant; mirrors the reference's thread-count
    invariance, Lancet.cc:305-310)."""
    if not pairs:
        return None
    from ..tpu.align_batch import _round_up, _use_pallas

    Pn = len(pairs)
    ndev = int(mesh.devices.size)
    N = _round_up(max(128, max(len(s) for s, _ in pairs)), 128)
    M = _round_up(max(128, max(len(t) for _, t in pairs)), 128)
    S = np.zeros((Pn, N + 1), dtype=np.uint8)
    T = np.zeros((Pn, M + 1), dtype=np.uint8)
    n_len = np.zeros(Pn, np.int32)
    m_len = np.zeros(Pn, np.int32)
    for i, (s, t) in enumerate(pairs):
        S[i, 1 : len(s) + 1] = np.frombuffer(s.encode("latin-1"), np.uint8)
        T[i, 1 : len(t) + 1] = np.frombuffer(t.encode("latin-1"), np.uint8)
        n_len[i] = len(s)
        m_len[i] = len(t)
    P_pad = 1 << max(3, (Pn - 1).bit_length())
    while P_pad % ndev:
        P_pad <<= 1
    if P_pad != Pn:
        pad = P_pad - Pn
        S = np.concatenate([S, np.tile(S[-1:], (pad, 1))])
        T = np.concatenate([T, np.tile(T[-1:], (pad, 1))])
        n_len = np.concatenate([n_len, np.repeat(n_len[-1:], pad)])
        m_len = np.concatenate([m_len, np.repeat(m_len[-1:], pad)])
    fn = _mesh_dp_fn(mesh, N, M, _use_pallas())
    ops, counts = fn(jnp.asarray(S), jnp.asarray(T), jnp.asarray(n_len),
                     jnp.asarray(m_len))
    return ops, counts, pairs
