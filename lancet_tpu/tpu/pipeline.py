"""Device per-k assembly pipeline: glues tpu.dbg.build_k node/edge
tables and the host map-order ranks through the cleanup stages
(tpu.stages) and the path cover into PathJob tensors.

Per k attempt (one jit per shape bucket):
  components -> per-comp anchoring/clip/wiring -> cycle gate #1 ->
  compress -> removeLowCov(true) -> compress -> removeTips fixpoint ->
  removeShortLinks (STR-guarded) -> cycle gate #2 -> best-new-edge path
  cover (bounded BFS frontier) -> path/coverage materialization.

Reference flow: Microassembler.cc:73-249 processGraph; the per-component
sequential loop is component-parallel here (components share no nodes or
edges; the first failing component still aborts the window exactly like
the reference because later components' jobs are dropped on the host).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import stages
from .stages import BIG, _wid, destbit, fliplink, startbit


def _extend_items(b, ranks, W, N, Cmax, K):
    """jit1 node tables -> item/edge/mer state dict (item axis NI)."""
    NI = N + 2 * Cmax
    pad = NI - N

    def ext(a, fill):
        z = jnp.full((W, pad) + a.shape[2:], fill, a.dtype)
        return jnp.concatenate([a, z], axis=1)

    status_T = b["is_tumor"] & ~b["is_normal"]
    counts = b["counts"]
    totq = b["totq"]
    st = dict(
        alive=ext(b["alive"], False),
        special=jnp.zeros((W, NI), bool),
        rank=ext(ranks, jnp.int32(1 << 28)) if ranks.shape[1] == N
        else ranks,
        merlen=ext(jnp.where(b["alive"], 1, 0).astype(jnp.int32), 0),
        csum=ext(counts, 0),
        n_t=ext(status_T.astype(jnp.int32), 0),
        is_tumor=ext(b["is_tumor"], False),
        is_normal=ext(b["is_normal"], False),
        mer_item=jnp.broadcast_to(
            jnp.arange(N, dtype=jnp.int32)[None], (W, N)) + 0,
        mer_flip=jnp.zeros((W, N), bool),
        mer_pos=jnp.zeros((W, N), jnp.int32),
        keep_lo=jnp.zeros((W, N), jnp.int32),
        mer_tot=counts.sum(axis=-1),
        mer_totq=totq,
        mer_base=_mer_bases(b["mers_hi"], b["mers_lo"], K),
    )
    return st, NI


def _mer_bases(hi, lo, K):
    """Packed (hi, lo) -> [W, N, K] canonical base codes (2-bit fields
    never straddle the word boundary: shifts are even)."""
    outs = []
    for j in range(K):
        sh = 2 * (K - 1 - j)
        if sh >= 32:
            b = (hi >> (sh - 32)) & 3
        else:
            b = (lo >> sh) & 3
        outs.append(b.astype(jnp.int8))
    return jnp.stack(outs, axis=-1)


def _extend_edges(st, b, W, E, N, Cmax, K):
    EE = E + 4 * Cmax
    pad = EE - E

    def ext(a, fill):
        z = jnp.full((W, pad), fill, a.dtype)
        return jnp.concatenate([a, z], axis=1)

    alive_n = b["alive"]
    es, ed = b["edge_src"], b["edge_dst"]
    ea = (b["edge_exists"]
          & jnp.take_along_axis(alive_n, jnp.clip(es, 0, N - 1), 1)
          & jnp.take_along_axis(alive_n, jnp.clip(ed, 0, N - 1), 1))
    st["e_src"] = ext(jnp.where(ea, es, 0), 0)
    st["e_dst"] = ext(jnp.where(ea, ed, 0), 0)
    st["e_dir"] = ext(b["edge_dir"], 0)
    st["e_alive"] = ext(ea, False)
    st["e_okey"] = ext(jnp.broadcast_to(
        jnp.arange(E, dtype=jnp.int32)[None], (W, E)) + 0, BIG)
    st["keep_hi"] = jnp.full((W, N), K, jnp.int32)
    return st, EE


def _tandem_flags(st, NI):
    e_src, e_dst, e_alive = st["e_src"], st["e_dst"], st["e_alive"]
    W, EE = e_src.shape
    sl = e_alive & (e_src == e_dst)
    return jnp.zeros((W, NI), bool).at[
        _wid(W, EE), jnp.where(sl, e_src, NI - 1)].max(sl)


def cleanup(st, K, N, NI, cfg_s, avgcov, U=256, D2=24, TIP_ROUNDS=6):
    """lowcov(true) -> compress -> tips fixpoint -> short links ->
    compress (ref: Microassembler.cc:184-198). Returns (st, fallback)."""
    fallback = jnp.zeros((st["alive"].shape[0],), bool)

    # compress #1 (after cycle gate #1, Graph.cc:2712)
    st, fb = stages.compress_round(st, K, NI, N)
    fallback |= fb

    # removeLowCov(true, c) + compress
    st, _removed = stages.low_cov_pass(
        st, K, N, NI, cfg_s["low_cov_threshold"], cfg_s["min_cov_ratio"],
        avgcov)
    st, fb = stages.compress_round(st, K, NI, N)
    fallback |= fb

    # removeTips fixpoint (Graph.cc:2885-2926)
    max_tip = cfg_s["max_tip_len"]

    def tip_cond(st):
        merlen = st["merlen"]

        def cond(items, deg):
            ml = jnp.take_along_axis(merlen, items[:, None], 1)[:, 0]
            return (deg <= 1) & (ml < max_tip)

        return cond

    for _ in range(TIP_ROUNDS):
        st, removed_any, over = stages._seq_removal_pass(
            st, tip_cond(st), U, D2)
        fallback |= over
        st, fb = stages.compress_round(st, K, NI, N)
        fallback |= fb
    # non-convergence check: one more pass must remove nothing
    st2, removed_any, over = stages._seq_removal_pass(
        st, tip_cond(st), U, D2)
    fallback |= removed_any | over

    # removeShortLinks (Graph.cc:2833-2880)
    mincov, _ = stages.item_mincovs(st, K, N, NI)
    thr = jnp.floor(jnp.sqrt(avgcov)).astype(jnp.int32)
    max_link = cfg_s["max_link_len"]
    # STR guard candidates: materialize short strings and probe pos K-1
    merlen = st["merlen"]
    cand = (st["alive"] & ~st["special"] & (merlen < max_link)
            & (merlen > 0))
    guard = _short_link_str_guard(st, cand, K, N, NI,
                                  cfg_s["max_unit_len"],
                                  cfg_s["min_report_units"],
                                  cfg_s["min_report_len"],
                                  cfg_s["dist_from_str"])

    def sl_cond(items, deg):
        ml = jnp.take_along_axis(merlen, items[:, None], 1)[:, 0]
        mc = jnp.take_along_axis(mincov, items[:, None], 1)[:, 0]
        gu = jnp.take_along_axis(guard, items[:, None], 1)[:, 0]
        return (deg >= 2) & (ml < max_link) & (mc <= thr) & ~gu

    st, removed_any, over = stages._seq_removal_pass(st, sl_cond, U, D2)
    fallback |= over
    st, fb = stages.compress_round(st, K, NI, N)
    fallback |= fb
    return st, fallback


def run_attempt(b, ranks, K, N, E, Cmax, cfg_s, PC=192):
    """One k attempt past the build: components through cycle gate #2.

    b = build_k outputs (device); ranks [W, N] host map-order ranks.
    Returns (st, res) where res carries per-comp flags and anchor data.
    """
    W = b["alive"].shape[0]
    st, NI = _extend_items(b, ranks, W, N, Cmax, K)
    st, EE = _extend_edges(st, b, W, E, N, Cmax, K)

    comp, numcomp, over_c = stages.components(
        st["alive"], st["e_src"], st["e_dst"], st["e_alive"], st["rank"],
        Cmax)
    ends = stages.ref_ends(
        b["nid_proj"], b["proj_isF"], b["rawlen_dev"], K, comp,
        st["alive"], st["csum"], st["merlen"], cfg_s["cov_threshold"],
        Cmax)
    (st["e_src"], st["e_dst"], st["e_dir"], st["e_alive"], st["e_okey"],
     st["special"], st["alive"], comp) = stages.wire_anchors(
        ends, N, Cmax, st["e_src"], st["e_dst"], st["e_dir"],
        st["e_alive"], st["e_okey"], st["special"], st["alive"], comp)
    st["comp"] = comp

    # source/sink anchored at the same node: the reference's sequential
    # clip/wire interplay is replicated, but the subsequent compress
    # tandem dance is not — rare; route to native
    same_anchor = (ends["anchored"]
                   & (ends["src_nid"] == ends["snk_nid"])).any(axis=1)

    tandem = _tandem_flags(st, NI)
    cyc1, over_p1 = stages.has_cycle(
        st["e_src"], st["e_dst"], st["e_dir"], st["e_alive"], st["alive"],
        st["special"], tandem, N, Cmax, PC)

    avgcov = b["avgcov"]
    st, fb_clean = cleanup(st, K, N, NI, cfg_s, avgcov)

    tandem2 = _tandem_flags(st, NI)
    cyc2, over_p2 = stages.has_cycle(
        st["e_src"], st["e_dst"], st["e_dir"], st["e_alive"], st["alive"],
        st["special"], tandem2, N, Cmax, PC)

    fallback = (b["fallback"] | over_c | over_p1 | over_p2 | fb_clean
                | same_anchor)
    res = dict(cyc1=cyc1, cyc2=cyc2, ends=ends, numcomp=numcomp,
               fallback=fallback)
    return st, res


# unitig string cap for the short-link STR guard: merlen < K/2 mers ->
# base length < K/2 + K - 1 < 1.5K <= 47 for k <= 31
_SL_CAP = 64
_SL_ITEMS = 64


def _short_link_str_guard(st, cand, K, N, NI, max_unit_len,
                          min_report_units, min_report_len,
                          dist_from_str):
    """Per-item STR-guard flags: find_tandems(str, ..., K-1) reported a
    tandem near position K-1 (Graph.cc:2863-2870). Candidate strings are
    < 1.5K bases; up to _SL_ITEMS per window are probed (more than that
    many short branch nodes does not occur in practice — such windows
    have already overflowed other caps)."""
    W = cand.shape[0]
    # compact candidate items
    key = jnp.where(cand, jnp.arange(NI, dtype=jnp.int32)[None], BIG)
    order = jnp.argsort(key, axis=1)[:, :_SL_ITEMS]  # item ids
    n_cand = cand.sum(axis=1)
    slot_ok = (jnp.arange(_SL_ITEMS, dtype=jnp.int32)[None]
               < n_cand[:, None])
    slot_of_item = jnp.full((W, NI), -1, jnp.int32)
    slot_of_item = slot_of_item.at[
        _wid(W, _SL_ITEMS), jnp.where(slot_ok, order, NI - 1)].set(
        jnp.where(slot_ok,
                  jnp.broadcast_to(
                      jnp.arange(_SL_ITEMS, dtype=jnp.int32)[None],
                      (W, _SL_ITEMS)), -1), mode="drop")

    # scatter candidate unitig bases: [W, _SL_ITEMS, _SL_CAP]
    seqs = jnp.full((W, _SL_ITEMS, _SL_CAP), 99, jnp.int32)
    mi = jnp.clip(st["mer_item"], 0, NI - 1)
    mslot = jnp.take_along_axis(slot_of_item, mi, 1)  # [W, N]
    base = st["mer_base"]  # [W, N, K] canonical base codes
    klo, khi = st["keep_lo"], st["keep_hi"]
    flip = st["mer_flip"]
    pos = st["mer_pos"]
    NM = mi.shape[1]
    for j in range(K):
        keep = (j >= klo) & (j < khi) & (mslot >= 0)
        ci = jnp.where(flip, K - 1 - j, j)
        bj = jnp.take_along_axis(base, jnp.clip(ci, 0, K - 1)[:, :, None],
                                 2)[:, :, 0].astype(jnp.int32)
        bj = jnp.where(flip, bj ^ 3, bj)
        tgt = jnp.clip(pos + j, 0, _SL_CAP - 1)
        seqs = seqs.at[
            _wid(W, NM), jnp.where(keep, mslot, _SL_ITEMS), tgt].set(
            jnp.where(keep, bj, 99), mode="drop")
    item_len = st["merlen"] + K - 1
    lens = jnp.where(slot_ok, jnp.take_along_axis(
        item_len, jnp.clip(order, 0, NI - 1), 1), 0)
    ans = stages.tandem_at(
        seqs.reshape(W * _SL_ITEMS, _SL_CAP),
        lens.reshape(W * _SL_ITEMS), K - 1, max_unit_len,
        min_report_units, min_report_len, dist_from_str
    ).reshape(W, _SL_ITEMS)
    guard = jnp.zeros((W, NI), bool)
    guard = guard.at[
        _wid(W, _SL_ITEMS), jnp.where(slot_ok, order, NI - 1)].max(
        jnp.where(slot_ok, ans, False), mode="drop")
    return guard
