"""Device-side graph cleanup stages over the jit1 (tpu.dbg.build_k) node
and edge tables: connected components, source/sink anchoring with
CLIP_REF_ENDS, cycle gates as boolean matrix closures on the MXU, and
unitig compression as pointer-jumping over mutual-buddy chains with
donor-interval bookkeeping (ref: src/Graph.cc:2028-2336, :593-681,
:2486-2732).

State layout (all [W, ...], item axis NI = N + 2*Cmax where slots
N+2c / N+2c+1 are component c+1's fake source/sink):

- items: alive, special, rank (libstdc++ map-order rank from the host
  sim; survivor choice and component numbering replay it), comp,
  merlen, csum [NI,4] (summed per-mer counts; node coverage =
  csum/merlen exactly, replacing the reference's float cascade),
  n_t_status (count of status-'T' mers), is_tumor/is_normal.
- edges: e_src, e_dst, e_dir (FF=0 FR=1 RF=2 RR=3), e_alive, e_okey
  (per-source list order; renormalized to dense ranks each round).
- mers (fixed axis [N] from build): mer_item, mer_flip, mer_pos (mer
  offset within its item, unitig orientation), keep_lo/keep_hi (kept
  donor interval within the mer's K bases, unitig-oriented — the
  compressNode concatenation drops K-1 overlap bases at each junction
  on the absorbed side, Graph.cc:2563-2651).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BIG = jnp.int32(1 << 30)


def startbit(d):
    return d >> 1


def destbit(d):
    return d & 1


def fliplink(d):
    """(a,b) -> (!b,!a) (ref: Edge.hh:103-111)."""
    return ((d & 1) ^ 1) * 2 + ((d >> 1) ^ 1)


def _wid(W, n):
    return jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[:, None], (W, n))


# ---------------------------------------------------------------------------
# connected components (ref: Graph.cc:2252-2336)
# ---------------------------------------------------------------------------

def components(alive, e_src, e_dst, e_alive, rank, Cmax):
    """Labels connected components over alive items; numbers them 1.. in
    the order the reference's map iteration first reaches them
    (ascending min map-rank). Returns (comp [W,NI] int32 0=none,
    numcomp [W], over_c [W])."""
    W, NI = alive.shape
    E = e_src.shape[1]
    wid_e = _wid(W, E)
    idx = jnp.broadcast_to(jnp.arange(NI, dtype=jnp.int32)[None], (W, NI))
    label = jnp.where(alive, idx, BIG)
    ea = e_alive

    def body(state):
        label, _ = state
        m = jnp.minimum(
            jnp.take_along_axis(label, jnp.clip(e_src, 0, NI - 1), 1),
            jnp.take_along_axis(label, jnp.clip(e_dst, 0, NI - 1), 1))
        m = jnp.where(ea, m, BIG)
        new = label.at[wid_e, jnp.where(ea, e_src, 0)].min(
            jnp.where(ea, m, BIG))
        new = new.at[wid_e, jnp.where(ea, e_dst, 0)].min(
            jnp.where(ea, m, BIG))
        # pointer jumping
        for _ in range(2):
            new = jnp.minimum(
                new, jnp.take_along_axis(new, jnp.clip(new, 0, NI - 1), 1))
        return new, jnp.any(new != label)

    label, _ = jax.lax.while_loop(
        lambda s: s[1], body, body((label, jnp.bool_(True))))

    # component numbering: ascending min map-rank per root
    lab_minrank = jnp.full((W, NI), BIG, jnp.int32)
    lab_minrank = lab_minrank.at[
        _wid(W, NI), jnp.clip(label, 0, NI - 1)].min(
        jnp.where(alive, rank, BIG))
    is_root = alive & (label == idx)
    root_key = jnp.where(is_root, lab_minrank, BIG)
    order = jnp.argsort(root_key, axis=1)  # [W, compidx] -> root item
    comp_of_root = jnp.zeros((W, NI), jnp.int32)
    comp_of_root = comp_of_root.at[
        _wid(W, NI), order].set(
        jnp.broadcast_to(
            jnp.arange(1, NI + 1, dtype=jnp.int32)[None], (W, NI)))
    comp = jnp.where(
        alive,
        jnp.take_along_axis(comp_of_root, jnp.clip(label, 0, NI - 1), 1), 0)
    numcomp = is_root.sum(axis=1).astype(jnp.int32)
    return comp, numcomp, numcomp > Cmax


# ---------------------------------------------------------------------------
# source/sink anchoring (ref: Graph.cc:2028-2228)
# ---------------------------------------------------------------------------

def ref_ends(nid_proj, proj_isF, rawlen, K, comp, alive, csum, merlen,
             cov_threshold, Cmax):
    """Per-component anchor scan over the rawseq mers. Returns per
    (window, comp 0..Cmax-1): anchored, src_pos/snk_pos, src_nid/snk_nid,
    src_ori/snk_ori (True=F), trims."""
    W, Mraw = nid_proj.shape
    roff = jnp.broadcast_to(
        jnp.arange(Mraw, dtype=jnp.int32)[None], (W, Mraw))
    valid = (nid_proj >= 0) & (roff <= rawlen[:, None] - K)
    safe = jnp.clip(nid_proj, 0, alive.shape[1] - 1)
    tot = csum.sum(axis=-1)  # node tot_cov * merlen; merlen==1 pre-compress
    nd_ok = alive & (tot >= cov_threshold)
    q = valid & jnp.take_along_axis(nd_ok, safe, 1)
    pcomp = jnp.where(q, jnp.take_along_axis(comp, safe, 1), 0)

    out = {}
    srcs = []
    for c in range(1, Cmax + 1):
        mc = q & (pcomp == c)
        has = mc.any(axis=1)
        src_pos = jnp.argmax(mc, axis=1).astype(jnp.int32)
        snk_pos = (Mraw - 1
                   - jnp.argmax(mc[:, ::-1], axis=1)).astype(jnp.int32)
        src_nid = jnp.take_along_axis(
            nid_proj, src_pos[:, None], 1)[:, 0]
        snk_nid = jnp.take_along_axis(
            nid_proj, snk_pos[:, None], 1)[:, 0]
        amb_src = (mc & (nid_proj == src_nid[:, None])).sum(axis=1) >= 2
        amb_snk = (mc & (nid_proj == snk_nid[:, None])).sum(axis=1) >= 2
        anchored = has & ~amb_src & ~amb_snk
        src_ori = jnp.take_along_axis(proj_isF, src_pos[:, None], 1)[:, 0]
        snk_ori = jnp.take_along_axis(proj_isF, snk_pos[:, None], 1)[:, 0]
        srcs.append((anchored, src_pos, snk_pos, src_nid, snk_nid,
                     src_ori, snk_ori))
    for name, i in (("anchored", 0), ("src_pos", 1), ("snk_pos", 2),
                    ("src_nid", 3), ("snk_nid", 4), ("src_ori", 5),
                    ("snk_ori", 6)):
        out[name] = jnp.stack([s[i] for s in srcs], axis=1)  # [W, Cmax]
    out["trim5"] = out["src_pos"]
    out["dist"] = out["snk_pos"] - out["src_pos"] + K
    out["trim3"] = rawlen[:, None] - out["snk_pos"] - K
    return out


def wire_anchors(ends, N, Cmax, e_src, e_dst, e_dir, e_alive, e_okey,
                 special, alive, comp):
    """CLIP_REF_ENDS + fake source/sink wiring (ref: Graph.cc:2156-2227).

    Edge rows E..E+4*Cmax-1 (pre-padded dead) become, per comp c:
    [fake_src->anchor, anchor->fake_src, fake_snk->anchor,
    anchor->fake_snk]. Returns updated edge arrays + item arrays."""
    W, EE = e_src.shape
    E = EE - 4 * Cmax
    anch = ends["anchored"]
    wid1 = jnp.arange(W, dtype=jnp.int32)

    sb = startbit(e_dir)
    db = destbit(e_dir)
    for c in range(Cmax):
        on = anch[:, c]
        sn = ends["src_nid"][:, c]
        so = ends["src_ori"][:, c]  # True = F
        kn = ends["snk_nid"][:, c]
        ko = ends["snk_ori"][:, c]
        # source clip (Graph.cc:2165-2191): edges from the source node
        # with startdir == (R if so==F else F), non-self; and their twins
        # (dst == source node, destbit == !clipdir). Bits: F=0, R=1.
        clip_sb = so.astype(jnp.int32)  # so==F(True) -> clip R(1)
        kill = (on[:, None] & e_alive
                & (((e_src == sn[:, None]) & (sb == clip_sb[:, None])
                    & (e_dst != sn[:, None]))
                   | ((e_dst == sn[:, None]) & (e_src != sn[:, None])
                      & (db == (~so).astype(jnp.int32)[:, None]))))
        e_alive = e_alive & ~kill
        # wire fake source: sourcedir = FF if so else FR
        fs = N + 2 * c
        sdir = jnp.where(so, 0, 1).astype(jnp.int8)  # FF=0 / FR=1
        row = E + 4 * c
        e_src = e_src.at[:, row].set(jnp.where(on, fs, e_src[:, row]))
        e_dst = e_dst.at[:, row].set(jnp.where(on, sn, e_dst[:, row]))
        e_dir = e_dir.at[:, row].set(
            jnp.where(on, sdir, e_dir[:, row]))
        e_alive = e_alive.at[:, row].set(on | e_alive[:, row])
        e_okey = e_okey.at[:, row].set(0)
        row = E + 4 * c + 1
        e_src = e_src.at[:, row].set(jnp.where(on, sn, e_src[:, row]))
        e_dst = e_dst.at[:, row].set(jnp.where(on, fs, e_dst[:, row]))
        e_dir = e_dir.at[:, row].set(
            jnp.where(on, fliplink(sdir), e_dir[:, row]).astype(jnp.int8))
        e_alive = e_alive.at[:, row].set(on | e_alive[:, row])
        e_okey = e_okey.at[:, row].set(BIG - 2)  # appended last
        special = special.at[:, fs].set(on | special[:, fs])
        alive = alive.at[:, fs].set(on | alive[:, fs])
        comp = comp.at[:, fs].set(jnp.where(on, c + 1, comp[:, fs]))

        # sink clip AFTER source wiring (the fresh fake edges are fair
        # game when source_node == sink_node, exactly like the reference)
        sb = startbit(e_dir)
        db = destbit(e_dir)
        clip_sb2 = (~ko).astype(jnp.int32)  # clip startdir == sink_ori
        kill = (on[:, None] & e_alive
                & (((e_src == kn[:, None]) & (sb == clip_sb2[:, None])
                    & (e_dst != kn[:, None]))
                   | ((e_dst == kn[:, None]) & (e_src != kn[:, None])
                      & (db == ko.astype(jnp.int32)[:, None]))))
        e_alive = e_alive & ~kill
        fk = N + 2 * c + 1
        kdir = jnp.where(ko, 3, 0).astype(jnp.int8)  # RR=3 / FF=0
        row = E + 4 * c + 2
        e_src = e_src.at[:, row].set(jnp.where(on, fk, e_src[:, row]))
        e_dst = e_dst.at[:, row].set(jnp.where(on, kn, e_dst[:, row]))
        e_dir = e_dir.at[:, row].set(jnp.where(on, kdir, e_dir[:, row]))
        e_alive = e_alive.at[:, row].set(on | e_alive[:, row])
        e_okey = e_okey.at[:, row].set(0)
        row = E + 4 * c + 3
        e_src = e_src.at[:, row].set(jnp.where(on, kn, e_src[:, row]))
        e_dst = e_dst.at[:, row].set(jnp.where(on, fk, e_dst[:, row]))
        e_dir = e_dir.at[:, row].set(
            jnp.where(on, fliplink(kdir), e_dir[:, row]).astype(jnp.int8))
        e_alive = e_alive.at[:, row].set(on | e_alive[:, row])
        e_okey = e_okey.at[:, row].set(BIG - 1)
        special = special.at[:, fk].set(on | special[:, fk])
        alive = alive.at[:, fk].set(on | alive[:, fk])
        comp = comp.at[:, fk].set(jnp.where(on, c + 1, comp[:, fk]))
        sb = startbit(e_dir)
        db = destbit(e_dir)
    return e_src, e_dst, e_dir, e_alive, e_okey, special, alive, comp


# ---------------------------------------------------------------------------
# buddy / chain machinery (ref: Node.cc:235-266 getBuddy)
# ---------------------------------------------------------------------------

def edge_renorm(e_src, e_okey, e_alive, NI):
    """Dense per-source okey ranks (stable in current okey order)."""
    W, EE = e_src.shape
    key1 = jnp.where(e_alive, e_src, BIG)
    eidx = jnp.broadcast_to(
        jnp.arange(EE, dtype=jnp.int32)[None], (W, EE))
    k1, _, perm = jax.lax.sort((key1, e_okey, eidx), num_keys=2,
                               dimension=1, is_stable=True)
    newrun = jnp.ones((W, EE), bool)
    newrun = newrun.at[:, 1:].set(k1[:, 1:] != k1[:, :-1])
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(newrun, eidx, 0), axis=1)
    slot = eidx - run_start
    out = jnp.zeros((W, EE), jnp.int32)
    out = out.at[_wid(W, EE), perm].set(slot)
    return jnp.where(e_alive, out, BIG)


def links(e_src, e_dst, e_dir, e_alive, e_okey, alive, special, NI):
    """Mutual-buddy chain links. Returns dict with per-(item, bit):
    lnk_valid [W,NI,2], lnk_to (dst item), lnk_bit (continuation bit),
    tandem [W,NI], cnt [W,NI,2] (alive out-degree per direction),
    bud_okey (okey of the unique edge)."""
    W, EE = e_src.shape
    wid_e = _wid(W, EE)
    sb = startbit(e_dir).astype(jnp.int32)
    seg = jnp.where(e_alive, e_src * 2 + sb, NI * 2)
    cnt = jnp.zeros((W, NI * 2 + 1), jnp.int32).at[wid_e, seg].add(
        jnp.where(e_alive, 1, 0))[:, :-1].reshape(W, NI, 2)
    one_dst = jnp.full((W, NI * 2 + 1), BIG, jnp.int32).at[
        wid_e, seg].min(jnp.where(e_alive, e_dst, BIG))[:, :-1]
    one_db = jnp.full((W, NI * 2 + 1), BIG, jnp.int32).at[
        wid_e, seg].min(jnp.where(e_alive, destbit(e_dir).astype(jnp.int32),
                                  BIG))[:, :-1]
    one_ok = jnp.full((W, NI * 2 + 1), BIG, jnp.int32).at[
        wid_e, seg].min(jnp.where(e_alive, e_okey, BIG))[:, :-1]
    one_dst = one_dst.reshape(W, NI, 2)
    one_db = one_db.reshape(W, NI, 2)
    one_ok = one_ok.reshape(W, NI, 2)
    tandem = jnp.zeros((W, NI), bool).at[
        wid_e, jnp.where(e_alive & (e_src == e_dst), e_src, NI - 1)].max(
        e_alive & (e_src == e_dst))
    # unique edge in dir
    uniq = cnt == 1
    v = one_dst
    b = one_db
    idx = jnp.broadcast_to(
        jnp.arange(NI, dtype=jnp.int32)[None, :, None], (W, NI, 2))
    base = (uniq & (v != idx) & alive[:, :, None]
            & ~special[:, :, None] & ~tandem[:, :, None])
    vsafe = jnp.clip(v, 0, NI - 1)
    v_special = jnp.take_along_axis(
        special[:, :, None].repeat(2, 2), vsafe, 1)
    v_tandem = jnp.take_along_axis(
        tandem[:, :, None].repeat(2, 2), vsafe, 1)
    base = base & ~v_special & ~v_tandem
    # mutuality: v's unique edge in dir (!b) points back to u
    bdir = 1 - b  # bit of v pointing back toward u
    gather_i = vsafe * 2 + jnp.clip(bdir, 0, 1)
    cnt_f = cnt.reshape(W, NI * 2)
    dst_f = one_dst.reshape(W, NI * 2)
    gi = jnp.clip(gather_i, 0, NI * 2 - 1)
    back_uniq = jnp.take_along_axis(cnt_f, gi.reshape(W, -1),
                                    1).reshape(W, NI, 2) == 1
    back_dst = jnp.take_along_axis(dst_f, gi.reshape(W, -1),
                                   1).reshape(W, NI, 2)
    valid = base & back_uniq & (back_dst == idx)
    return {"lnk_valid": valid, "lnk_to": jnp.where(valid, v, idx),
            "lnk_bit": jnp.where(valid, b, 0), "tandem": tandem,
            "cnt": cnt, "bud_okey": one_ok}


def chain_jump(lnk, NI, rounds=17):
    """Pointer jumping over the link state graph (state = item*2+bit).
    Returns end_state [W, 2NI], dist [W, 2NI], cyc [W] (unterminated
    chain = mutual-buddy cycle -> window fallback)."""
    W = lnk["lnk_valid"].shape[0]
    S = NI * 2
    valid = lnk["lnk_valid"].reshape(W, S)
    to = (lnk["lnk_to"] * 2 + lnk["lnk_bit"]).reshape(W, S)
    sid = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (W, S))
    nxt = jnp.where(valid, to, sid)
    dist = jnp.where(valid, 1, 0).astype(jnp.int32)
    for _ in range(rounds):
        d2 = dist + jnp.take_along_axis(dist, nxt, 1)
        nxt = jnp.take_along_axis(nxt, nxt, 1)
        dist = d2
    cyc = (dist >= (1 << rounds)).any(axis=1)
    return nxt, dist, cyc


# ---------------------------------------------------------------------------
# cycle gate (ref: Graph.cc:593-681) — port-graph boolean closure on MXU
# ---------------------------------------------------------------------------

def walk_jump(e_src, e_dst, e_dir, e_alive, alive, special, tandem, NI,
              rounds=17):
    """DFS-walk contraction: a *walk-interior* node (alive, non-special,
    non-tandem, exactly one out-edge per direction) forwards state
    (v, b) deterministically along its unique b-edge. Pointer jumping
    yields, per state, the first non-interior state reached (or an
    unterminated flag = the walk enters a pure interior cycle).

    Returns (winterior [W,NI], end_state [W,2NI], unterm [W,2NI])."""
    W, EE = e_src.shape
    wid_e = _wid(W, EE)
    sb = startbit(e_dir).astype(jnp.int32)
    seg = jnp.where(e_alive, e_src * 2 + sb, NI * 2)
    cnt = jnp.zeros((W, NI * 2 + 1), jnp.int32).at[wid_e, seg].add(
        jnp.where(e_alive, 1, 0))[:, :-1].reshape(W, NI, 2)
    one_dst = jnp.full((W, NI * 2 + 1), BIG, jnp.int32).at[
        wid_e, seg].min(jnp.where(e_alive, e_dst, BIG))[:, :-1]
    one_db = jnp.full((W, NI * 2 + 1), BIG, jnp.int32).at[
        wid_e, seg].min(
        jnp.where(e_alive, destbit(e_dir).astype(jnp.int32), BIG))[:, :-1]
    one_dst = one_dst.reshape(W, NI, 2)
    one_db = one_db.reshape(W, NI, 2)
    winterior = (alive & ~special & ~tandem
                 & (cnt[:, :, 0] == 1) & (cnt[:, :, 1] == 1))
    S = NI * 2
    valid = winterior[:, :, None].repeat(2, 2).reshape(W, S)
    to = (one_dst * 2 + one_db).reshape(W, S)
    sid = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (W, S))
    nxt = jnp.where(valid, jnp.clip(to, 0, S - 1), sid)
    dist = jnp.where(valid, 1, 0).astype(jnp.int32)
    for _ in range(rounds):
        dist = dist + jnp.take_along_axis(dist, nxt, 1)
        nxt = jnp.take_along_axis(nxt, nxt, 1)
    unterm = dist >= (1 << rounds)
    return winterior, nxt, unterm


def has_cycle(e_src, e_dst, e_dir, e_alive, alive, special, tandem,
              N, Cmax, PC):
    """Per-comp cycle flags [W, Cmax]: does a DFS from comp c's fake
    source (both orientations) reach a directed cycle
    (Graph.cc:593-681)? Walk-interior runs are contracted through
    pointer jumps; the remaining ports index a [2*PC, 2*PC] boolean
    transition matrix closed by log-step matmuls on the MXU. The last
    port state is a dedicated CYC sink for walks that enter a pure
    interior cycle. over_p flags port overflow."""
    W, NI = alive.shape
    EE = e_src.shape[1]
    winterior, wend, wunterm = walk_jump(
        e_src, e_dst, e_dir, e_alive, alive, special, tandem, NI)
    is_port = alive & ~winterior
    pidx = jnp.cumsum(is_port.astype(jnp.int32), axis=1) - 1  # per window
    over_p = (jnp.max(jnp.where(is_port, pidx, -1), axis=1) + 1) > PC - 1
    pidx = jnp.where(is_port, jnp.minimum(pidx, PC - 2), -1)
    S = 2 * PC
    CYC = S - 1  # dedicated on-cycle sink state (self-loop)
    T = jnp.zeros((W, S, S), jnp.float32)
    T = T.at[:, CYC, CYC].set(1.0)

    sb = startbit(e_dir).astype(jnp.int32)
    db = destbit(e_dir).astype(jnp.int32)
    # edges out of port states; a walk-interior dst is contracted to the
    # end of its walk; special dst is skipped (Graph.cc:665)
    psrc = jnp.take_along_axis(pidx, jnp.clip(e_src, 0, NI - 1), 1)
    dspec = jnp.take_along_axis(special, jnp.clip(e_dst, 0, NI - 1), 1)
    d_int = jnp.take_along_axis(winterior, jnp.clip(e_dst, 0, NI - 1), 1)
    dst_state = jnp.clip(e_dst * 2 + db, 0, NI * 2 - 1)
    jump_end = jnp.take_along_axis(wend, dst_state, 1)
    jump_bad = jnp.take_along_axis(wunterm, dst_state, 1)
    tgt_state = jnp.where(d_int, jump_end, dst_state)
    tgt_item = tgt_state // 2
    ptgt = jnp.take_along_axis(pidx, jnp.clip(tgt_item, 0, NI - 1), 1)
    ok = e_alive & (psrc >= 0) & ~dspec
    col = jnp.where(jump_bad & d_int, CYC,
                    jnp.where(ptgt >= 0, ptgt * 2 + (tgt_state & 1), CYC))
    # a contracted walk that ends at a special item: the DFS stops there
    # without expanding -- drop the transition
    tspec = jnp.take_along_axis(special, jnp.clip(tgt_item, 0, NI - 1), 1)
    ok = ok & (~tspec | (jump_bad & d_int))
    r = jnp.where(ok, psrc * 2 + sb, 0)
    col = jnp.where(ok, col, 0)
    T = T.at[_wid(W, EE), r, col].max(jnp.where(ok, 1.0, 0.0))

    # closure: R = T+ (at least one step)
    R = T
    for _ in range(9):  # 2^9 >= S
        R = jnp.minimum(R + jnp.einsum("wij,wjk->wik", R, R), 1.0)
    on_cycle = jnp.einsum("wss->ws", R) > 0  # [W, S]

    flags = []
    for c in range(Cmax):
        fs = N + 2 * c
        pfs = pidx[:, fs]
        rows = jnp.take_along_axis(
            R, jnp.clip(pfs, 0, PC - 1)[:, None, None] * 2
            + jnp.arange(2)[None, :, None], 1)  # [W, 2, S]
        reach = rows.max(axis=1) > 0  # [W, S]
        cyc = (reach & on_cycle).any(axis=1) & (pfs >= 0)
        flags.append(cyc)
    return jnp.stack(flags, axis=1), over_p
