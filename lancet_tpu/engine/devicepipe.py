"""Device graph-engine driver: batches windows through the TPU per-k
assembly pipeline (tpu.dbg + tpu.pipeline) and assembles PathJobs.

Replaces the native C++ k-loop for the common case — the colored-DBG
build, cleanup, and path cover run on the device as fixed-shape batched
kernels (SURVEY.md §7); windows that exceed the shape caps or hit the
reference's irregular corners (mate-overlap dedup, k > 31, compress
loop-backs, map-rehash hazards) fall back to the native engine, which
replays them exactly.

Reference flow: Microassembler.cc:73-249 (processGraph k-retry loop).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..tpu.dbg import S_NML, S_REF, S_TMR
from .extract import PathJob

_BASES = np.frombuffer(b"ACGTN", np.uint8)

_CACHE_SET = False


def _enable_compile_cache():
    """Persistent XLA compilation cache: the per-k pipeline executables
    are large; caching them makes reruns (and every bench pass after the
    first) skip compilation."""
    global _CACHE_SET
    if _CACHE_SET:
        return
    _CACHE_SET = True
    import os

    import jax

    try:
        d = os.environ.get("LANCET_TPU_JAX_CACHE",
                           os.path.expanduser("~/.cache/lancet_tpu_xla"))
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


@dataclass
class WindowTask:
    """One window's inputs + evolving per-k state."""

    widx: int  # caller's window index
    reads: list  # [(seq, qual, sample, strand, frag, order)] post-trim
    rawseq: str
    totalreadbp: int
    refchr: str = ""
    refstart: int = 0
    # evolving trim state (stale-trim quirk: the k's index uses the
    # previous attempt's trim)
    seq_off: int = 0
    seq_len: int = 0
    done: bool = False
    fallback: bool = False
    jobs: list | None = None  # emitted PathJobs (in order)
    k_done: int = 0

    def __post_init__(self):
        self.seq_len = len(self.rawseq)
        self.jobs = []


# shape buckets: (R, L, N, E). Lraw/W fixed per run.
_BUCKETS = (
    (192, 160, 1536, 3840),
    (768, 160, 4096, 10240),
)
_CMAX = 8
_D = 12


def _cfg_scalars(cfg, K):
    return dict(cov_threshold=float(cfg.cov_threshold),
                low_cov_threshold=int(cfg.low_cov_threshold),
                min_cov_ratio=float(cfg.min_cov_ratio),
                max_tip_len=int(cfg.max_tip_len),
                max_link_len=int(cfg.max_link_len(K)),
                max_unit_len=int(cfg.max_unit_len),
                min_report_units=int(cfg.min_report_units),
                min_report_len=int(cfg.min_report_len),
                dist_from_str=int(cfg.dist_from_str))


def _bucket_for(task, Lraw):
    if len(task.rawseq) > Lraw:
        return None
    need_r = len(task.reads)
    need_l = max((len(s) for s, *_ in task.reads), default=0)
    for bi, (R, L, N, E) in enumerate(_BUCKETS):
        if need_r <= R and need_l <= L:
            return bi
    return None


def run_device_graph(tasks: list[WindowTask], cfg, stats: dict | None = None,
                     W: int | None = None, Lraw: int = 1152,
                     mesh=None) -> None:
    """Process tasks in place: fills .jobs/.done/.fallback per window.

    Jobs carry everything engine.extract.finish_path needs; callers
    align + finish them in task order. `mesh` shards the window batch
    axis of every pipeline step over a jax.sharding.Mesh.

    W (window-batch width): measured on the tunneled v5e the per-chunk
    cost is dominated by transfers and sorts, which scale ~linearly with
    W, so W=32 wins (W=128 ran 25% slower on the same corpus) and keeps
    executables cheap to compile."""
    _enable_compile_cache()
    if W is None:
        # measured on the tunneled v5e: per-chunk cost is transfer- and
        # sort-bound and scales ~linearly with W, so small chunks win
        # (W=128 ran 25% slower than W=32 on the same corpus)
        W = 32
    if mesh is not None:
        ndev = int(mesh.devices.size)
        W = max(ndev, W // ndev * ndev)  # shardable on the window axis
    import jax.numpy as jnp

    from ..tpu import pipeline
    from ..tpu.dbg import build_k
    from ..tpu.pack import WindowBatch, map_ranks, pack_window, unpack_mers
    from ..tpu.repeats import repeat_gates

    max_k_dev = min(cfg.max_k, 31)
    ks = [k for k in range(cfg.min_k, cfg.max_k + 1, 2) if k <= 31]

    # host-side shape screening
    buckets: dict[int, list[WindowTask]] = {}
    for t in tasks:
        bi = _bucket_for(t, Lraw)
        if bi is None:
            t.fallback = True
        else:
            buckets.setdefault(bi, []).append(t)

    import os as _os
    import sys as _sys
    import time as _time
    progress = bool(_os.environ.get("LANCET_TPU_PROGRESS"))

    n_attempts = 0
    for bi, group in sorted(buckets.items()):
        R, L, N, E = _BUCKETS[bi]
        pending = list(group)
        for K in ks:
            if not pending:
                break
            if progress:
                print(f"[devgraph] bucket {bi} k={K} pending={len(pending)}"
                      f" t={_time.strftime('%H:%M:%S')}",
                      file=_sys.stderr, flush=True)
            # reference-repeat gate for this k, batched on device
            # (Microassembler.cc:118-131): gated windows skip to next k
            gates = np.asarray(repeat_gates(
                [t.rawseq for t in pending], [K], cfg.max_mismatch))[:, 0]
            attempt = [t for t, g in zip(pending, gates) if not g]
            skipped = [t for t, g in zip(pending, gates) if g]
            next_pending = list(skipped)
            for lo in range(0, len(attempt), W):
                chunk = attempt[lo : lo + W]
                n_attempts += 1
                fb, retry = _run_chunk(chunk, cfg, K, W, R, L, N, E, Lraw,
                                       mesh, stats)
                next_pending.extend(retry)
            pending = next_pending
        for t in pending:
            t.fallback = True
    if stats is not None:
        stats["n_dev_attempts"] = stats.get("n_dev_attempts", 0) \
            + n_attempts


def _run_chunk(chunk, cfg, K, W, R, L, N, E, Lraw, mesh, stats=None):
    """One build+assemble attempt for <= W windows at k=K. Returns
    (fallback_tasks, retry_tasks); jobs are appended to tasks that
    succeed or abort after emitting earlier components."""
    import time as _time

    import jax
    import jax.numpy as jnp

    from ..tpu import pipeline
    from ..tpu.dbg import build_k
    from ..tpu.pack import WindowBatch, map_ranks, pack_window, unpack_mers

    def mark(key, t0):
        t1 = _time.perf_counter()
        if stats is not None:
            stats[key] = stats.get(key, 0.0) + (t1 - t0)
        return t1

    t0 = _time.perf_counter()
    batch = WindowBatch(W, R, L, Lraw)
    for w, t in enumerate(chunk):
        pack_window(batch, w, t.reads, t.rawseq, t.seq_off, t.seq_len,
                    t.totalreadbp)
    for w, t in enumerate(chunk):
        if batch.overflow[w]:
            batch.window_ok[w] = False
    t0 = mark("t_dg_pack", t0)

    # under a mesh, commit the batch inputs sharded on the window axis so
    # the build executable itself is partitioned (GSPMD propagates the
    # sharding; each device builds its window shard's graph)
    def dev(x):
        if mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec

        return jax.device_put(x, NamedSharding(mesh, PartitionSpec("w")))

    b = build_k(
        K, dev(batch.bases), dev(batch.quals), dev(batch.rlen),
        dev(batch.rsample), dev(batch.rstrand), dev(batch.rfrag),
        dev(batch.rorder), dev(batch.raw), dev(batch.rawlen),
        dev(batch.seq_off), dev(batch.seq_len), dev(batch.totalreadbp),
        dev(batch.window_ok),
        N=N, E=E, D=_D, Lraw=Lraw, min_qual_call=cfg.min_qual_call,
        low_cov_threshold=cfg.low_cov_threshold,
        min_cov_ratio=cfg.min_cov_ratio)

    # host round trip: creation-order mer strings -> map-order ranks
    mers_hi = np.asarray(b["mers_hi"])
    mers_lo = np.asarray(b["mers_lo"])
    n_nodes = np.asarray(b["n_nodes"])
    t0 = mark("t_dg_build", t0)  # build exec + D2H of the mer tables
    ranks = np.full((W, N), 1 << 28, np.int32)
    rank_bad = np.zeros(W, bool)
    merslist: list[list[str]] = []
    for w, t in enumerate(chunk):
        nn = int(n_nodes[w])
        mers = unpack_mers(mers_hi[w][:nn], mers_lo[w][:nn], K)
        merslist.append(mers)
        if not batch.window_ok[w]:
            continue
        r, slack = map_ranks(mers)
        ranks[w, :nn] = r
        if slack < 2 * _CMAX:  # fake-node inserts could trigger a rehash
            rank_bad[w] = True
    t0 = mark("t_dg_ranks", t0)

    out = _assemble(b, jnp.asarray(ranks), K, N, E,
                    jnp.asarray(batch.raw), _cfg_scalars(cfg, K),
                    int(cfg.dfs_limit) or (1 << 30),
                    int(cfg.max_indel_len), int(cfg.max_mismatch), mesh)
    res = {k: np.asarray(v) for k, v in out.items()}
    t0 = mark("t_dg_assemble", t0)

    fallback_tasks, retry = [], []
    for w, t in enumerate(chunk):
        if not batch.window_ok[w] or rank_bad[w] or res["fallback"][w]:
            t.fallback = True
            fallback_tasks.append(t)
            continue
        _finish_window(t, w, res, merslist[w], K, cfg, Lraw)
        if not t.done:
            retry.append(t)
    mark("t_dg_finish", t0)
    return fallback_tasks, retry


_ASSEMBLE_CACHE: dict = {}


def _assemble(b, ranks, K, N, E, raw, cfg_s, dfs_limit, max_indel,
              max_mismatch, mesh):
    """Jitted tail of the attempt: stages + path cover + materialize.
    One executable per (K, shapes, config scalars) — cached."""
    import jax

    key = (K, N, E, tuple(sorted(cfg_s.items())), dfs_limit, max_indel,
           max_mismatch, id(mesh) if mesh is not None else 0)
    fn = _ASSEMBLE_CACHE.get(key)
    if fn is None:
        import jax.numpy as jnp

        from ..tpu import pipeline

        def impl(b, ranks, raw):
            st, res = pipeline.run_attempt(b, ranks, K, N, E, _CMAX,
                                           cfg_s)
            NI = N + 2 * _CMAX
            paths = pipeline.path_cover(
                st, res, K, N, NI, _CMAX, res["ends"]["dist"], dfs_limit,
                max_indel)
            jobs = pipeline.materialize_jobs(
                st, b, paths, res, K, N, NI, _CMAX, raw, max_mismatch)
            out = dict(jobs)
            out["cyc1"] = res["cyc1"]
            out["cyc2"] = res["cyc2"]
            out["anchored"] = res["ends"]["anchored"]
            out["numcomp"] = res["numcomp"]
            out["asrc"] = res["ends"]["src_pos"]
            out["adist"] = res["ends"]["dist"]
            out["fallback"] = res["fallback"] | jobs["fallback"]
            out["refcov"] = b["refcov"].astype(jnp.int16)  # cov <= R
            return out

        if mesh is not None:
            from ..parallel.mesh import shard_windows_jit

            fn = shard_windows_jit(impl, mesh)
        else:
            fn = jax.jit(impl)
        _ASSEMBLE_CACHE[key] = fn
    return fn(b, ranks, raw)


def _finish_window(t: WindowTask, w: int, res, mers, K, cfg, Lraw):
    """Replay the per-component abort logic and emit PathJobs."""
    numcomp = int(res["numcomp"][w])
    n_sel = int(res["n_sel"][w])
    sel_comp = res["sel_comp"][w]
    raw_n = len(t.rawseq)
    refcov = res["refcov"][w][:raw_n]
    tumor_cov = np.zeros((raw_n, 10), np.int32)
    normal_cov = np.zeros((raw_n, 10), np.int32)
    tumor_cov[:, 0] = refcov[:, 0]
    tumor_cov[:, 1] = refcov[:, 1]
    normal_cov[:, 0] = refcov[:, 2]
    normal_cov[:, 1] = refcov[:, 3]

    abort_comp = 0  # 0 = none
    for c in range(1, min(numcomp, _CMAX) + 1):
        anch = bool(res["anchored"][w][c - 1])
        if anch and bool(res["cyc1"][w][c - 1]):
            abort_comp = c
            break
        if anch and bool(res["cyc2"][w][c - 1]):
            abort_comp = c
            break
        # repeat gate: first selected path of this comp with is_rep
        if anch:
            hit = False
            for j in range(n_sel):
                if int(sel_comp[j]) == c and bool(res["is_rep"][w][j]):
                    hit = True
                    break
            if hit:
                abort_comp = c
                break

    emit_before = abort_comp if abort_comp else min(numcomp, _CMAX) + 1

    # trim state: last anchored comp among the processed ones
    last_anch = 0
    processed = abort_comp if abort_comp else min(numcomp, _CMAX)
    for c in range(1, processed + 1):
        if bool(res["anchored"][w][c - 1]):
            last_anch = c
    if last_anch:
        t.seq_off = int(res["asrc"][w][last_anch - 1])
        t.seq_len = int(res["adist"][w][last_anch - 1])

    for j in range(n_sel):
        c = int(sel_comp[j])
        if c >= emit_before:
            continue
        lp = int(res["lp"][w][j])
        seq = _BASES[np.clip(res["pathseq"][w][j][:lp], 0, 4)].tobytes()
        covT = np.zeros((lp, 10), np.int32)
        covN = np.zeros((lp, 10), np.int32)
        covT[:, :4] = res["covT"][w][j][:lp]
        covN[:, :4] = res["covN"][w][j][:lp]
        src = int(res["src_pos"][w][j])
        dist = int(res["dist"][w][j])
        job = PathJob(
            refchr=t.refchr, refstart=t.refstart,
            trim5=int(res["trim5"][w][j]),
            refseq=t.rawseq[src : src + dist],
            pathseq=seq.decode("latin-1"), K=K,
            covN=covN, covT=covT,
            tumor_span=res["span"][w][j][: lp + 1].copy(),
            ref_cov_nml=normal_cov, ref_cov_tmr=tumor_cov,
            needs_dp=bool(res["needs_dp"][w][j]), lr_mode=False)
        t.jobs.append(job)

    t.done = not abort_comp
    t.k_done = K if t.done else 0
