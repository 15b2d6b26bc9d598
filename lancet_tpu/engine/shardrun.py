"""Native batched shard runner glue (lancet_native.cc lsr_*).

One native call processes every window of the run — BAM fetch with shared
per-chunk caches, active-region triage, the read-extraction filter chain,
and the per-k graph stage — in C++ threads; reads never enter Python
(replaces the per-window Python orchestration the round-1 profile showed
dominating: VERDICT.md "Next round" item 1). Python's remaining role per
run: the device-batched Gotoh alignment for the jobs that need DP
(tpu.align_batch), one lsr_finish call that replays the transcript state
machine natively, and Variant object construction from the packed records.

Windows that hit a native-side inconsistency are replayed with the Python
engine (identical semantics, deterministic), preserving the all-or-nothing
per-window fallback contract of engine.fastpipe.
"""

from __future__ import annotations

import ctypes
import os
import struct

import numpy as np

STATUS_OK = 0

_LSR = None


def _lib():
    global _LSR
    if _LSR is None:
        try:
            from ..native import load_library

            lib = load_library()
            u8p = ctypes.POINTER(ctypes.c_uint8)
            i32p = ctypes.POINTER(ctypes.c_int32)
            i64p = ctypes.POINTER(ctypes.c_int64)
            f64p = ctypes.POINTER(ctypes.c_double)
            lib.lsr_run.restype = ctypes.c_void_p
            lib.lsr_run.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64, i32p, i32p,
                i64p, i64p, u8p, i64p, u8p, u8p, ctypes.c_int, i64p, f64p,
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int64]
            lib.lsr_status.restype = ctypes.c_int
            lib.lsr_status.argtypes = [ctypes.c_void_p]
            lib.lsr_n_jobs.restype = ctypes.c_long
            lib.lsr_n_jobs.argtypes = [ctypes.c_void_p]
            lib.lsr_job_meta.argtypes = [ctypes.c_void_p, i64p]
            lib.lsr_job_path.restype = ctypes.c_char_p
            lib.lsr_job_path.argtypes = [ctypes.c_void_p, ctypes.c_long]
            lib.lsr_win_out.argtypes = [ctypes.c_void_p, u8p, i64p, f64p,
                                        i64p]
            lib.lsr_finish.argtypes = [ctypes.c_void_p, u8p, i64p, u8p, i64p]
            lib.lsr_n_vars.restype = ctypes.c_long
            lib.lsr_n_vars.argtypes = [ctypes.c_void_p]
            lib.lsr_varbuf_size.restype = ctypes.c_long
            lib.lsr_varbuf_size.argtypes = [ctypes.c_void_p]
            lib.lsr_varbuf.restype = u8p
            lib.lsr_varbuf.argtypes = [ctypes.c_void_p]
            lib.lsr_free.argtypes = [ctypes.c_void_p]
            lib.lsr_stage_ns.argtypes = [i64p]
            _LSR = lib
        except Exception:
            _LSR = 0
    return _LSR


def available() -> bool:
    return bool(_lib())


def _blob(strings: list[bytes]):
    off = np.zeros(len(strings) + 1, np.int64)
    np.cumsum([len(s) for s in strings], out=off[1:])
    blob = (np.frombuffer(b"".join(strings), np.uint8) if strings
            else np.zeros(0, np.uint8))
    return blob, off


class ShardRunResult:
    """Per-run native results: per-window Variant lists (constructor-arg
    records), fallback window indices, counters, and trace rows."""

    def __init__(self, variants_by_window, fallback, counters, times, reads,
                 n_jobs, n_dp):
        self.variants_by_window = variants_by_window
        self.fallback = fallback  # set of window indices needing replay
        self.counters = counters  # np [n_windows, 9]
        self.times = times
        self.reads = reads
        self.n_jobs = n_jobs
        self.n_dp = n_dp


def run_shards(cfg, windows, tumor, normal, stats: dict | None = None):
    """Run every window natively. `windows` is the full ordered list
    (shard-concatenated, lexicographic within shard) — the VariantDB add
    order. `tumor`/`normal` are open readers (for refid lookup only).
    Returns ShardRunResult or None when the native plane is unavailable.
    """
    import time as _time

    lib = _lib()
    if not lib:
        return None

    n = len(windows)
    tmap = {nm: i for i, (nm, _) in enumerate(tumor.references)}
    nmap = {nm: i for i, (nm, _) in enumerate(normal.references)}
    refid_t = np.array([tmap.get(w.chrom, -1) for w in windows], np.int32)
    refid_n = np.array([nmap.get(w.chrom, -1) for w in windows], np.int32)
    starts = np.array([w.refstart for w in windows], np.int64)
    ends = np.array([w.refend for w in windows], np.int64)
    raw_blob, raw_off = _blob([w.rawseq.encode("latin-1") for w in windows])

    # Device repeat gates (micro._precompute_gates) are OFF by default for
    # the native runner: the eager [windows x ks] device sweep computes
    # ~46 gates per window, while the native k-loop consults them lazily —
    # one cheap hash scan per *attempted* k of an *active* window (most
    # windows never reach the k loop; most active windows succeed at
    # min_k). Profiling on the 5,195-window bench corpus: 6.2s device
    # sweep vs <0.1s lazy native scans. LANCET_TPU_GATES=1 re-enables the
    # device path (it stays exercised by tests and the mesh demo).
    t0 = _time.perf_counter()
    gates_arr = np.zeros(0, np.uint8)
    exact_arr = np.zeros(0, np.uint8)
    n_k = 0
    use_gates = bool(os.environ.get("LANCET_TPU_GATES"))
    if use_gates:
        try:
            from ..tpu.repeats import repeat_gates

            ks = list(range(cfg.min_k, cfg.max_k + 1, 2))
            n_k = len(ks)
            gates_arr = np.zeros((n, n_k), np.uint8)
            exact_arr = np.zeros(n, np.uint8)
            CH = 512
            for i in range(0, n, CH):
                chunk = windows[i : i + CH]
                g, e = repeat_gates([w.rawseq for w in chunk], ks,
                                    cfg.max_mismatch, with_exact=True)
                gates_arr[i : i + len(chunk)] = np.asarray(g, np.uint8)
                exact_arr[i : i + len(chunk)] = np.asarray(
                    e, np.uint8)[:, n_k - 1]
            gates_arr = np.ascontiguousarray(gates_arr.reshape(-1))
        except Exception:
            n_k = 0
            gates_arr = np.zeros(0, np.uint8)
            exact_arr = np.zeros(0, np.uint8)
    if stats is not None:
        stats["t_gates"] = _time.perf_counter() - t0

    icfg = np.array([
        cfg.min_k, cfg.max_k, cfg.min_qual_trim, cfg.min_qual_call,
        cfg.min_map_qual, cfg.max_avg_cov, cfg.max_delta_as_xs,
        int(cfg.xa_filter), int(cfg.primary_alignment_only),
        int(cfg.active_regions), cfg.filters.min_alt_cnt_tumor,
        cfg.low_cov_threshold, cfg.max_tip_len, cfg.dfs_limit,
        cfg.max_indel_len, cfg.max_mismatch, cfg.max_unit_len,
        cfg.min_report_units, cfg.min_report_len, cfg.dist_from_str],
        np.int64)
    dcfg = np.array([cfg.min_cov_ratio, float(cfg.cov_threshold)], np.float64)

    rgs = b""
    if getattr(cfg, "rg_file", ""):
        with open(cfg.rg_file) as f:
            toks = f.read().split()
        if toks:
            rgs = "\n".join(toks).encode()

    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)

    def p(a, t):
        return a.ctypes.data_as(t) if a.size else ctypes.cast(None, t)

    n_threads = max(1, os.cpu_count() or 1)
    cache_span = int(os.environ.get("LANCET_TPU_CACHE_SPAN", 8 << 20))

    t0 = _time.perf_counter()
    h = lib.lsr_run(
        cfg.tumor_bam.encode(), cfg.normal_bam.encode(), n,
        p(refid_t, i32p), p(refid_n, i32p), p(starts, i64p), p(ends, i64p),
        p(raw_blob, u8p), p(raw_off, i64p),
        p(gates_arr, u8p) if n_k else ctypes.cast(None, u8p),
        p(exact_arr, u8p) if n_k else ctypes.cast(None, u8p), n_k,
        p(icfg, i64p), p(dcfg, f64p), rgs, n_threads, cache_span)
    try:
        if lib.lsr_status(h) != STATUS_OK:
            return None
        if stats is not None:
            stats["t_host"] = _time.perf_counter() - t0

        n_jobs = lib.lsr_n_jobs(h)
        meta = np.zeros((n_jobs, 6), np.int64)
        if n_jobs:
            lib.lsr_job_meta(h, p(meta.reshape(-1), i64p))
        dp_idx = np.nonzero(meta[:, 4])[0] if n_jobs else np.zeros(0, int)

        t0 = _time.perf_counter()
        pairs = []
        for i in dp_idx:
            w = windows[int(meta[i, 0])]
            src, dist = int(meta[i, 1]), int(meta[i, 2])
            refseq = w.rawseq[src : src + dist]
            pathseq = ctypes.string_at(
                lib.lsr_job_path(h, int(i)), int(meta[i, 3])).decode("latin-1")
            pairs.append((refseq, pathseq))
        aligned = []
        if pairs:
            from ..tpu.align_batch import batch_align

            aligned = batch_align(pairs)
        if stats is not None:
            stats["t_dp"] = _time.perf_counter() - t0
            stats["n_jobs"] = int(n_jobs)
            stats["n_dp"] = len(pairs)

        t0 = _time.perf_counter()
        ra_blob, ra_off = _blob([a.encode("latin-1") for a, _ in aligned])
        pa_blob, pa_off = _blob([b.encode("latin-1") for _, b in aligned])
        lib.lsr_finish(h, p(ra_blob, u8p), p(ra_off, i64p), p(pa_blob, u8p),
                       p(pa_off, i64p))

        # unpack packed variant records -> per-window Variant lists
        from .variant import Variant

        nv = lib.lsr_varbuf_size(h)
        buf = ctypes.string_at(lib.lsr_varbuf(h), nv) if nv else b""
        variants_by_window: dict[int, list] = {}
        off = 0
        zero3 = (0, 0, 0)
        while off < nv:
            (win, pos, code, prev_ref, prev_alt, _pad, kmer, l_ref, l_alt,
             l_str) = struct.unpack_from("<iqBBBBiiii", buf, off)
            cov = struct.unpack_from("<8i", buf, off + 32)
            off += 64
            ref = buf[off : off + l_ref].decode("latin-1")
            off += l_ref
            alt = buf[off : off + l_alt].decode("latin-1")
            off += l_alt
            str_tag = buf[off : off + l_str].decode("latin-1")
            off += l_str
            v = Variant(
                lr_mode=False, chrom=windows[win].chrom, pos=pos,
                ref_str=ref, alt_str=alt,
                rcn=(cov[0], cov[1]), rct=(cov[2], cov[3]),
                acn=(cov[4], cov[5]), act=(cov[6], cov[7]),
                hprn=zero3, hprt=zero3, hpan=zero3, hpat=zero3,
                prev_bp_ref=chr(prev_ref), prev_bp_alt=chr(prev_alt),
                kmer=kmer, str_tag=str_tag, code=chr(code))
            variants_by_window.setdefault(win, []).append(v)

        flags = np.zeros(n, np.uint8)
        reads = np.zeros(n, np.int64)
        times = np.zeros(n, np.float64)
        cls = np.zeros((n, 9), np.int64)
        lib.lsr_win_out(h, p(flags, u8p), p(reads, i64p), p(times, f64p),
                        p(cls.reshape(-1), i64p))
        fallback = set(int(i) for i in np.nonzero(flags)[0])
        if stats is not None:
            stats["t_finish"] = _time.perf_counter() - t0

        if stats is not None:
            ns = np.zeros(10, np.int64)
            lib.lsr_stage_ns(p(ns, i64p))
            for k, v in zip(("t_c_fetch", "t_c_triage", "t_c_extract",
                             "t_c_kloop", "t_c_scan", "t_c_build",
                             "t_c_refcov", "t_c_mat", "t_c_stages",
                             "t_c_eka"), ns):
                stats[k] = float(v) / 1e9
        return ShardRunResult(variants_by_window, fallback, cls, times,
                              reads, int(n_jobs), len(pairs))
    finally:
        lib.lsr_free(h)
