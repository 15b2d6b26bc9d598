"""End-to-end run orchestration (host pipeline; ref: src/Lancet.cc main).

Shards windows round-robin (reference thread semantics), processes each
shard (oracle engine or TPU-batched engine), merges shard variant DBs in
shard order, and renders the VCF.
"""

from __future__ import annotations

import time

from . import __version__
from .config import Config
from .engine.micro import Microassembler
from .engine.vardb import VariantDB
from .io import open_bam, open_fasta
from .windows import generate_windows, shard_windows

LANCET_VERSION = "1.1.0, October 18 2019"  # reference version string emulated


def _run_shard(cfg, tumor_path, normal_path, shard, engine):
    """Process-pool worker: open its own readers (share-nothing) and
    return the shard's VariantDB. Workers pin JAX to CPU so only the
    parent (or the real runtime) owns the TPU; device batching across
    processes belongs to the mesh path (lancet_tpu.parallel)."""
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    tumor = open_bam(tumor_path)
    normal = open_bam(normal_path)
    ma = Microassembler(cfg, readers=(tumor, normal), engine=engine)
    ma.process_windows(shard)
    return ma.vdb


def run(cfg: Config, command_line: str = "lancet-tpu", date: str | None = None,
        engine: str = "oracle", processes: bool = False) -> str:
    """Run the caller; returns the VCF text. `processes=True` fans shards
    out to a process pool (host parallelism; device work still batches
    per shard)."""
    fasta = open_fasta(cfg.ref_fasta)
    tumor = open_bam(cfg.tumor_bam)
    normal = open_bam(cfg.normal_bam)

    # MD-tag availability check disables active regions like the reference
    # (Lancet.cc:817-825): probe the first record of each BAM.
    cfg_eff = cfg
    if cfg.active_regions:
        def first_has_md(rdr):
            al = rdr.first_record()
            return True if al is None else "MD" in al.tags
        if not (first_has_md(tumor) or first_has_md(normal)):
            import dataclasses
            cfg_eff = dataclasses.replace(cfg, active_regions=False)

    regions = []
    if cfg.bed_file:
        with open(cfg.bed_file) as f:
            for line in f:
                if line.startswith("#"):
                    continue
                toks = line.rstrip("\n").split("\t")
                if len(toks) < 3:
                    continue
                sp = int(toks[1]) - cfg.padding
                if sp < 1:
                    sp = 1
                ep = int(toks[2]) + cfg.padding
                # NOTE: loadRefs pads again -> BED rows get 2x padding,
                # replicating the reference (Lancet.cc:345-352)
                regions.append(f"{toks[0]}:{sp}-{ep}")
    if cfg.region:
        regions.append(cfg.region)

    windows = generate_windows(fasta, regions, fasta.lengths,
                               cfg.window_size, cfg.padding)
    shards = shard_windows(windows, cfg.num_threads)

    merged = VariantDB(cfg.lr_mode)
    if cfg.num_threads > 1 and processes:
        # share-nothing shard workers (reference pthread model,
        # Lancet.cc:844-928); shard DBs merged in shard order so the
        # result is process-count invariant
        import concurrent.futures as cf
        import multiprocessing as mp

        ctx = mp.get_context("spawn")  # never fork an initialized TPU client
        with cf.ProcessPoolExecutor(max_workers=min(cfg.num_threads, 8),
                                    mp_context=ctx) as ex:
            futs = [ex.submit(_run_shard, cfg_eff, cfg.tumor_bam,
                              cfg.normal_bam, shard, engine)
                    for shard in shards]
            for fut in futs:
                merged.merge_from(fut.result())
    else:
        for shard in shards:
            ma = Microassembler(cfg_eff, readers=(tumor, normal), engine=engine)
            ma.process_windows(shard)
            merged.merge_from(ma.vdb)

    if date is None:
        date = time.asctime() + "\n"
    sample_t = tumor.sample_name()
    sample_n = normal.sample_name()
    return merged.to_vcf(LANCET_VERSION, cfg.ref_fasta, date, cfg.filters,
                         sample_n, sample_t, command_line)
