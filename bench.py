#!/usr/bin/env python
"""Benchmark: assembled windows/s on the current device vs 8-thread
reference CPU lancet on the identical corpus.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is our windows/s divided by the reference binary's measured
windows/s (8 threads) on this host; if the binary is unavailable, the
last recorded anchor (ANCHOR_WPS) is used.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))

CORPUS_DIR = "/tmp/lancet_tpu_bench_corpus"
REF_BIN = os.environ.get("LANCET_REF_BIN", "/tmp/refbuild/src/lancet")
# anchor: reference lancet, 8 threads, measured on this host's corpus
# (updated whenever the binary is present at bench time)
ANCHOR_FILE = os.path.join(CORPUS_DIR, "anchor_wps.txt")

CHROM_LEN = 24000
EVENT_SPACING = 2000
READ_LEN = 100
STEP = 5  # ~40x coverage


def build_corpus():
    import random

    from helpers import make_reference, write_pair
    from goldengen import hap_reads

    os.makedirs(CORPUS_DIR, exist_ok=True)
    marker = os.path.join(CORPUS_DIR, "ok")
    if os.path.exists(marker):
        return
    rng = random.Random(2024)
    refseq = make_reference(CHROM_LEN, seed=99)
    tumor = []
    normal = []
    other = {"A": "C", "C": "G", "G": "T", "T": "A"}
    idx = 0
    for c in range(1000, CHROM_LEN - 1000, EVENT_SPACING):
        kind = rng.choice(["s", "s", "i", "d"])
        if kind == "s":
            edit = ("s", c, other[refseq[c]])
        elif kind == "i":
            edit = ("i", c, "".join(rng.choice("ACGT") for _ in range(rng.randint(1, 6))))
        else:
            edit = ("d", c, rng.randint(1, 6))
        lo, hi = c - 400, c + 400
        tumor += hap_reads(refseq, edit, lo, hi, READ_LEN, STEP, f"t{idx}_",
                           0.5, 1000 + idx)
        normal += hap_reads(refseq, None, lo, hi, READ_LEN, STEP, f"n{idx}_",
                            0, 2000 + idx)
        idx += 1
    write_pair(CORPUS_DIR, refseq, "chr1", tumor, normal)
    with open(marker, "w") as f:
        f.write("ok")


def count_windows(region: str) -> int:
    from lancet_tpu.io.fasta import FastaFile
    from lancet_tpu.windows import generate_windows

    fa = FastaFile(os.path.join(CORPUS_DIR, "ref.fa"))
    return len(generate_windows(fa, [region], fa.lengths, 600, 250))


def run_ours(region: str) -> tuple[float, str]:
    from lancet_tpu.config import Config
    from lancet_tpu.runner import run

    cfg = Config(tumor_bam=os.path.join(CORPUS_DIR, "tumor.bam"),
                 normal_bam=os.path.join(CORPUS_DIR, "normal.bam"),
                 ref_fasta=os.path.join(CORPUS_DIR, "ref.fa"),
                 region=region, num_threads=8)
    # same host parallelism as the 8-thread reference anchor: 8 host
    # workers do the share-nothing graph stage, the parent owns the TPU
    # (repeat gates up front, batched Gotoh at the end)
    t0 = time.time()
    vcf = run(cfg, command_line="bench", date="D\n", engine="tpu",
              processes=True)
    return time.time() - t0, vcf


def run_reference(region: str) -> tuple[float, str] | None:
    if not os.path.exists(REF_BIN):
        return None
    t0 = time.time()
    r = subprocess.run(
        [REF_BIN, "--tumor", os.path.join(CORPUS_DIR, "tumor.bam"),
         "--normal", os.path.join(CORPUS_DIR, "normal.bam"),
         "--ref", os.path.join(CORPUS_DIR, "ref.fa"),
         "--reg", region, "--num-threads", "8"],
        capture_output=True, text=True, timeout=3600)
    if r.returncode != 0:
        return None
    return time.time() - t0, r.stdout


def main():
    build_corpus()
    region = f"chr1:300-{CHROM_LEN - 300}"
    nwin = count_windows(region)

    # Warmup (untimed): pays one-time costs outside the measurement —
    # XLA compiles (persistent-cached) and the axon tunnel's first
    # device->host transfer, which can stall for minutes on this setup.
    # Warm on the full region so every shape bucket is compile-cached.
    run_ours(region)

    elapsed, vcf = run_ours(region)
    wps = nwin / elapsed

    ref = run_reference(region)
    concordance = None
    if ref is not None:
        ref_elapsed, ref_vcf = ref
        anchor = nwin / ref_elapsed
        with open(ANCHOR_FILE, "w") as f:
            f.write(str(anchor))
        ours_recs = sorted(l for l in vcf.splitlines() if not l.startswith("#"))
        ref_recs = sorted(l for l in ref_vcf.splitlines() if not l.startswith("#"))
        same = sum(1 for r in ref_recs if r in ours_recs)
        concordance = f"{same}/{len(ref_recs)} ref records matched, ours {len(ours_recs)}"
    elif os.path.exists(ANCHOR_FILE):
        anchor = float(open(ANCHOR_FILE).read())
    else:
        anchor = 135.0  # recorded 8-thread anchor from round-1 measurement

    print(f"# windows={nwin} elapsed={elapsed:.2f}s "
          f"anchor_wps={anchor:.2f} concordance={concordance}",
          file=sys.stderr)
    print(json.dumps({
        "metric": "windows_per_second_per_chip",
        "value": round(wps, 3),
        "unit": "windows/s",
        "vs_baseline": round(wps / anchor, 4),
    }))


if __name__ == "__main__":
    main()
