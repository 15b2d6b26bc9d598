#!/usr/bin/env python
"""Benchmark: assembled windows/s on the current device vs 8-thread
reference CPU lancet on the identical corpus.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
vs_baseline is our windows/s divided by the reference binary's windows/s
measured in the SAME run (8 threads, this host). If the binary is missing
it is built from /root/reference (verify-skill recipe); if that fails the
last recorded anchor is used and the JSON is marked "anchor": "stale" —
a stale-anchor speedup is not a result, only a fallback so the driver
still gets a number.

Extra keys: anchor_wps, concordance {matched, ref_total, ours_total},
breakdown (per-stage seconds from the runner), pallas_parity (device
Pallas kernel vs the scan fill on sample alignments; null off-TPU).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))

CORPUS_DIR = "/tmp/lancet_tpu_bench_corpus_v2"
REF_BIN = os.environ.get("LANCET_REF_BIN", "/tmp/refbuild/src/lancet")
ANCHOR_FILE = os.path.join(CORPUS_DIR, "anchor_wps.txt")

CHROM_LEN = 520_000
EVENT_SPACING = 2000
READ_LEN = 100
STEP = 5  # ~40x coverage, continuous over the chromosome


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
    half = EVENT_SPACING // 2
    for c in range(half, CHROM_LEN - half, EVENT_SPACING):
        kind = rng.choice(["s", "s", "i", "d"])
        if kind == "s":
            edit = ("s", c, other[refseq[c]])
        elif kind == "i":
            edit = ("i", c, "".join(rng.choice("ACGT") for _ in range(rng.randint(1, 6))))
        else:
            edit = ("d", c, rng.randint(1, 6))
        # contiguous segments -> continuous ~40x coverage chromosome-wide
        lo, hi = c - half, c + half
        tumor += hap_reads(refseq, edit, lo, hi, READ_LEN, STEP, f"t{idx}_",
                           0.5, 1000 + idx)
        normal += hap_reads(refseq, None, lo, hi, READ_LEN, STEP, f"n{idx}_",
                            0, 2000 + idx)
        idx += 1
    write_pair(CORPUS_DIR, refseq, "chr1", tumor, normal)
    with open(marker, "w") as f:
        f.write("ok")


def ensure_ref_binary() -> bool:
    """Build the reference lancet out-of-repo if missing (recipe from the
    verify skill). Returns True when REF_BIN exists afterwards."""
    if os.path.exists(REF_BIN):
        return True
    build_root = os.path.dirname(os.path.dirname(REF_BIN))  # /tmp/refbuild
    if os.path.basename(build_root) != "refbuild":
        return False
    src = "/root/reference"
    if not os.path.isdir(src):
        return False
    try:
        print("# building reference binary (one-time)...", file=sys.stderr)
        if not os.path.isdir(build_root):
            subprocess.run(["cp", "-r", src, build_root], check=True)
        bt = os.path.join(build_root, "bamtools-2.5.2")
        os.makedirs(os.path.join(bt, "build"), exist_ok=True)
        subprocess.run(["cmake", "-DCMAKE_INSTALL_PREFIX=../", ".."],
                       cwd=os.path.join(bt, "build"), check=True,
                       capture_output=True)
        subprocess.run(["make", "-j2"], cwd=os.path.join(bt, "build"),
                       check=True, capture_output=True)
        subprocess.run(["make", "install"], cwd=os.path.join(bt, "build"),
                       check=True, capture_output=True)
        hts = os.path.join(build_root, "htslib-1.15.1")
        subprocess.run(["./configure", "--disable-bz2", "--disable-lzma",
                        "--disable-libcurl", "--disable-gcs", "--disable-s3",
                        "--without-libdeflate"], cwd=hts, check=True,
                       capture_output=True)
        subprocess.run(["make", "-j2"], cwd=hts, check=True,
                       capture_output=True)
        sdir = os.path.join(build_root, "src")
        subprocess.run(["sed", "-i",
                        "s/-llzma -lbz2 -lz -ldl -lpthread -lcurl -lcrypto "
                        "-lbamtools/-lz -ldl -lpthread -lbamtools/",
                        "Makefile"], cwd=sdir, check=True)
        subprocess.run(["make"], cwd=sdir, check=True, capture_output=True)
    except subprocess.CalledProcessError as e:
        print(f"# reference build failed: {e}", file=sys.stderr)
    return os.path.exists(REF_BIN)


def count_windows(region: str) -> int:
    from lancet_tpu.io.fasta import FastaFile
    from lancet_tpu.windows import generate_windows

    fa = FastaFile(os.path.join(CORPUS_DIR, "ref.fa"))
    return len(generate_windows(fa, [region], fa.lengths, 600, 250))


def run_ours(region: str, stats: dict | None = None) -> tuple[float, str]:
    from lancet_tpu.config import Config
    from lancet_tpu.runner import run

    cfg = Config(tumor_bam=os.path.join(CORPUS_DIR, "tumor.bam"),
                 normal_bam=os.path.join(CORPUS_DIR, "normal.bam"),
                 ref_fasta=os.path.join(CORPUS_DIR, "ref.fa"),
                 region=region, num_threads=8)
    t0 = time.time()
    vcf = run(cfg, command_line="bench", date="D\n", engine="tpu",
              processes=True, stats=stats)
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
        capture_output=True, text=True, timeout=7200)
    if r.returncode != 0:
        return None
    return time.time() - t0, r.stdout


def pallas_parity_check() -> bool | None:
    """On TPU: assert the compiled Pallas fill and the lax.scan fill agree
    on sample window-scale alignments (closes the CI hole where tests only
    exercise the scan fill)."""
    import jax

    if jax.default_backend() != "tpu":
        return None
    import random

    from lancet_tpu.tpu.align_batch import batch_align

    rng = random.Random(7)
    bases = "ACGT"
    pairs = []
    for _ in range(16):
        n = rng.randint(400, 1100)
        s = "".join(rng.choice(bases) for _ in range(n))
        t = list(s)
        for _ in range(rng.randint(1, 8)):  # SNVs
            p = rng.randrange(len(t))
            t[p] = rng.choice(bases)
        p = rng.randrange(len(t) - 10)  # one indel
        if rng.random() < 0.5:
            t[p:p] = [rng.choice(bases) for _ in range(rng.randint(1, 6))]
        else:
            del t[p : p + rng.randint(1, 6)]
        pairs.append((s, "".join(t)))
    os.environ["LANCET_TPU_PALLAS"] = "1"
    try:
        got_pallas = batch_align(pairs)
    finally:
        os.environ["LANCET_TPU_PALLAS"] = "0"
    got_scan = batch_align(pairs)
    del os.environ["LANCET_TPU_PALLAS"]
    return got_pallas == got_scan


def main():
    build_corpus()
    region = f"chr1:300-{CHROM_LEN - 300}"
    nwin = count_windows(region)

    # Warmup (untimed): XLA compiles (persistent-cached) and first
    # device<->host transfer; warm on a slice covering every shape bucket.
    # Its summary lines are suppressed so the driver tail holds only the
    # timed run's counters.
    import contextlib
    import io

    with contextlib.redirect_stderr(io.StringIO()):
        run_ours("chr1:300-30000")

    # two timed passes: pass 1 may still pay first-touch costs (page
    # cache, any shape bucket the warmup slice missed); pass 2 is the
    # steady state a long-running service sees. Both are reported; the
    # headline value is pass 2 (identical VCFs asserted).
    stats1: dict = {}
    elapsed1, vcf1 = run_ours(region, stats1)
    stats: dict = {}
    elapsed, vcf = run_ours(region, stats)
    assert vcf == vcf1, "non-deterministic VCF between timed passes"
    wps = nwin / elapsed
    wps_cold = nwin / elapsed1

    have_ref = ensure_ref_binary()
    ref = run_reference(region) if have_ref else None
    concordance = None
    anchor_state = "live"
    if ref is not None:
        ref_elapsed, ref_vcf = ref
        anchor = nwin / ref_elapsed
        with open(ANCHOR_FILE, "w") as f:
            f.write(str(anchor))
        ours_recs = sorted(l for l in vcf.splitlines() if not l.startswith("#"))
        ref_recs = sorted(l for l in ref_vcf.splitlines() if not l.startswith("#"))
        same = sum(1 for r in ref_recs if r in ours_recs)
        concordance = {"matched": same, "ref_total": len(ref_recs),
                       "ours_total": len(ours_recs)}
    elif os.path.exists(ANCHOR_FILE):
        anchor = float(open(ANCHOR_FILE).read())
        anchor_state = "stale"
    else:
        anchor = None
        anchor_state = "unavailable"

    parity = pallas_parity_check()

    breakdown = {k: round(v, 3) for k, v in stats.items()
                 if isinstance(v, float)}
    breakdown.update({k: v for k, v in stats.items() if isinstance(v, int)})

    print(f"# windows={nwin} elapsed={elapsed:.2f}s "
          f"anchor_wps={anchor} ({anchor_state}) concordance={concordance} "
          f"breakdown={breakdown} pallas_parity={parity}",
          file=sys.stderr)
    print(json.dumps({
        "metric": "windows_per_second_per_chip",
        "value": round(wps, 3),
        "unit": "windows/s",
        "vs_baseline": round(wps / anchor, 4) if anchor else None,
        "anchor": anchor_state,
        "anchor_wps": round(anchor, 3) if anchor else None,
        "first_pass_wps": round(wps_cold, 3),
        "concordance": concordance,
        "breakdown": breakdown,
        "pallas_parity": parity,
    }))


if __name__ == "__main__":
    main()
