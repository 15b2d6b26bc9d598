"""Driver for the sanitizer pass: exercises every native C++ entry point
(BGZF/BAM/BAI reader, faidx FASTA, sequence scans, lgb_build DBG kernel,
lgp_run per-k pipeline) WITHOUT touching JAX — XLA's compiler aborts
under an LD_PRELOADed ASan runtime through no fault of ours, so the
device stage is deliberately left undispatched (path jobs are collected
but never aligned). Run by test_native_asan.py in a subprocess with
LD_PRELOAD=libasan and LANCET_TPU_NATIVE_SO pointing at the ASan build.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))


def main() -> int:
    from goldengen import fuzz_corpus, scenario
    from helpers import write_pair

    from lancet_tpu.config import Config
    from lancet_tpu.engine.micro import Microassembler
    from lancet_tpu.io import open_bam, open_fasta
    from lancet_tpu.io.bam import BamReader as PyBam
    from lancet_tpu.io.fasta import FastaFile as PyFasta
    from lancet_tpu.native import NativeBamReader, NativeFastaFile
    from lancet_tpu.runner import run
    from lancet_tpu.windows import generate_windows

    assert os.environ.get("LANCET_TPU_NATIVE_SO"), "ASan .so not wired in"

    with tempfile.TemporaryDirectory() as td:
        refseq, tumor, normal, region = fuzz_corpus(3, n_events=6)
        ref_path, t_path, n_path = write_pair(td, refseq, "chr1",
                                              tumor, normal)

        # 1) native vs python reader equivalence (headers, jumps, scans)
        nb, pb = NativeBamReader(t_path), PyBam(t_path)
        assert nb.header_text.rstrip("\0") == pb.header_text.rstrip("\0")
        for lo, hi in [(600, 1800), (3000, 4200), (0, len(refseq))]:
            na = [(a.name, a.pos, a.cigar, a.seq) for a in
                  nb.fetch("chr1", lo, hi)]
            pa = [(a.name, a.pos, a.cigar, a.seq) for a in
                  pb.fetch("chr1", lo, hi)]
            assert na == pa, f"reader mismatch at {lo}-{hi}"
        nf, pf = NativeFastaFile(ref_path), PyFasta(ref_path)
        for lo, hi in [(1, 600), (2500, 3100), (len(refseq) - 99,
                                                len(refseq))]:
            assert nf.fetch("chr1", lo, hi) == pf.fetch("chr1", lo, hi)

        # 2) full oracle pipeline end-to-end over the native I/O plane
        cfg = Config(tumor_bam=t_path, normal_bam=n_path,
                     ref_fasta=ref_path, region=region)
        vcf = run(cfg, command_line="asan", date="D\n", engine="oracle")
        nrec = sum(1 for l in vcf.splitlines() if not l.startswith("#"))
        assert nrec > 0, "oracle run produced no records"

        # 3) lgb_build / lgp_run native kernels, device stage undispatched
        from lancet_tpu.engine.fastpipe import available
        assert available(), "native pipeline kernel failed to load"
        fa = open_fasta(ref_path)
        windows = generate_windows(fa, [region], fa.lengths,
                                   cfg.window_size, cfg.padding)
        ma = Microassembler(cfg, readers=(open_bam(t_path),
                                          open_bam(n_path)), engine="tpu")
        for w in windows:
            ma.process_window(w)
        assert ma.path_jobs, "native pipeline produced no path jobs"
        print(f"asan driver ok: records={nrec} windows={len(windows)} "
              f"jobs={len(ma.path_jobs)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
