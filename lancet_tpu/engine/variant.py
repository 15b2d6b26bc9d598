"""Variant record, scores, filters, and VCF line rendering
(ref: src/Variant.{hh,cc})."""

from __future__ import annotations

import math

from ..cpp import ostream_float
from .fet import fet_phred, fet_phred_nocap


class Variant:
    __slots__ = (
        "lr_mode", "kmer", "chrom", "pos", "type", "len", "ref", "alt", "str_tag",
        "ref_cov_normal_fwd", "ref_cov_normal_rev", "ref_cov_tumor_fwd",
        "ref_cov_tumor_rev", "alt_cov_normal_fwd", "alt_cov_normal_rev",
        "alt_cov_tumor_fwd", "alt_cov_tumor_rev", "hprn", "hprt", "hpan", "hpat",
        "bx_ref_n", "bx_ref_t", "bx_alt_n", "bx_alt_t", "prev_bp_ref", "prev_bp_alt",
    )

    def __init__(self, lr_mode, chrom, pos, ref_str, alt_str, rcn, rct, acn, act,
                 hprn, hprt, hpan, hpat, prev_bp_ref, prev_bp_alt, kmer, str_tag,
                 code, bx_ref_n="", bx_ref_t="", bx_alt_n="", bx_alt_t=""):
        self.lr_mode = lr_mode
        self.kmer = kmer
        self.str_tag = str_tag
        self.chrom = chrom
        self.pos = pos
        ref_ = ref_str
        alt_ = alt_str
        # type/anchoring (ref: Variant.hh:133-153); note both REF and ALT get
        # prev_bp_alt prepended for indels (reference quirk)
        self.type = "?"
        self.len = 0
        if code == "^":
            self.type = "I"
            ref_ = ""
            self.len = len(alt_)
        if code == "v":
            self.type = "D"
            alt_ = ""
            self.len = len(ref_)
        if code == "x":
            self.type = "S"
            self.pos += 1
        if code == "c":
            self.type = "C"
            ref_ = ref_.replace("-", "")
            alt_ = alt_.replace("-", "")
            rl, al = len(ref_), len(alt_)
            self.len = al if rl == al else abs(rl - al)
        if self.type != "S":
            self.ref = prev_bp_alt + ref_
            self.alt = prev_bp_alt + alt_
        else:
            self.ref = ref_
            self.alt = alt_
            self.len = 1
        self.ref_cov_normal_fwd = int(rcn[0])
        self.ref_cov_normal_rev = int(rcn[1])
        self.ref_cov_tumor_fwd = int(rct[0])
        self.ref_cov_tumor_rev = int(rct[1])
        self.alt_cov_normal_fwd = int(acn[0])
        self.alt_cov_normal_rev = int(acn[1])
        self.alt_cov_tumor_fwd = int(act[0])
        self.alt_cov_tumor_rev = int(act[1])
        self.hprn = tuple(int(x) for x in hprn)
        self.hprt = tuple(int(x) for x in hprt)
        self.hpan = tuple(int(x) for x in hpan)
        self.hpat = tuple(int(x) for x in hpat)
        self.prev_bp_ref = prev_bp_ref
        self.prev_bp_alt = prev_bp_alt
        self.bx_ref_n = bx_ref_n
        self.bx_ref_t = bx_ref_t
        self.bx_alt_n = bx_alt_n
        self.bx_alt_t = bx_alt_t

    # ------------------------------------------------------------------
    def signature(self) -> str:
        """Dedup key (ref: Variant.cc:342-347)."""
        return f"{self.chrom}:{self.pos}:{self.type}:{self.len}:{self.ref}:{self.alt}"

    def tot_cov(self) -> int:
        return (self.ref_cov_normal_fwd + self.ref_cov_normal_rev
                + self.ref_cov_tumor_fwd + self.ref_cov_tumor_rev
                + self.alt_cov_normal_fwd + self.alt_cov_normal_rev
                + self.alt_cov_tumor_fwd + self.alt_cov_tumor_rev)

    @staticmethod
    def _genotype(r: int, a: int) -> str:
        if r > 0 and a > 0:
            return "0/1"
        if r > 0 and a == 0:
            return "0/0"
        if r == 0 and a > 0:
            return "1/1"
        return "."

    @staticmethod
    def _best_state(rn, an, rt, at) -> str:
        if an > 0 and at > 0:
            return "S"
        if an == 0 and at > 0:
            return "T"
        if an > 0 and at == 0:
            return "N"
        return "E"

    def print_vcf(self, fs) -> str:
        """Render one VCF line, or "" for unsupported variants
        (ref: Variant.cc:39-223)."""
        trct = self.ref_cov_tumor_fwd + self.ref_cov_tumor_rev
        tact = self.alt_cov_tumor_fwd + self.alt_cov_tumor_rev
        trcn = self.ref_cov_normal_fwd + self.ref_cov_normal_rev
        tacn = self.alt_cov_normal_fwd + self.alt_cov_normal_rev

        fet_score = fet_phred(trcn, trct, tacn, tact)
        sb_score = fet_phred_nocap(self.ref_cov_tumor_fwd, self.ref_cov_tumor_rev,
                                   self.alt_cov_tumor_fwd, self.alt_cov_tumor_rev)
        hps = hpsn = hpst = 0.0
        if self.lr_mode:
            hpsn = fet_phred_nocap(self.hprn[0], self.hprn[1], self.hpan[0], self.hpan[1])
            hpst = fet_phred_nocap(self.hprt[0], self.hprt[1], self.hpat[0], self.hpat[1])
            hps = fet_phred_nocap(self.hprn[0] + self.hpan[0], self.hprn[1] + self.hpan[1],
                                  self.hprt[0] + self.hpat[0], self.hprt[1] + self.hpat[1])

        flag = self._best_state(trcn, tacn, trct, tact)
        if flag == "E":
            return ""
        status = {"T": "SOMATIC", "S": "SHARED", "L": "LOH", "N": "NORMAL"}.get(flag, "?")

        info = [status, "FETS=" + ostream_float(fet_score)]
        if self.type == "I":
            info.append("TYPE=ins")
        if self.type == "D":
            info.append("TYPE=del")
        if self.type == "S":
            info.append("TYPE=snv")
        if self.type == "C":
            info.append("TYPE=complex")
        info.append("LEN=" + str(self.len))
        info.append("KMERSIZE=" + str(self.kmer))
        info.append("SB=" + ostream_float(sb_score))
        if self.lr_mode:
            info.append("HPS=" + ostream_float(hps))
            info.append("HPSN=" + ostream_float(hpsn))
            info.append("HPST=" + ostream_float(hpst))
        if self.str_tag:
            info.append("MS=" + self.str_tag)

        qual = fet_score
        tumor_cov = trct + tact
        tumor_vaf = 0.0 if tumor_cov == 0 else tact / tumor_cov
        normal_cov = trcn + tacn
        normal_vaf = 0.0 if normal_cov == 0 else tacn / normal_cov

        filters: list[str] = []
        if self.str_tag:
            if fet_score < fs.min_phred_fisher_str:
                filters.append("LowFisherSTR")
        elif fet_score < fs.min_phred_fisher:
            filters.append("LowFisherScore")
        if normal_cov < fs.min_cov_normal:
            filters.append("LowCovNormal")
        if normal_cov > fs.max_cov_normal:
            filters.append("HighCovNormal")
        if tumor_cov < fs.min_cov_tumor:
            filters.append("LowCovTumor")
        if tumor_cov > fs.max_cov_tumor:
            filters.append("HighCovTumor")
        if tumor_vaf < fs.min_vaf_tumor:
            filters.append("LowVafTumor")
        if normal_vaf > fs.max_vaf_normal:
            filters.append("HighVafNormal")
        if tact < fs.min_alt_cnt_tumor:
            filters.append("LowAltCntTumor")
        if tacn > fs.max_alt_cnt_normal:
            filters.append("HighAltCntNormal")
        if (self.alt_cov_tumor_fwd < fs.min_strand_bias
                or self.alt_cov_tumor_rev < fs.min_strand_bias):
            filters.append("StrandBias")
        if self.lr_mode and flag == "T" and self.hpat[0] > 0 and self.hpat[1] > 0:
            filters.append("MultiHP")
        filt = ";".join(filters) if filters else "PASS"

        gt_normal = self._genotype(trcn, tacn)
        gt_tumor = self._genotype(trct, tact)

        fmt = "GT:AD:SR:SA:DP"
        normal = (f"{gt_normal}:{trcn},{tacn}:{self.ref_cov_normal_fwd},"
                  f"{self.ref_cov_normal_rev}:{self.alt_cov_normal_fwd},"
                  f"{self.alt_cov_normal_rev}:{trcn + tacn}")
        tumor = (f"{gt_tumor}:{trct},{tact}:{self.ref_cov_tumor_fwd},"
                 f"{self.ref_cov_tumor_rev}:{self.alt_cov_tumor_fwd},"
                 f"{self.alt_cov_tumor_rev}:{trct + tact}")
        if self.lr_mode:
            fmt += ":HPR:HPA:BX"
            normal += (f":{self.hprn[0]},{self.hprn[1]},{self.hprn[2]}"
                       f":{self.hpan[0]},{self.hpan[1]},{self.hpan[2]}"
                       f":{self.bx_ref_n},{self.bx_alt_n}")
            tumor += (f":{self.hprt[0]},{self.hprt[1]},{self.hprt[2]}"
                      f":{self.hpat[0]},{self.hpat[1]},{self.hpat[2]}"
                      f":{self.bx_ref_t},{self.bx_alt_t}")

        return (f"{self.chrom}\t{self.pos}\t.\t{self.ref}\t{self.alt}\t"
                f"{ostream_float(qual)}\t{filt}\t{';'.join(info)}\t{fmt}\t"
                f"{normal}\t{tumor}\n")
