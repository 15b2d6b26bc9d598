"""Run configuration.

Mirrors the reference's ~50 CLI flags and defaults (ref: src/Lancet.hh:33-85,
filter defaults src/Lancet.cc:627-638) as one immutable dataclass threaded
through the pipeline (instead of the reference's file-scope globals copied
field-by-field into each worker, src/Lancet.cc:868-904).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class Filters:
    """Variant filter thresholds (ref: src/Variant.hh:42-56; defaults Lancet.cc:627-638)."""

    min_phred_fisher_str: float = 25.0
    min_phred_fisher: float = 5.0
    max_vaf_normal: float = 0.0
    min_vaf_tumor: float = 0.04
    min_cov_normal: int = 10
    max_cov_normal: int = 1000000
    min_cov_tumor: int = 4
    max_cov_tumor: int = 1000000
    min_alt_cnt_tumor: int = 3
    max_alt_cnt_normal: int = 0
    min_strand_bias: int = 1


@dataclasses.dataclass(frozen=True)
class Config:
    """Full run configuration (ref: src/Lancet.hh:33-85)."""

    # required inputs
    tumor_bam: str = ""
    normal_bam: str = ""
    ref_fasta: str = ""
    region: str = ""
    bed_file: str = ""

    # k-mer / assembly
    min_k: int = 11
    max_k: int = 101
    max_tip_len: int = 11  # MAX_TIP_LEN tracks minK default (Lancet.hh:64)
    cov_threshold: int = 5  # COV_THRESHOLD: source/sink anchor min coverage
    min_cov_ratio: float = 0.01
    low_cov_threshold: int = 1
    max_avg_cov: int = 10000
    dfs_limit: int = 1000000
    max_indel_len: int = 500
    max_mismatch: int = 2  # near-perfect repeat mismatch budget

    # windows
    window_size: int = 600
    padding: int = 250

    # base/read quality
    min_qv_trim: int = 10
    min_qv_call: int = 17
    qv_range: int = ord("!")  # 33
    min_map_qual: int = 15
    max_delta_as_xs: int = 5

    # STR parameters
    max_unit_len: int = 4
    min_report_units: int = 3
    min_report_len: int = 7
    dist_from_str: int = 1

    # modes / flags
    lr_mode: bool = False
    xa_filter: bool = False
    primary_alignment_only: bool = False
    active_regions: bool = True
    kmer_recovery: bool = False
    verbose: bool = False
    print_graph: bool = False

    # parallelism
    num_threads: int = 1  # reference-thread emulation for window->shard assignment

    # filters
    filters: Filters = dataclasses.field(default_factory=Filters)

    # misc (node rendering length for DOT output)
    node_strlen: int = 100

    @property
    def min_qual_trim(self) -> int:
        """Phred+offset trim threshold (ref: Lancet.cc:793)."""
        return self.min_qv_trim + self.qv_range

    @property
    def min_qual_call(self) -> int:
        """Phred+offset SNV-call quality threshold (ref: Lancet.cc:794)."""
        return self.min_qv_call + self.qv_range

    def max_link_len(self, k: int) -> int:
        """Short-link max length: floor(K/2) mers (ref: Graph.hh:143)."""
        return int(k // 2)
