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
    very_verbose: bool = False
    print_graph: bool = False
    print_config_file: bool = False

    # read-group allowlist file (one RG per line; ref: Microassembler.cc:29-48)
    rg_file: str = ""

    # observability / recovery (new-framework subsystems; SURVEY.md §5)
    trace_file: str = ""   # per-window wall-time JSONL (W_ELAPSED_TIME equiv)
    resume_dir: str = ""   # per-shard completed-window + variant logs

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


def _bvalue(b: bool) -> str:
    return "true" if b else "false"


def print_configuration(cfg: Config) -> str:
    """Render the run configuration in the reference's config.txt layout
    (ref: src/Lancet.cc:118-185 printConfiguration)."""
    fs = cfg.filters
    g = "%g"
    lines = [
        f"tumor-BAM: {cfg.tumor_bam}",
        f"normal-BAM: {cfg.normal_bam}",
        f"reference: {cfg.ref_fasta}",
        f"region: {cfg.region}",
        f"BED-file: {cfg.bed_file}",
        f"min-K: {cfg.min_k}",
        f"max-K: {cfg.max_k}",
        f"tip-len: {cfg.max_tip_len}",
        f"cov-thr: {cfg.cov_threshold}",
        f"cov-ratio: {g % cfg.min_cov_ratio}",
        f"low-cov: {cfg.low_cov_threshold}",
        f"window-size: {cfg.window_size}",
        f"padding: {cfg.padding}",
        f"max-avg-cov: {cfg.max_avg_cov}",
        f"min-map-qual: {cfg.min_map_qual}",
        f"max-as-xs-diff: {cfg.max_delta_as_xs}",
        f"min-base-qual: {cfg.min_qv_call}",
        f"trim-lowqual: {cfg.min_qv_trim}",
        f"quality-range: {chr(cfg.qv_range)}",
        f"node-str-len: {cfg.node_strlen}",
        f"dfs-limit: {cfg.dfs_limit}",
        f"max-indel-len: {cfg.max_indel_len}",
        f"max-mismatch: {cfg.max_mismatch}",
        f"num-threads: {cfg.num_threads}",
        f"max-unit-length: {cfg.max_unit_len}",
        f"min-report-unit: {cfg.min_report_units}",
        f"min-report-len: {cfg.min_report_len}",
        f"dist-from-str: {cfg.dist_from_str}",
        f"min-phred-fisher: {g % fs.min_phred_fisher}",
        f"min-phred-fisher-str: {g % fs.min_phred_fisher_str}",
        f"min-strand-bias: {fs.min_strand_bias}",
        f"min-alt-count-tumor: {fs.min_alt_cnt_tumor}",
        f"max-alt-count-normal: {fs.max_alt_cnt_normal}",
        f"min-vaf-tumor: {g % fs.min_vaf_tumor}",
        f"max-vaf-normal: {g % fs.max_vaf_normal}",
        f"min-coverage-tumor: {fs.min_cov_tumor}",
        f"max-coverage-tumor: {fs.max_cov_tumor}",
        f"min-coverage-normal: {fs.min_cov_normal}",
        f"max-coverage-normal: {fs.max_cov_normal}",
        f"linked-reads: {_bvalue(cfg.lr_mode)}",
        f"primary-alignment-only: {_bvalue(cfg.primary_alignment_only)}",
        f"XA-tag-filter: {_bvalue(cfg.xa_filter)}",
        f"active-regions: {_bvalue(cfg.active_regions)}",
        f"kmer-recovery: {_bvalue(cfg.kmer_recovery)}",
        f"print-graphs: {_bvalue(cfg.print_graph)}",
        f"print-config-file: {_bvalue(cfg.print_config_file)}",
        f"verbose: {_bvalue(cfg.verbose)}",
        f"more-verbose: {_bvalue(cfg.very_verbose)}",
    ]
    return "\n".join(lines) + "\n\n"
