"""Host-side I/O plane: FASTA/fai, BGZF/BAM/BAI, VCF.

Own implementations of the formats (no htslib/bamtools code); the reference
uses htslib faidx for windowed FASTA access and bamtools for BAM region
iteration (SURVEY.md §2.2).
"""
