"""Multi-chip scaling: window-axis data parallelism over a 1-D device
mesh with XLA collectives for counter reduction and variant-record
gather (SURVEY.md §2.3 mapping)."""
