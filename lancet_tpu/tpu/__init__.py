"""TPU engine: batched JAX/XLA/Pallas kernels for the hot loops
(SURVEY.md §3 ranking): affine-gap alignment, repeat scans, FET scoring,
k-mer graph construction. Each kernel is validated bit-exact against the
oracle engine in lancet_tpu.engine.
"""
