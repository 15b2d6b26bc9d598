"""TPU engine: batched JAX/XLA/Pallas kernels for the hot loops
(SURVEY.md §3 ranking): affine-gap alignment, repeat scans, FET scoring,
k-mer graph construction. Each kernel is validated bit-exact against the
oracle engine in lancet_tpu.engine.

The persistent XLA compilation cache is NOT enabled here: import-time
config would force a backend choice, and XLA:CPU AOT executable
serialization reproducibly aborts on hosts whose CPU features differ
from the AOT target (put_executable_and_time). The cache is enabled
lazily — TPU backends only — by
lancet_tpu.engine.devicepipe._enable_compile_cache (called from the
runner and the device graph driver).
"""
