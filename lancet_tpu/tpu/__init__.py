"""TPU engine: batched JAX/XLA/Pallas kernels for the hot loops
(SURVEY.md §3 ranking): affine-gap alignment, repeat scans, FET scoring,
k-mer graph construction. Each kernel is validated bit-exact against the
oracle engine in lancet_tpu.engine.
"""

import os


def enable_compilation_cache(path: str = "/tmp/lancet_tpu_jax_cache") -> None:
    """Persistent XLA compilation cache so repeated runs skip the 20-40s
    per-shape compile (important over the remote-TPU tunnel)."""
    import jax

    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


enable_compilation_cache()
