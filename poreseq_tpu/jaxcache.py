"""Persistent XLA compilation cache setup.

Compiling the banded-DP programs costs minutes per shape bucket on the
tunnel-attached TPU (PERF.md), and the reference-scale workload re-runs the
same buckets in every process (the reference's cluster model is one process
per region file, /root/reference/README.md:48-62).  Enabling JAX's persistent
compilation cache makes every bucket a one-time cost per machine instead of
per process: measured on this chip, a fill program that takes ~64 s to
compile cold loads from the cache in ~2 s.

Enabled by default for the TPU engine; control via environment:
  PSQ_COMPILATION_CACHE=0      disable
  PSQ_COMPILATION_CACHE_DIR=…  cache location (default ~/.cache/poreseq_tpu)
"""

from __future__ import annotations

import os

_done = False


def enable_compilation_cache() -> None:
    """Idempotently point JAX at the on-disk executable cache."""
    global _done
    if _done or os.environ.get("PSQ_COMPILATION_CACHE", "1") == "0":
        _done = True
        return
    _done = True
    import jax

    cache_dir = os.environ.get(
        "PSQ_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "poreseq_tpu",
                     "jaxcache"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything that took meaningful compile time; the programs
        # here are few and large, so disk use stays modest
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # never let cache plumbing break the compute path
