"""Global configuration for tabmat-tpu.

The reference library (Quantco/tabmat) is float64-by-default: every matrix
constructor defaults to ``np.float64`` and the test-suite checks 12-decimal
parity (see reference ``tests/test_real_matrix.py:22``).  On TPU, float64 is
software-emulated by XLA, so we must run JAX in x64 mode.  We enable it at
import time unless the user opts out via ``TABMAT_TPU_NO_X64=1``.

We also enable JAX's persistent compilation cache by default: on TPU the
first compile of each kernel shape is expensive (tens of seconds through the
remote-compile path), while executions are sub-millisecond.  Caching
compiles across processes makes the test-suite and benchmark CLI usable.
Opt out with ``TABMAT_TPU_NO_COMPILATION_CACHE=1`` or redirect with
``TABMAT_TPU_COMPILATION_CACHE_DIR``.
"""

import os

import jax

_initialized = False


def initialize() -> None:
    """Apply global JAX configuration for tabmat-tpu (idempotent)."""
    global _initialized
    if _initialized:
        return
    _initialized = True

    if os.environ.get("TABMAT_TPU_NO_X64", "0") != "1":
        jax.config.update("jax_enable_x64", True)

    if os.environ.get("TABMAT_TPU_NO_COMPILATION_CACHE", "0") != "1":
        cache_dir = os.environ.get(
            "TABMAT_TPU_COMPILATION_CACHE_DIR",
            os.path.expanduser("~/.cache/tabmat_tpu/jax_cache"),
        )
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
        except Exception:  # pragma: no cover - cache is best-effort
            pass


def on_tpu() -> bool:
    """True when the default JAX backend is TPU."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def on_cpu() -> bool:
    """True when the default JAX backend is CPU."""
    try:
        return jax.default_backend() == "cpu"
    except Exception:  # pragma: no cover
        return True
