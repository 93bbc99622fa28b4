from kaldi_lstm_tpu.utils.logging import (
    LOG,
    VLOG,
    WARN,
    get_verbose_level,
    set_verbose_level,
)
from kaldi_lstm_tpu.utils.timer import Timer


def enable_compilation_cache(path: str = "") -> None:
    """Persist XLA compilations across CLI invocations (the recipe runs
    the trainer 15+ times on identical shapes; without this every
    iteration pays full compile). Honors JAX_COMPILATION_CACHE_DIR."""
    import os
    import jax
    cache = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
             or os.path.expanduser("~/.cache/kaldi_lstm_tpu/jax"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization; never fail a tool over it
