"""Enable the persistent XLA compilation cache (imported by nsa_tpu)."""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
