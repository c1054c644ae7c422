"""tpu_raytracer: a TPU-native real-time ray tracing framework (JAX/Pallas).

From-scratch rebuild of the capabilities of kokutoupan/fast-raytracing-wgpu
(ReSTIR path tracing, NEE+MIS, GGX/Lambert/glass BSDFs, glTF scenes,
TAA/accumulation post pipeline, async screenshots) designed TPU-first:
unified-stream BVH + lock-step traversal instead of hardware ray queries,
wavefront shading under jit, screen-tile sharding over a device mesh.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry math needs true f32: TPU matmuls otherwise default to bf16 passes,
# which destroys e.g. the inverse-projection w cancellation (0.01 -> 0).
_jax.config.update("jax_default_matmul_precision", "highest")

# Frame pipelines are large programs compiled over a remote-tunnel TPU;
# persist compilations across processes. TPU ONLY: cached XLA:CPU AOT
# executables can carry machine features of the compile host (the remote
# helper) and SIGILL/abort on this one.
import os as _os

_platforms = str(getattr(_jax.config, "jax_platforms", None) or
                 _os.environ.get("JAX_PLATFORMS", ""))
_cache_dir = _os.environ.get(
    "TPU_RAYTRACER_CACHE",
    _os.path.expanduser("~/.cache/tpu_raytracer_jax"))
if "cpu" in _platforms:
    # key CPU caches by this host's feature set so an entry compiled for a
    # different machine can never load (stale ones SIGILL)
    import hashlib as _hashlib

    try:
        with open("/proc/cpuinfo") as _f:
            _flags = [l for l in _f if l.startswith("flags")][:1]
        _key = _hashlib.sha1("".join(_flags).encode()).hexdigest()[:12]
        _cache_dir = f"{_cache_dir}_cpu_{_key}"
    except OSError:
        _cache_dir = None
if _cache_dir:
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
