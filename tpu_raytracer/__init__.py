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
