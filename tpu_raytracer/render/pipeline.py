"""Full ReSTIR frame pipeline: the flagship render path.

TPU re-architecture of the reference's five-pass frame
(src/renderer.rs:399-515):

    G-buffer -> ReSTIR temporal -> ReSTIR spatial(+shade) -> post -> LDR

The whole frame is ONE jitted, donated function over a functional
`FrameState`; the reference's parity-indexed ping-pong bind groups
(gbuffer.rs:299, post.rs:209-224, restir.rs:362-378) become plain dataflow.
The blit/letterbox raster pass (blit.wgsl) is display plumbing; its
aspect-correct scaling lives in app/display helpers instead.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import gbuffer as gbuffer_ops
from ..ops import post as post_ops
from ..ops import restir as restir_ops


def init_state(width: int, height: int) -> dict:
    """Fresh FrameState: prev G-buffer, reservoirs, accumulation buffer."""
    n = width * height
    return {
        "prev_gb": {
            "valid": jnp.zeros((n,), jnp.bool_),
            "pos": jnp.zeros((n, 3), jnp.float32),
            "mat_id": jnp.zeros((n,), jnp.int32),
            "oct_normal": jnp.zeros((n, 2), jnp.float32),
            "uv": jnp.zeros((n, 2), jnp.float32),
            "albedo": jnp.zeros((n, 3), jnp.float32),
            "motion": jnp.zeros((n, 2), jnp.float32),
        },
        "reservoirs": restir_ops.empty_reservoirs(n),
        "accum": jnp.zeros((n, 3), jnp.float32),
    }


@partial(jax.jit, static_argnames=("width", "height"), donate_argnums=(3,))
def render_frame(scene, camera, frame_count, state, width: int, height: int):
    """One complete ReSTIR frame.

    Args:
      scene: CompiledScene.
      camera: device camera uniform (see render/camera.py).
      frame_count: uint32 scalar; the accumulation/SPP counter that resets
        on camera movement (state.rs:151-152 semantics - caller resets).
      state: FrameState pytree (donated).

    Returns (ldr [n,3] gamma-encoded, hdr [n,3], new_state).
    """
    gb = gbuffer_ops.render_gbuffer(scene, camera, width, height)
    reservoirs_t = restir_ops.restir_temporal(
        scene, gb, state["prev_gb"], state["reservoirs"], camera, frame_count,
        width, height)
    reservoirs_s, hdr = restir_ops.restir_spatial(
        scene, gb, reservoirs_t, camera, frame_count, width, height)
    ldr, accum = post_ops.post_process(
        hdr, state["accum"], gb, frame_count, width, height)
    new_state = {"prev_gb": gb, "reservoirs": reservoirs_s, "accum": accum}
    return ldr, hdr, new_state
