"""TPU kernel-variant quality gate: PSNR vs the CPU-generated golden.

Renders the golden-test configuration (Cornell 64x64, 8 frames, fixed
camera) on the REAL chip per kernel variant and reports PSNR vs
tests/golden/cornell_64_f8_ldr.npy. mxu1 is acceptable as default only
if it stays within a hair of mxu3/vpu.
"""

import sys

sys.path.insert(0, ".")

import jax
import numpy as np
import jax.numpy as jnp


def render(kernel):
    from tpu_raytracer.ops import pallas_trace
    pallas_trace.KERNEL_MODE = kernel
    from tpu_raytracer.models import scenes
    from tpu_raytracer.render import camera as camera_mod
    from tpu_raytracer.render import pipeline, renderer

    w = h = 64
    scene = scenes.create_cornell_box()
    cam = camera_mod.CameraController()
    state = pipeline.init_state(w, h)
    for frame in range(8):
        uniform = renderer.camera_to_device(
            cam.uniform(1.0, frame, scene.num_lights))
        ldr, hdr, state, aux = pipeline.render_frame(
            scene, uniform, jnp.uint32(frame), state, w, h)
    return np.asarray(ldr, np.float32)


def main():
    from tpu_raytracer.utils.image import psnr

    want = np.load("tests/golden/cornell_64_f8_ldr.npy").astype(np.float32)
    vpu_render = None
    for kernel in ("vpu", "mxuf2", "mxuf4", "mxu3"):
        import tpu_raytracer.ops.pallas_trace as pt
        pt.KERNEL_MODE = kernel
        # render_frame's jit cache key does NOT include the kernel global -
        # drop compiled graphs so the variant actually retraces
        jax.clear_caches()
        got = render(kernel)
        if vpu_render is None:
            vpu_render = got
        print(f"kernel={kernel:5s} PSNR vs golden = {psnr(got, want):6.2f} dB"
              f"  vs TPU-vpu = {psnr(got, vpu_render):6.2f} dB"
              f"  maxdiff = {np.abs(got - vpu_render).max():.4f}")


if __name__ == "__main__":
    main()
