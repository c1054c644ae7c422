"""Gate one kernel variant (argv[1]) vs the TPU-vpu render."""

import sys

sys.path.insert(0, ".")

import jax
import numpy as np

sys.argv_mode = sys.argv[1] if len(sys.argv) > 1 else "mxuf2"


def main():
    from ucb_quality import render
    from tpu_raytracer.utils.image import psnr
    import tpu_raytracer.ops.pallas_trace as pt

    want = np.load("tests/golden/cornell_64_f8_ldr.npy").astype(np.float32)
    pt.KERNEL_MODE = "vpu"
    vpu = render("vpu")
    pt.KERNEL_MODE = sys.argv_mode
    jax.clear_caches()
    got = render(sys.argv_mode)
    print(f"kernel={sys.argv_mode} PSNR vs golden={psnr(got, want):6.2f}"
          f" vs vpu={psnr(got, vpu):6.2f} maxdiff="
          f"{np.abs(got - vpu).max():.4f}")


if __name__ == "__main__":
    main()
