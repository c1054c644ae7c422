"""Manual smoke render: Cornell box, progressive accumulation, PNG out."""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from tpu_raytracer.models import scenes
from tpu_raytracer.render import camera as camera_mod
from tpu_raytracer.render import renderer
from tpu_raytracer.utils import image as image_utils


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--scene", default="cornell")
    ap.add_argument("--out", default="output/cornell.png")
    args = ap.parse_args()

    print("devices:", jax.devices())
    t0 = time.time()
    scene = {
        "cornell": scenes.create_cornell_box,
        "cornell_diffuse": scenes.create_cornell_box_diffuse,
        "restir": scenes.create_restir_scene,
        "bunny": scenes.create_bunny_scene,
    }[args.scene]()
    print(f"scene build: {time.time()-t0:.2f}s, tris={scene.num_triangles}, "
          f"bvh_stream={scene.bvh_rec.shape[0]}, lights={scene.num_lights}")

    w = h = args.size
    cam = camera_mod.CameraController()
    accum = renderer.make_accum(w, h)

    t0 = time.time()
    for frame in range(args.spp):
        uniform = renderer.camera_to_device(cam.uniform(w / h, frame, scene.num_lights))
        accum, radiance = renderer.render_progressive(
            scene, uniform, jnp.uint32(frame), accum, w, h)
        if frame == 0:
            accum.block_until_ready()
            print(f"first frame (incl. compile): {time.time()-t0:.2f}s")
            t0 = time.time()
    accum.block_until_ready()
    n = max(args.spp - 1, 1)
    dt = time.time() - t0
    print(f"{n} frames in {dt:.3f}s = {n/dt:.2f} fps @ {w}x{h}")

    img = np.asarray(accum).reshape(h, w, 3)
    print("radiance stats: mean", img.mean(axis=(0, 1)), "max", img.max(),
          "nan", np.isnan(img).sum())
    # simple tonemap: Reinhard + gamma
    tm = img / (1.0 + img)
    image_utils.save_png(args.out, image_utils.linear_to_srgb_u8(tm))
    print("saved", args.out)


if __name__ == "__main__":
    main()
