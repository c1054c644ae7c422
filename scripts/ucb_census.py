"""StableHLO op census of ONE frame on the TPU dispatch path.

The only perf signal available without the chip: semantic op counts in
the traced frame. Gathers cost ~15 ns/visited-row on v5e regardless of
width, layout transposes lower ~10x below bandwidth (PERF.md) - so the
COUNT and SHAPES of gather/transpose ops in the frame are a direct TPU
cost model even when lowered for CPU. TPU_RT_FORCE_PALLAS=1 keeps the
dispatch identical to the TPU path (kernels as custom calls).

Counts are pre-fusion (StableHLO), i.e. what the program ASKS for;
XLA may CSE duplicates but cannot remove a semantic layout change.

Usage:
  python scripts/ucb_census.py [--size 128] [--ops transpose,gather]
  TPU_RT_HIST_QUAD=1 python scripts/ucb_census.py     # census a gate

Compare two gate settings by diffing the output.
"""

import argparse
import collections
import os
import re
import sys

os.environ.setdefault("TPU_RT_FORCE_PALLAS", "1")

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, ".")

# ops whose per-instance SHAPES matter enough to list individually
DETAIL_OPS = ("transpose", "gather", "scatter", "sort")
# ops worth counting in aggregate
COUNT_RE = re.compile(r"stablehlo\.([a-z_]+)")
CUSTOM_RE = re.compile(r'stablehlo\.custom_call.*call_target_name\s*=\s*"([^"]+)"')


def build_frame(size):
    import jax.numpy as jnp  # noqa: F401

    from tpu_raytracer.models import scenes
    from tpu_raytracer.ops import restir as restir_ops
    from tpu_raytracer.parallel import views as views_mod
    from tpu_raytracer.render import camera as camera_mod
    from tpu_raytracer.render import pipeline, renderer

    width = height = size
    scene = scenes.create_cornell_box()
    cam = camera_mod.CameraController()
    camera = renderer.camera_to_device(
        cam.uniform(width / height, 0, scene.num_lights))
    state = pipeline.init_state(width, height)

    def fn(scene, camera, frame_count, state):
        ctx = restir_ops.make_ctx(width, height)

        def make_view(flat):
            return views_mod.trivial_view(flat, width, height)

        return pipeline.render_band(scene, camera, frame_count, state, ctx,
                                    make_view)

    return fn, (scene, camera, np.uint32(1), state)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--full", action="store_true",
                    help="dump every op count, not just the hot set")
    args = ap.parse_args()

    fn, ex = build_frame(args.size)
    txt = jax.jit(fn).lower(*ex).as_text()

    counts = collections.Counter(COUNT_RE.findall(txt))
    customs = collections.Counter(CUSTOM_RE.findall(txt))

    gates = {k: v for k, v in os.environ.items() if k.startswith("TPU_RT_")}
    print(f"frame census @ {args.size}x{args.size}  gates={gates}")
    hot = ("gather", "scatter", "transpose", "sort", "while",
           "dot_general", "iota", "dynamic_slice", "concatenate")
    for op in (sorted(counts) if args.full else hot):
        if counts.get(op):
            print(f"  {op:16s} {counts[op]}")
    for name, n in customs.most_common():
        print(f"  custom_call      {n:3d}  {name}")

    # per-instance shapes for the layout-sensitive ops
    for op in DETAIL_OPS:
        pat = re.compile(
            r"stablehlo\.%s[^\n]*?:\s*(\([^)]*\)|[^\n]*?)\s*->\s*([^\n]+)" % op)
        shapes = collections.Counter()
        for m in pat.finditer(txt):
            shapes[f"{m.group(1).strip()} -> {m.group(2).strip()}"] += 1
        if shapes:
            print(f"\n{op} instances:")
            for sig, n in shapes.most_common(20):
                print(f"  x{n:<3d} {sig}")


if __name__ == "__main__":
    main()
