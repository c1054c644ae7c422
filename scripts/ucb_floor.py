"""Measure the Pallas sweep's fixed cost via the PROFILER (the only
trustworthy timer): device time of (a) an all-dead sweep (counts=0
everywhere - pure floor), (b) a 10%-live sweep, (c) all-live, at the
current TPU_RT_BR."""

import collections
import glob
import gzip
import json
import shutil
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from tpu_raytracer.models import scenes
    from tpu_raytracer.ops import pallas_trace as pt

    print(f"BR={pt.BR}")
    scene = scenes.create_cornell_box()
    r = 262144
    rng = np.random.default_rng(0)
    ro = jnp.asarray(rng.uniform(-0.9, 0.9, (r, 3)).astype(np.float32))
    rd = rng.standard_normal((r, 3)).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))
    masks = {
        "dead": jnp.zeros((r,), jnp.bool_),
        "live10": jnp.asarray(rng.uniform(size=r) < 0.1),
        "live100": None,
    }

    @jax.jit
    def run(o, d, act):
        return pt.trace_brute_pallas(
            scene.tri_planes, scene.chunk_aabb, o, d, 1e-3, 100.0,
            active=act)["t"]

    # compile all variants first
    outs = {}
    for k, m in masks.items():
        outs[k] = run(ro, rd, m)
    jax.block_until_ready(list(outs.values()))

    shutil.rmtree("/tmp/rt_floor", ignore_errors=True)
    with jax.profiler.trace("/tmp/rt_floor"):
        o = ro
        for k, m in masks.items():
            for i in range(10):
                o = o + jnp.float32(1e-9)
                out = run(o, rd, m)
        jax.block_until_ready(out)

    path = sorted(glob.glob("/tmp/rt_floor/**/*.trace.json.gz",
                            recursive=True))[-1]
    with gzip.open(path) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    names = {e["pid"]: e["args"].get("name", "") for e in ev
             if e.get("ph") == "M" and e.get("name") == "process_name"}
    rows = []
    for e in ev:
        if e.get("ph") == "X" and "dur" in e \
                and "TPU" in names.get(e.get("pid"), ""):
            if "trace_brute" in e["name"]:
                rows.append((e["ts"], e["dur"]))
    rows.sort()
    ds = [d / 1e3 for _, d in rows]
    print(f"n={len(ds)} trace_brute durations in time order (ms):")
    print(" ".join(f"{d:.2f}" for d in ds))


if __name__ == "__main__":
    main()
