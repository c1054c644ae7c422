"""Checkpoint / resume for long progressive accumulations.

The reference has no checkpointing (SURVEY.md §5); the state that WOULD
checkpoint there - camera pose, frame_count, accumulation buffer - plus the
ReSTIR reservoirs are all plain arrays here, so pause/resume is a pytree
serialization. Default backend is a compressed .npz; when orbax is
available (`use_orbax=True`) the same pytree goes through
`orbax.checkpoint` for async/atomic multi-host semantics.
"""

from __future__ import annotations

import json
import os

import numpy as np


def save(path: str, state: dict, frame_count: int, camera_state: dict,
         use_orbax: bool = False) -> None:
    """Serialize FrameState + counters + camera pose.

    camera_state: {"position": [3], "yaw": f, "pitch": f,
                   "prev_view_proj": [4,4] or None}
    """
    from ..ops.gbuffer import GB_COLS
    from ..ops.restir import RES_COLS

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    meta = {
        "format": {"gb_cols": GB_COLS, "res_cols": RES_COLS},
        "frame_count": int(frame_count),
        "camera": {
            "position": np.asarray(camera_state["position"]).tolist(),
            "yaw": float(camera_state["yaw"]),
            "pitch": float(camera_state["pitch"]),
            "prev_view_proj": (
                None if camera_state.get("prev_view_proj") is None
                else np.asarray(camera_state["prev_view_proj"]).tolist()),
        },
    }
    if use_orbax:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path),
                   {"state": {k: np.asarray(v) for k, v in state.items()},
                    "meta_json": meta and json.dumps(meta)})
        ckptr.wait_until_finished()
        return
    np.savez_compressed(
        path,
        meta=json.dumps(meta),
        **{k: np.asarray(v) for k, v in state.items()},
    )


def load(path: str) -> tuple:
    """Returns (state dict of numpy arrays, frame_count, camera_state).

    Raises ValueError on a checkpoint whose packed-row layout predates the
    current format (e.g. pre-dedup 8-column reservoirs) instead of letting
    a silently-clamped slice surface later as an unrelated shape error.
    """
    from ..ops.gbuffer import GB_COLS
    from ..ops.restir import RES_COLS

    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["meta"]))
        state = {k: z[k] for k in z.files if k != "meta"}
    fmt = meta.get("format")
    want = {"gb_cols": GB_COLS, "res_cols": RES_COLS}
    if fmt != want:
        raise ValueError(
            f"checkpoint {path!r} has packed-row format {fmt} but this "
            f"build expects {want} - it was written by an incompatible "
            "version; re-render rather than resuming")
    cam = meta["camera"]
    camera_state = {
        "position": np.asarray(cam["position"], np.float32),
        "yaw": cam["yaw"],
        "pitch": cam["pitch"],
        "prev_view_proj": (None if cam["prev_view_proj"] is None
                           else np.asarray(cam["prev_view_proj"], np.float32)),
    }
    return state, meta["frame_count"], camera_state
