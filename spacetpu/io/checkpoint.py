"""Checkpoint / resume of simulation state.

The reference has none (state lives only in ObjectBuffer.objects,
`/root/reference/space/src/sim/mod.rs:122-127`; SURVEY.md SS5 flags this as a
gap the TPU build must fill). State is a pytree of dense arrays, so a
checkpoint is one device->host transfer and an npz file; scenes' host-side
metadata (names/colors/radii) rides along so a viewer can resume too.
"""

from __future__ import annotations

import json
from typing import Optional

import jax.numpy as jnp
import numpy as np

from spacetpu.state import Scene, State

_FIELDS = ("pos", "vel", "mass", "acc", "pos_c", "vel_c", "time", "n_active")


def save(path: str, state: State, *, scene: Optional[Scene] = None,
         extra: Optional[dict] = None):
    """Write state (+ optional scene metadata and JSON extras) to an npz."""
    arrays = {}
    for f in _FIELDS:
        v = getattr(state, f)
        if v is not None:
            arrays[f"state_{f}"] = np.asarray(v)
    if scene is not None:
        arrays["scene_colors"] = scene.colors
        arrays["scene_radii"] = scene.radii
        arrays["scene_names"] = np.array(scene.names)
        arrays["scene_g"] = np.float64(scene.g)
    if extra:
        arrays["extra_json"] = np.array(json.dumps(extra))
    np.savez_compressed(path, **arrays)


def load(path: str, *, dtype=None):
    """Read back (state, scene | None, extra | None). dtype overrides the
    stored float dtype (e.g. resume an f32 run in f64 for validation)."""
    with np.load(path, allow_pickle=False) as z:
        kw = {}
        for f in _FIELDS:
            key = f"state_{f}"
            if key in z:
                arr = z[key]
                if dtype is not None and arr.dtype.kind == "f":
                    arr = arr.astype(dtype)
                kw[f] = jnp.asarray(arr)
            else:
                kw[f] = None
        state = State(**kw)
        scene = None
        if "scene_colors" in z:
            # The real body count is the metadata length — state arrays may
            # be padded (pad_to); trim all three so Scene.n stays consistent
            # with its pos/vel/mass rows after a round trip.
            n = len(z["scene_names"])
            scene = Scene(
                names=[str(s) for s in z["scene_names"]],
                colors=z["scene_colors"],
                radii=z["scene_radii"],
                pos=np.asarray(state.pos, np.float64)[:n],
                vel=np.asarray(state.vel, np.float64)[:n],
                mass=np.asarray(state.mass, np.float64)[:n],
                g=float(z["scene_g"]) if "scene_g" in z else Scene.g,
            )
        extra = None
        if "extra_json" in z:
            extra = json.loads(str(z["extra_json"]))
    return state, scene, extra


# --- orbax backend (optional): async, production checkpointing ---

def save_orbax(path: str, state: State, *, extra: Optional[dict] = None):
    """Checkpoint via orbax (async-capable, sharding-aware). Use for large
    multi-chip states; npz `save` remains the simple default."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    payload = {f: getattr(state, f) for f in _FIELDS
               if getattr(state, f) is not None}
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    if extra:
        with open(str(path).rstrip("/") + ".extra.json", "w") as f:
            json.dump(extra, f)


def load_orbax(path: str, *, like: Optional[State] = None
               ) -> "tuple[State, Optional[dict]]":
    """Restore an orbax checkpoint -> (state, extra). Unlike npz `load`,
    orbax checkpoints carry no scene metadata (names/colors/radii live in
    host code; keep them with the run config).

    like: optional template State whose shardings (and dtypes) the restore
    should target — pass the live sharded state (or one built from
    jax.ShapeDtypeStruct + NamedSharding) to restore each shard directly
    onto its device without a host gather (multi-chip resume)."""
    import os

    import jax as _jax
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        target = {}
        for f in _FIELDS:
            v = getattr(like, f)
            if v is not None:
                target[f] = _jax.ShapeDtypeStruct(
                    v.shape, v.dtype,
                    sharding=getattr(v, "sharding", None),
                )
        payload = ckptr.restore(path, target)
    else:
        payload = ckptr.restore(path)
    kw = {f: payload.get(f) for f in _FIELDS}
    extra = None
    extra_path = str(path).rstrip("/") + ".extra.json"
    if os.path.exists(extra_path):
        with open(extra_path) as f:
            extra = json.load(f)
    return State(**kw), extra
