"""SoA simulation state and host-side scene metadata.

The reference keeps an AoS ``Vec<ObjectInfo>`` of f64 pos/vel/mass
(`/root/reference/space/src/sim/mod.rs:14-19`) plus a separate acceleration
out-buffer (`sim/mod.rs:122-127`). The TPU-native design is a structure of
(dense, statically-shaped) arrays living in HBM, registered as a pytree so a
single jitted ``step`` can donate and update it in place.

Numerics: the reference is f64 end-to-end; TPU vector units are f32. To
support AU-scale scenes (|pos| ~ 10 AU, per-step displacement ~ 1e-6 AU, i.e.
at the edge of f32 ulp) the state optionally carries Kahan compensation
arrays ``pos_c``/``vel_c`` giving ~2x the effective mantissa for the
accumulated integrations without paying for (emulated) f64 on TPU.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from spacetpu import constants


class State(NamedTuple):
    """N-body system state as a pytree of dense arrays.

    Shapes: ``pos``/``vel`` are ``(N, 3)``, ``mass`` is ``(N,)``. ``acc``
    caches the acceleration at ``pos`` so leapfrog-KDK needs one force
    evaluation per step (the reference similarly persists its out-buffer
    across ticks, `sim/mod.rs:122-127`, zeroing it each integrate,
    `direct.rs:20-23`). ``pos_c``/``vel_c`` are optional Kahan compensation
    terms (same shape as ``pos``/``vel``), or None.
    ``n_active`` is the number of real bodies; rows >= n_active are zero-mass
    padding so kernel shapes can stay aligned to TPU tiles.
    """

    pos: jax.Array
    vel: jax.Array
    mass: jax.Array
    acc: jax.Array
    pos_c: Any = None
    vel_c: Any = None
    time: Any = None  # scalar f64-ish seconds elapsed (f32 array on TPU)
    n_active: Any = None  # static-ish scalar int32

    @property
    def n(self) -> int:
        return self.pos.shape[0]


def make_state(
    pos,
    vel,
    mass,
    *,
    dtype=jnp.float32,
    compensated: bool = False,
    pad_to: int | None = None,
) -> State:
    """Build a State from array-likes, optionally padding N up to ``pad_to``.

    Padding bodies have zero mass so they exert no force (the same trick the
    reference uses for massless shell particles, `presets.rs:200-251`), and
    are parked at the origin.
    """
    # Copy (not asarray): Simulation.step/run donate their state argument, so
    # aliasing caller-owned arrays into the state would delete them.
    pos = jnp.array(pos, dtype=dtype, copy=True)
    vel = jnp.array(vel, dtype=dtype, copy=True)
    mass = jnp.array(mass, dtype=dtype, copy=True)
    n = pos.shape[0]
    if pos.shape != (n, 3) or vel.shape != (n, 3) or mass.shape != (n,):
        raise ValueError(
            f"bad shapes pos={pos.shape} vel={vel.shape} mass={mass.shape}"
        )
    if pad_to is not None and pad_to > n:
        pad = pad_to - n
        pos = jnp.concatenate([pos, jnp.zeros((pad, 3), dtype)], axis=0)
        vel = jnp.concatenate([vel, jnp.zeros((pad, 3), dtype)], axis=0)
        mass = jnp.concatenate([mass, jnp.zeros((pad,), dtype)], axis=0)
    acc = jnp.zeros_like(pos)
    comp = jnp.zeros_like(pos) if compensated else None
    comp_v = jnp.zeros_like(vel) if compensated else None
    return State(
        pos=pos,
        vel=vel,
        mass=mass,
        acc=acc,
        pos_c=comp,
        vel_c=comp_v,
        time=jnp.zeros((), dtype),
        n_active=jnp.asarray(n, jnp.int32),
    )


@dataclasses.dataclass
class Scene:
    """Host-side per-body metadata + initial state.

    Mirrors the split the reference performs in `main.rs:70-77`: the render
    thread keeps names/colors/radii (`Objects`, objects.rs:169-195) while the
    sim thread gets bare pos/vel/mass.
    """

    names: list[str]
    colors: np.ndarray  # (N, 3) f32
    radii: np.ndarray  # (N,) f32
    pos: np.ndarray  # (N, 3) f64
    vel: np.ndarray  # (N, 3) f64
    mass: np.ndarray  # (N,) f64
    #: gravitational constant of the scene's unit system: AU/earth-mass
    #: scenes use the rescaled constants.G, benchmark scenes natural G=1.
    g: float = constants.G

    @property
    def n(self) -> int:
        return len(self.names)

    def state(self, *, dtype=jnp.float32, compensated=False, pad_to=None) -> State:
        return make_state(
            self.pos,
            self.vel,
            self.mass,
            dtype=dtype,
            compensated=compensated,
            pad_to=pad_to,
        )

    @staticmethod
    def from_bodies(bodies: Sequence["Body"]) -> "Scene":
        return Scene(
            names=[b.name for b in bodies],
            colors=np.array([b.color for b in bodies], np.float32).reshape(-1, 3),
            radii=np.array([b.radius for b in bodies], np.float32),
            pos=np.array([b.pos for b in bodies], np.float64).reshape(-1, 3),
            vel=np.array([b.vel for b in bodies], np.float64).reshape(-1, 3),
            mass=np.array([b.mass for b in bodies], np.float64),
        )


@dataclasses.dataclass
class Body:
    """One named body: the analogue of the reference `Object`
    (`/root/reference/space/src/lib.rs:22-28`). pos in AU, vel in AU/s,
    mass in Earth masses; color RGB in [0,1]; radius in AU."""

    name: str
    pos: tuple[float, float, float]
    vel: tuple[float, float, float]
    mass: float
    color: tuple[float, float, float] = (1.0, 1.0, 1.0)
    radius: float = 1e4 / 1.495e11
