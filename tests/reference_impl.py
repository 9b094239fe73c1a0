"""Pure-numpy f64 golden implementation of the reference physics.

Independent re-implementation (loops, not vectorized cleverness) of the
force law and integrator from `/root/reference/space/src/sim/{mod,direct}.rs`
used as the oracle in golden-trajectory tests. Deliberately simple and slow.
"""

from __future__ import annotations

import numpy as np

from spacetpu.constants import COLLISION_EPSILON, G


def acc_reference(pos: np.ndarray, mass: np.ndarray, g: float = G,
                  eps: float = COLLISION_EPSILON) -> np.ndarray:
    """Direct O(N^2) with the reference's additive-eps softening
    (sim/mod.rs:22-26): a_i += rel * m_j * G / (|rel|^3 + eps), j != i."""
    n = pos.shape[0]
    acc = np.zeros((n, 3))
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            rel = pos[j] - pos[i]
            mag2 = float(rel @ rel)
            acc[i] += rel * mass[j] * g / (mag2 * np.sqrt(mag2) + eps)
    return acc


def acc_plummer(pos: np.ndarray, mass: np.ndarray, g: float = G,
                eps: float = 0.0) -> np.ndarray:
    n = pos.shape[0]
    acc = np.zeros((n, 3))
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            rel = pos[j] - pos[i]
            d2 = float(rel @ rel) + eps * eps
            if d2 == 0.0:
                continue
            acc[i] += rel * mass[j] * g / d2 ** 1.5
    return acc


def step_reference(pos, vel, mass, dt, g=G, eps=COLLISION_EPSILON):
    """Semi-implicit Euler exactly as par_add_rec (direct.rs:8-24)."""
    acc = acc_reference(pos, mass, g=g, eps=eps)
    vel = vel + acc * dt
    pos = pos + vel * dt
    return pos, vel


def rollout_reference(pos, vel, mass, dt, steps, g=G, eps=COLLISION_EPSILON):
    pos = pos.copy()
    vel = vel.copy()
    for _ in range(steps):
        pos, vel = step_reference(pos, vel, mass, dt, g=g, eps=eps)
    return pos, vel
