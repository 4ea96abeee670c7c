"""Minimal quaternion utilities (replaces the reference's tfquaternion dep).

Used for source aiming (reference sources.py:386-460 ``RotationBase``) and
base-point transformations (distributions.py:2014-2119).  Quaternions are
``(..., 4)`` arrays in (w, x, y, z) order.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_multiply(q1, q2):
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conjugate(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q, eps=1e-12):
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_from_axis_angle(axis, angle):
    axis = jnp.asarray(axis)
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    half = jnp.asarray(angle) / 2.0
    w = jnp.cos(half)[..., None]
    xyz = axis * jnp.sin(half)[..., None]
    return jnp.concatenate([w, xyz], axis=-1)


def quat_from_u_to_v(u, v, eps=1e-12):
    """The rotation quaternion taking direction u to direction v
    (the reference's tfq.get_rotation_quaternion_from_u_to_v,
    sources.py:428-432).  Antiparallel inputs rotate pi about any
    perpendicular axis."""
    u = jnp.asarray(u, dtype=jnp.result_type(u, v, float))
    v = jnp.asarray(v, dtype=u.dtype)
    u = u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), eps)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)
    dot = jnp.sum(u * v, axis=-1)
    cross = jnp.cross(u, v)

    # general case: q = (1 + dot, cross), then normalize
    w = (1.0 + dot)[..., None]
    q = jnp.concatenate([w, cross], axis=-1)

    # antiparallel: pick a perpendicular axis deterministically
    perp = jnp.cross(u, jnp.asarray([1.0, 0.0, 0.0], dtype=u.dtype))
    perp_bad = jnp.linalg.norm(perp, axis=-1, keepdims=True) < 1e-6
    perp = jnp.where(perp_bad, jnp.cross(u, jnp.asarray([0.0, 1.0, 0.0], dtype=u.dtype)), perp)
    q_anti = jnp.concatenate([jnp.zeros_like(w), perp], axis=-1)

    anti = (dot < -1.0 + 1e-10)[..., None]
    return quat_normalize(jnp.where(anti, q_anti, q))


def rotate_vector(q, v):
    """Rotate ``(..., 3)`` vectors by quaternion(s) ``q`` (broadcastable)."""
    q = jnp.asarray(q)
    v = jnp.asarray(v)
    w = q[..., :1]
    xyz = q[..., 1:]
    # v' = v + 2 w (xyz x v) + 2 xyz x (xyz x v)
    t = 2.0 * jnp.cross(xyz, v)
    return v + w * t + jnp.cross(xyz, t)


def rotate_2d(points, angle):
    """Rotate ``(..., 2)`` points about the origin by ``angle``."""
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    x = points[..., 0]
    y = points[..., 1]
    return jnp.stack([c * x - s * y, s * x + c * y], axis=-1)
