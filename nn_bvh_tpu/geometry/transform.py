"""4x4 transforms (host-side scene preparation).

Counterpart of `util/transform.h:26` — but since all geometry is flattened to
render space at scene-build time (like the reference's wavefront path, which
bakes transforms into the BVH build), these run on numpy host arrays once and
never appear in device code.
"""

from __future__ import annotations

import numpy as np


def translate(delta) -> np.ndarray:
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = delta
    return m


def scale(s) -> np.ndarray:
    s = np.broadcast_to(np.asarray(s, np.float32), (3,))
    m = np.eye(4, dtype=np.float32)
    m[0, 0], m[1, 1], m[2, 2] = s
    return m


def rotate(angle_deg: float, axis) -> np.ndarray:
    a = np.asarray(axis, np.float64)
    a = a / np.linalg.norm(a)
    th = np.deg2rad(angle_deg)
    c, s = np.cos(th), np.sin(th)
    x, y, z = a
    r = np.array(
        [
            [c + x * x * (1 - c), x * y * (1 - c) - z * s, x * z * (1 - c) + y * s],
            [y * x * (1 - c) + z * s, c + y * y * (1 - c), y * z * (1 - c) - x * s],
            [z * x * (1 - c) - y * s, z * y * (1 - c) + x * s, c + z * z * (1 - c)],
        ]
    )
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = r
    return m


def rotate_x(deg):
    return rotate(deg, (1, 0, 0))


def rotate_y(deg):
    return rotate(deg, (0, 1, 0))


def rotate_z(deg):
    return rotate(deg, (0, 0, 1))


def look_at(eye, target, up) -> np.ndarray:
    """Camera-to-world transform (transform.h LookAt). pbrt convention:
    camera space is left-handed with +z into the screen."""
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    up = np.asarray(up, np.float64)
    d = target - eye
    d = d / np.linalg.norm(d)
    right = np.cross(up / np.linalg.norm(up), d)
    nr = np.linalg.norm(right)
    if nr < 1e-8:
        raise ValueError("look_at: up and view direction are parallel")
    right /= nr
    new_up = np.cross(d, right)
    m = np.eye(4, dtype=np.float32)
    m[:3, 0] = right
    m[:3, 1] = new_up
    m[:3, 2] = d
    m[:3, 3] = eye
    return m


def apply_points(m: np.ndarray, p: np.ndarray) -> np.ndarray:
    """(4,4) @ (...,3) points with homogeneous divide."""
    p = np.asarray(p, np.float32)
    r = p @ m[:3, :3].T + m[:3, 3]
    return r.astype(np.float32)


def apply_vectors(m: np.ndarray, v: np.ndarray) -> np.ndarray:
    return (np.asarray(v, np.float32) @ m[:3, :3].T).astype(np.float32)


def apply_normals(m: np.ndarray, n: np.ndarray) -> np.ndarray:
    """Normals transform by the inverse transpose (vecmath Normal3 semantics)."""
    inv = np.linalg.inv(m[:3, :3])
    r = np.asarray(n, np.float32) @ inv.astype(np.float32)
    norm = np.linalg.norm(r, axis=-1, keepdims=True)
    return (r / np.maximum(norm, 1e-20)).astype(np.float32)


def perspective(fov_deg: float, near: float = 1e-2, far: float = 1000.0) -> np.ndarray:
    """pbrt Perspective projection (cameras.cpp): camera space -> NDC z in [0,1]."""
    inv_tan = 1.0 / np.tan(np.deg2rad(fov_deg) / 2.0)
    persp = np.array(
        [
            [1, 0, 0, 0],
            [0, 1, 0, 0],
            [0, 0, far / (far - near), -far * near / (far - near)],
            [0, 0, 1, 0],
        ],
        np.float32,
    )
    s = np.eye(4, dtype=np.float32)
    s[0, 0] = inv_tan
    s[1, 1] = inv_tan
    return s @ persp
