"""Cameras: batched ray generation.

Counterpart of the reference camera family (`base/camera.h:34`, `cameras.h`):
PerspectiveCamera (with depth of field) and OrthographicCamera as batched pure
functions — the GenerateCameraRays stage of the wavefront pipeline
(`wavefront/camera.cpp:18`).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core import sampling
from ..geometry import transform as xf

Array = jax.Array

PERSPECTIVE = 0
ORTHOGRAPHIC = 1


class Camera(NamedTuple):
    kind: int                 # static
    cam_to_world: Array       # (4,4) f32 — pbrt LookAt convention (+z forward)
    fov: float                # degrees, shorter image axis (perspective)
    width: int
    height: int
    lens_radius: float
    focal_distance: float
    screen_scale: float       # ortho half-height


from ..utils.pytree import register_static as _register_static

_register_static(
    Camera, ("kind", "fov", "width", "height", "lens_radius", "focal_distance", "screen_scale")
)


def make_perspective(cam_to_world: np.ndarray, fov: float, width: int, height: int,
                     lens_radius: float = 0.0, focal_distance: float = 1e6) -> Camera:
    return Camera(PERSPECTIVE, jnp.asarray(cam_to_world, jnp.float32), float(fov),
                  int(width), int(height), float(lens_radius), float(focal_distance), 1.0)


def make_orthographic(cam_to_world: np.ndarray, half_height: float, width: int,
                      height: int) -> Camera:
    return Camera(ORTHOGRAPHIC, jnp.asarray(cam_to_world, jnp.float32), 0.0,
                  int(width), int(height), 0.0, 1e6, float(half_height))


def generate_rays(cam: Camera, pixel_idx: Array, u_pixel: Array, u_lens: Array):
    """pixel_idx: (R,) flat pixel index; u_pixel/u_lens: (R,2) jitters.

    Returns (o, d) world-space rays. Screen-window convention follows pbrt
    (cameras.cpp): FOV spans the shorter axis, +y up in screen space.
    """
    W, H = cam.width, cam.height
    px = (pixel_idx % W).astype(jnp.float32) + u_pixel[..., 0]
    py = (pixel_idx // W).astype(jnp.float32) + u_pixel[..., 1]
    aspect = W / H
    sx = 2.0 * px / W - 1.0
    sy = 1.0 - 2.0 * py / H
    if aspect >= 1.0:
        sx = sx * aspect
    else:
        sy = sy / aspect

    if cam.kind == PERSPECTIVE:
        tan_half = float(np.tan(np.deg2rad(cam.fov) / 2.0))
        d_cam = jnp.stack([sx * tan_half, sy * tan_half, jnp.ones_like(sx)], axis=-1)
        o_cam = jnp.zeros_like(d_cam)
        if cam.lens_radius > 0.0:
            # thin-lens depth of field (cameras.h PerspectiveCamera aperture)
            p_lens = cam.lens_radius * sampling.sample_uniform_disk_concentric(u_lens)
            ft = cam.focal_distance  # d_cam.z == 1
            p_focus = d_cam * ft
            o_cam = jnp.concatenate([p_lens, jnp.zeros_like(p_lens[..., :1])], axis=-1)
            d_cam = p_focus - o_cam
        # normalize + to world
        d_cam = d_cam / jnp.linalg.norm(d_cam, axis=-1, keepdims=True)
    else:
        o_cam = jnp.stack(
            [sx * cam.screen_scale, sy * cam.screen_scale, jnp.zeros_like(sx)], axis=-1
        )
        d_cam = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32), o_cam.shape)

    R = cam.cam_to_world[:3, :3]
    t = cam.cam_to_world[:3, 3]
    o = o_cam @ R.T + t
    d = d_cam @ R.T
    return o, d
