"""Camera model: a jit-friendly pytree plus host-side constructors.

Capability parity: reference ``scene/cameras.py`` (Camera:17-79, MiniCam:81-93)
and ``utils/camera_utils.py`` (look_at_to_c2w:131-165,
gen_idu_orbit_camera:167-227).

The ``Camera`` pytree carries only the quantities the renderer and losses
need; images/masks/depths live in the dataset layer as plain arrays so a
camera can be vmapped/sharded independently of its pixels.  Width/height are
static (pytree aux data) because they determine compiled shapes.
"""

from __future__ import annotations

import math
from typing import List, Sequence

import jax.numpy as jnp
import numpy as np
from flax import struct

from skyfall_gs_tpu.core.transforms import projection_matrix, world_to_view


@struct.dataclass
class Camera:
    """A pinhole camera in column-vector convention (x_cam = W @ [x; 1])."""

    world_view: jnp.ndarray  # (4, 4) world -> camera
    full_proj: jnp.ndarray   # (4, 4) world -> clip (P @ W)
    cam_center: jnp.ndarray  # (3,) camera position in world space
    tan_fovx: jnp.ndarray    # scalar
    tan_fovy: jnp.ndarray    # scalar
    focal_x: jnp.ndarray     # scalar, pixels
    focal_y: jnp.ndarray     # scalar, pixels
    cx: jnp.ndarray          # scalar, normalized principal-point shift
    cy: jnp.ndarray          # scalar, normalized principal-point shift
    uid: jnp.ndarray         # scalar int32 — appearance-embedding index
    znear: float = struct.field(pytree_node=False, default=0.01)
    zfar: float = struct.field(pytree_node=False, default=100.0)
    width: int = struct.field(pytree_node=False, default=0)
    height: int = struct.field(pytree_node=False, default=0)


def make_camera(
    R: np.ndarray,
    T: np.ndarray,
    fov_x: float,
    fov_y: float,
    width: int,
    height: int,
    cx: float = 0.0,
    cy: float = 0.0,
    uid: int = 0,
    znear: float = 0.01,
    zfar: float = 100.0,
) -> Camera:
    """Build a Camera from COLMAP-style extrinsics.

    Args:
        R: (3, 3) camera-to-world rotation (the transposed world-to-camera
           rotation, as produced by COLMAP-style readers).
        T: (3,) world-to-camera translation.
        fov_x/fov_y: field of view in radians.
        cx/cy: normalized principal-point shift in NDC units.
    """
    w2c = world_to_view(R, T)
    proj = projection_matrix(znear, zfar, fov_x, fov_y, cx, cy)
    full = (proj @ w2c).astype(np.float32)
    c2w = np.linalg.inv(w2c.astype(np.float64))
    center = c2w[:3, 3].astype(np.float32)
    return Camera(
        world_view=jnp.asarray(w2c),
        full_proj=jnp.asarray(full),
        cam_center=jnp.asarray(center),
        tan_fovx=jnp.float32(math.tan(fov_x / 2.0)),
        tan_fovy=jnp.float32(math.tan(fov_y / 2.0)),
        focal_x=jnp.float32(width / (2.0 * math.tan(fov_x / 2.0))),
        focal_y=jnp.float32(height / (2.0 * math.tan(fov_y / 2.0))),
        cx=jnp.float32(cx),
        cy=jnp.float32(cy),
        uid=jnp.int32(uid),
        znear=znear,
        zfar=zfar,
        width=int(width),
        height=int(height),
    )


def camera_from_c2w(
    c2w: np.ndarray,
    fov_x: float,
    fov_y: float,
    width: int,
    height: int,
    **kwargs,
) -> Camera:
    """Build a Camera from a COLMAP-convention camera-to-world matrix."""
    w2c = np.linalg.inv(np.asarray(c2w, np.float64))
    R = w2c[:3, :3].T
    T = w2c[:3, 3]
    return make_camera(R, T, fov_x, fov_y, width, height, **kwargs)


def band_camera(camera: Camera, band: int, num_bands: int) -> Camera:
    """An exact sub-camera for a horizontal image band.

    Rendering band ``k`` of ``num_bands`` with the returned camera produces
    exactly rows [k*Hb, (k+1)*Hb) of the full render (same world rays): the
    band keeps focal lengths, shrinks the vertical FoV, and shifts the
    principal point so pixel (x, y) maps to global (x, y + k*Hb).  This is
    the crop primitive behind tile-parallel multi-device rendering.

    Requires H divisible by num_bands (pad the render height otherwise).
    """
    h = camera.height
    if h % num_bands != 0:
        raise ValueError(f"height {h} not divisible by {num_bands} bands")
    hb = h // num_bands
    cy = float(camera.cy)
    # pixel'_y = pixel_y - band*hb  =>  cy' below (derivation in docstring).
    cy_new = ((cy + 1.0) * h - 2.0 * band * hb) / hb - 1.0
    tan_fovy_new = float(camera.tan_fovy) * hb / h
    fov_y_new = 2.0 * math.atan(tan_fovy_new)
    fov_x = 2.0 * math.atan(float(camera.tan_fovx))
    w2c = np.asarray(camera.world_view, np.float64)
    proj = projection_matrix(camera.znear, camera.zfar, fov_x, fov_y_new,
                             float(camera.cx), cy_new)
    return Camera(
        world_view=jnp.asarray(w2c, jnp.float32),
        full_proj=jnp.asarray(proj @ w2c, jnp.float32),
        cam_center=camera.cam_center,
        tan_fovx=camera.tan_fovx,
        tan_fovy=jnp.float32(tan_fovy_new),
        focal_x=camera.focal_x,
        focal_y=camera.focal_y,
        cx=camera.cx,
        cy=jnp.float32(cy_new),
        uid=camera.uid,
        znear=camera.znear,
        zfar=camera.zfar,
        width=camera.width,
        height=hb,
    )


def look_at_c2w(eye: Sequence[float], target: Sequence[float],
                up: Sequence[float] = (0.0, 0.0, 1.0)) -> np.ndarray:
    """Camera-to-world matrix looking from ``eye`` at ``target``.

    Built in OpenGL convention then flipped to COLMAP (+z forward, +y down),
    matching reference utils/camera_utils.py:131-165.
    """
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    up = np.asarray(up, np.float64)
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    true_up = true_up / np.linalg.norm(true_up)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = true_up
    c2w[:3, 2] = -fwd
    c2w[:3, 3] = eye
    c2w[:3, 1:3] *= -1.0  # OpenGL -> COLMAP
    return c2w


def orbit_cameras(
    target: Sequence[float],
    elevation_deg: float,
    radius: float,
    num_cams: int = 6,
    num_samples: int = 1,
    width: int = 512,
    height: int = 512,
    fov_deg: float = 60.0,
    uid_base: int = 1000,
    uids: Sequence[int] | None = None,
) -> List[Camera]:
    """Generate a ring of cameras orbiting ``target`` at a given elevation.

    Each of the ``num_cams`` azimuth-uniform viewpoints is repeated
    ``num_samples`` times (parity with gen_idu_orbit_camera, reference
    utils/camera_utils.py:167-227).  By default view ``i`` gets
    ``uid = uid_base + i`` with the samples sharing the ring index's uid
    pattern of the reference (flat index when uids is None).
    """
    target = np.asarray(target, np.float64)
    fov = math.radians(fov_deg)
    phi = math.radians(elevation_deg)
    cams: List[Camera] = []
    flat = 0
    for i in range(num_cams):
        theta = 2.0 * math.pi * i / num_cams
        eye = target + radius * np.array(
            [math.cos(theta) * math.cos(phi),
             math.sin(theta) * math.cos(phi),
             math.sin(phi)]
        )
        c2w = look_at_c2w(eye, target)
        for _ in range(num_samples):
            uid = uids[flat] if uids is not None else uid_base + flat
            cams.append(
                camera_from_c2w(c2w, fov, fov, width, height, uid=int(uid))
            )
            flat += 1
    return cams
