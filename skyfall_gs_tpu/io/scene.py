"""Scene container: readers -> device-ready camera/image bundles.

Capability parity: reference scene/__init__.py (Scene: type sniffing, train/
test camera lists per resolution scale, cameras_extent, input.ply +
cameras.json dumps) and utils/camera_utils.py:25-90 (loadCam resolution
logic: divisor in {1,2,4,8,...} or -1 -> cap width at 1600, uid offsets for
IDU cameras).

TPU re-design: instead of per-camera GPU tensors, views are grouped by
resolution and stacked into struct-of-array batches (a stacked Camera pytree
plus (M, H, W, C) image/mask/depth arrays) that live in device HBM — one
dynamic-index gather fetches a random view inside the jitted train step with
no host->device traffic in steady state.
"""

from __future__ import annotations

import json
import os
import random
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from skyfall_gs_tpu.core.camera import Camera, make_camera
from skyfall_gs_tpu.io.readers import (
    SCENE_READERS,
    CameraRecord,
    RawScene,
    detect_scene_type,
    store_point_ply,
)


def _resize_area(img: np.ndarray, w: int, h: int) -> np.ndarray:
    import cv2

    return cv2.resize(img, (w, h), interpolation=cv2.INTER_AREA)


def resolve_resolution(orig_w: int, orig_h: int, resolution: int,
                       resolution_scale: float = 1.0) -> tuple[int, int]:
    """Reference loadCam logic (utils/camera_utils.py:29-46)."""
    if resolution in (1, 2, 4, 8, 16, 32, 64):
        return (round(orig_w / (resolution_scale * resolution)),
                round(orig_h / (resolution_scale * resolution)))
    if resolution == -1:
        global_down = orig_w / 1600 if orig_w > 1600 else 1.0
    else:
        global_down = orig_w / resolution
    scale = float(global_down) * float(resolution_scale)
    return int(orig_w / scale), int(orig_h / scale)


@dataclass
class View:
    """One device-ready view: camera + ground-truth arrays."""

    camera: Camera
    image: Optional[np.ndarray] = None   # (H, W, 3)
    mask: Optional[np.ndarray] = None    # (H, W)
    depth: Optional[np.ndarray] = None   # (H, W)
    image_name: str = ""


def record_to_view(rec: CameraRecord, resolution: int = -1,
                   resolution_scale: float = 1.0, uid: Optional[int] = None,
                   resize: bool = True) -> View:
    if rec.image is not None and resize:
        w, h = resolve_resolution(rec.width, rec.height, resolution, resolution_scale)
    else:
        w, h = rec.width, rec.height
    image = rec.image
    mask = rec.mask
    depth = rec.depth
    if image is not None and (w, h) != (rec.width, rec.height):
        image = _resize_area(image, w, h)
        if mask is not None:
            mask = (_resize_area(mask, w, h) > 0.5).astype(np.float32)
        if depth is not None:
            depth = _resize_area(depth, w, h)
    cam = make_camera(
        rec.R, rec.T, rec.fov_x, rec.fov_y, w, h,
        cx=rec.cx, cy=rec.cy, uid=rec.uid if uid is None else uid,
    )
    return View(camera=cam, image=image, mask=mask, depth=depth,
                image_name=rec.image_name)


@dataclass
class ViewGroup:
    """Views of identical resolution stacked for on-device random access."""

    cameras: Camera                       # stacked pytree, leading dim M
    images: jnp.ndarray                   # (M, H, W, 3)
    masks: jnp.ndarray                    # (M, H, W)
    depths: jnp.ndarray                   # (M, H, W)
    has_depth: bool
    names: List[str]

    @property
    def size(self) -> int:
        return self.images.shape[0]

    def select(self, i):
        """Gather view ``i`` (traced index OK) as a single-view pytree."""
        cam = jax.tree.map(lambda x: x[i], self.cameras)
        return cam, self.images[i], self.masks[i], self.depths[i]


def stack_views(views: Sequence[View]) -> ViewGroup:
    cams = jax.tree.map(lambda *xs: jnp.stack(xs), *[v.camera for v in views])
    h, w = views[0].image.shape[:2]
    images = jnp.asarray(np.stack([v.image for v in views]))
    masks = jnp.asarray(np.stack([
        v.mask if v.mask is not None else np.ones((h, w), np.float32)
        for v in views
    ]))
    has_depth = any(v.depth is not None for v in views)
    depths = jnp.asarray(np.stack([
        v.depth if v.depth is not None else np.zeros((h, w), np.float32)
        for v in views
    ]))
    return ViewGroup(cameras=cams, images=images, masks=masks, depths=depths,
                     has_depth=has_depth, names=[v.image_name for v in views])


@dataclass
class SceneData:
    """Everything the trainers need for one scene."""

    source_path: str
    scene_type: str
    points: np.ndarray
    colors: np.ndarray
    train_views: List[View]
    test_views: List[View]
    cameras_extent: float
    train_groups: Dict[tuple, ViewGroup] = field(default_factory=dict)
    idu_views: List[View] = field(default_factory=list)

    @property
    def num_train(self) -> int:
        return len(self.train_views)

    def build_groups(self) -> None:
        """Group train views by resolution and stack them on device."""
        groups: Dict[tuple, List[View]] = {}
        for v in self.train_views:
            groups.setdefault((v.camera.height, v.camera.width), []).append(v)
        self.train_groups = {k: stack_views(vs) for k, vs in groups.items()}


def load_scene(
    source_path: str,
    resolution: int = -1,
    resolution_scales: Sequence[float] = (1.0,),
    eval_split: bool = False,
    white_background: bool = False,
    load_allres: bool = False,
    model_path: Optional[str] = None,
    shuffle: bool = True,
    seed: int = 0,
) -> SceneData:
    """Load a scene directory into device-ready structures.

    Side effects matching the reference Scene: copies the input point cloud
    to ``model_path/input.ply`` and dumps ``model_path/cameras.json``.
    """
    scene_type = detect_scene_type(source_path)
    reader = SCENE_READERS[scene_type]
    if scene_type == "satellite":
        raw: RawScene = reader(source_path, eval_split=eval_split)
    elif scene_type == "colmap":
        raw = reader(source_path, eval_split=eval_split)
    elif scene_type == "multiscale":
        raw = reader(source_path, white_background=white_background,
                     eval_split=eval_split, load_allres=load_allres)
    else:
        raw = reader(source_path, white_background=white_background,
                     eval_split=eval_split)

    if shuffle:
        rng = random.Random(seed)
        rng.shuffle(raw.train_cameras)

    scale = resolution_scales[0]
    train_views = [
        record_to_view(r, resolution, scale, uid=i)
        for i, r in enumerate(raw.train_cameras)
    ]
    test_views = [
        record_to_view(r, resolution, scale, uid=i)
        for i, r in enumerate(raw.test_cameras)
    ]

    if model_path:
        os.makedirs(model_path, exist_ok=True)
        store_point_ply(os.path.join(model_path, "input.ply"),
                        raw.points, raw.colors * 255.0)
        cams_json = []
        for i, v in enumerate(train_views + test_views):
            cams_json.append(_camera_to_json(i, v))
        with open(os.path.join(model_path, "cameras.json"), "w") as f:
            json.dump(cams_json, f)

    scene = SceneData(
        source_path=source_path,
        scene_type=scene_type,
        points=raw.points,
        colors=raw.colors,
        train_views=train_views,
        test_views=test_views,
        cameras_extent=float(raw.radius),
    )
    scene.build_groups()
    return scene


def _camera_to_json(idx: int, view: View) -> dict:
    cam = view.camera
    w2c = np.asarray(cam.world_view)
    c2w = np.linalg.inv(w2c)
    h, w = cam.height, cam.width
    return {
        "id": idx,
        "img_name": view.image_name,
        "width": w,
        "height": h,
        "position": c2w[:3, 3].tolist(),
        "rotation": [row.tolist() for row in c2w[:3, :3]],
        "fx": float(cam.focal_x),
        "fy": float(cam.focal_y),
        "cx": float(cam.cx),
        "cy": float(cam.cy),
    }
