"""Gaussian point-cloud PLY snapshots (standard + fused formats).

Capability parity: reference scene/gaussian_model.py:402-547 —
  * save_ply: x y z nx ny nz f_dc_* f_rest_* opacity scale_* rot_* filter_3D
    with f_rest stored channel-major (transpose(1,2).flatten, :423-424);
  * save_fused_ply: bakes the 3D filter into scales/opacity (and optionally
    the appearance MLP into SH colors) and drops the filter attribute
    (:438-481) — the viewer-compatible export;
  * load_ply incl. filter_3D and SH-degree detection from the f_rest count
    (:503-547, render_video_from_ply.py:169-189).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from skyfall_gs_tpu.io.ply import read_ply, write_ply
from skyfall_gs_tpu.model.appearance import apply_appearance
from skyfall_gs_tpu.model.gaussians import (
    GaussianModelState,
    opacity_with_3d_filter,
    scaling_with_3d_filter,
)
from skyfall_gs_tpu.utils.general import inverse_sigmoid


def _alive_np(state: GaussianModelState):
    return np.asarray(state.aux.alive)


def _gather_arrays(state: GaussianModelState):
    p = state.params
    keep = _alive_np(state)
    return {
        "xyz": np.asarray(p.xyz)[keep],
        "f_dc": np.asarray(p.features_dc)[keep],     # (N, 1, 3)
        "f_rest": np.asarray(p.features_rest)[keep],  # (N, K-1, 3)
        "opacity": np.asarray(p.opacity)[keep],
        "scaling": np.asarray(p.scaling)[keep],
        "rotation": np.asarray(p.rotation)[keep],
        "filter_3d": np.asarray(state.aux.filter_3d)[keep],
    }


def _props_from(xyz, f_dc_flat, f_rest_flat, opacity, scaling, rotation,
                filter_3d=None):
    n = xyz.shape[0]
    props = {
        "x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2],
        "nx": np.zeros(n, np.float32), "ny": np.zeros(n, np.float32),
        "nz": np.zeros(n, np.float32),
    }
    order = ["x", "y", "z", "nx", "ny", "nz"]
    for i in range(f_dc_flat.shape[1]):
        props[f"f_dc_{i}"] = f_dc_flat[:, i]
        order.append(f"f_dc_{i}")
    for i in range(f_rest_flat.shape[1]):
        props[f"f_rest_{i}"] = f_rest_flat[:, i]
        order.append(f"f_rest_{i}")
    props["opacity"] = opacity[:, 0]
    order.append("opacity")
    for i in range(scaling.shape[1]):
        props[f"scale_{i}"] = scaling[:, i]
        order.append(f"scale_{i}")
    for i in range(rotation.shape[1]):
        props[f"rot_{i}"] = rotation[:, i]
        order.append(f"rot_{i}")
    if filter_3d is not None:
        props["filter_3D"] = filter_3d
        order.append("filter_3D")
    return props, order


def save_gaussian_ply(state: GaussianModelState, path: str) -> None:
    """Standard snapshot incl. the filter_3D attribute."""
    a = _gather_arrays(state)
    # channel-major flattening: (N, K, 3) -> (N, 3, K) -> (N, 3K)
    f_dc = a["f_dc"].transpose(0, 2, 1).reshape(len(a["xyz"]), -1)
    f_rest = a["f_rest"].transpose(0, 2, 1).reshape(len(a["xyz"]), -1)
    props, order = _props_from(a["xyz"], f_dc, f_rest, a["opacity"],
                               a["scaling"], a["rotation"], a["filter_3d"])
    write_ply(path, props, order)


def save_fused_ply(state: GaussianModelState, path: str,
                   color_mapped: bool = False) -> None:
    """Viewer-compatible export with the 3D filter baked in."""
    p = state.params
    keep = _alive_np(state)
    n = int(keep.sum())
    xyz = np.asarray(p.xyz)[keep]

    if state.appearance.enabled and color_mapped and p.appearance_mlp is not None:
        uid = min(p.appearance_embeddings.shape[0] - 1, 6)
        emb = p.appearance_embeddings[uid]
        toned = apply_appearance(p.appearance_mlp, p.embeddings, emb, p.features)
        toned = np.asarray(jnp.clip(toned, None, 1.0))[keep]  # (N, K, 3)
        f_dc = toned[:, :1, :].transpose(0, 2, 1).reshape(n, -1)
        f_rest = toned[:, 1:, :].transpose(0, 2, 1).reshape(n, -1)
    else:
        f_dc = np.asarray(p.features_dc)[keep].transpose(0, 2, 1).reshape(n, -1)
        f_rest = np.asarray(p.features_rest)[keep].transpose(0, 2, 1).reshape(n, -1)

    op_fused = np.asarray(
        inverse_sigmoid(jnp.clip(
            opacity_with_3d_filter(p, state.aux.filter_3d), 1e-7, 1 - 1e-7))
    )[keep][:, None]
    scale_fused = np.asarray(
        jnp.log(scaling_with_3d_filter(p, state.aux.filter_3d))
    )[keep]
    rotation = np.asarray(p.rotation)[keep]

    props, order = _props_from(xyz, f_dc, f_rest, op_fused, scale_fused,
                               rotation, filter_3d=None)
    write_ply(path, props, order)


SH_C0 = 0.28209479177387814


def save_splat(state: GaussianModelState, path: str) -> None:
    """Export to the ``.splat`` web-viewer format (beyond reference parity:
    the reference targets SIBR/PLY only; .splat is the de-facto format of
    browser viewers — antimatter15/splat and descendants).

    32 bytes per splat: position f32x3, LINEAR scale f32x3 (3D filter
    baked, like the fused PLY), color rgba u8x4 (SH band 0 -> rgb, fused
    opacity -> alpha), rotation u8x4 (normalized quaternion, component*128
    +128, stored in the PLY rot_0..rot_3 order).  Splats are sorted by
    descending opacity*volume importance so progressive loaders draw the
    dominant structure first.
    """
    p = state.params
    keep = _alive_np(state)
    xyz = np.asarray(p.xyz)[keep].astype(np.float32)
    scale = np.asarray(
        scaling_with_3d_filter(p, state.aux.filter_3d))[keep].astype(
        np.float32)
    opac = np.asarray(
        opacity_with_3d_filter(p, state.aux.filter_3d))[keep].astype(
        np.float32)
    rgb = 0.5 + SH_C0 * np.asarray(p.features_dc)[keep][:, 0, :]
    quat = np.asarray(p.rotation)[keep].astype(np.float32)
    quat = quat / np.maximum(np.linalg.norm(quat, axis=1, keepdims=True),
                             1e-12)

    order = np.argsort(-opac * scale.prod(axis=1))
    n = xyz.shape[0]
    rec = np.zeros((n, 32), np.uint8)
    rec[:, 0:12] = xyz[order].view(np.uint8).reshape(n, 12)
    rec[:, 12:24] = scale[order].view(np.uint8).reshape(n, 12)
    rec[:, 24:27] = np.clip(rgb[order] * 255.0, 0, 255).astype(np.uint8)
    rec[:, 27] = np.clip(opac[order] * 255.0, 0, 255).astype(np.uint8)
    rec[:, 28:32] = np.clip(quat[order] * 128.0 + 128.0, 0, 255).astype(
        np.uint8)
    with open(path, "wb") as f:
        f.write(rec.tobytes())


def load_splat(path: str) -> dict:
    """Read a .splat file back into float arrays (testing / tooling)."""
    raw = np.fromfile(path, np.uint8)
    if raw.size % 32:
        raise ValueError(f"{path}: size {raw.size} is not a multiple of 32")
    rec = raw.reshape(-1, 32)
    return {
        "xyz": rec[:, 0:12].copy().view(np.float32),
        "scale": rec[:, 12:24].copy().view(np.float32),
        "rgb": rec[:, 24:27].astype(np.float32) / 255.0,
        "opacity": rec[:, 27].astype(np.float32) / 255.0,
        "rotation": (rec[:, 28:32].astype(np.float32) - 128.0) / 128.0,
    }


def detect_sh_degree(props: dict) -> int:
    n_rest = len([k for k in props if k.startswith("f_rest_")])
    k_total = n_rest // 3 + 1
    deg = int(round(k_total ** 0.5)) - 1
    if (deg + 1) ** 2 != k_total:
        raise ValueError(f"f_rest count {n_rest} is not a valid SH layout")
    return deg


def load_gaussian_ply(path: str):
    """Load a (standard or fused) gaussian PLY.

    Returns:
        dict with numpy arrays xyz (N,3), features_dc (N,1,3), features_rest
        (N,K-1,3), opacity (N,1), scaling (N,3), rotation (N,4), filter_3d
        (N,) or None, and sh_degree.
    """
    v = read_ply(path)
    n = len(v["x"])
    deg = detect_sh_degree(v)
    k = (deg + 1) ** 2
    xyz = np.stack([v["x"], v["y"], v["z"]], axis=1).astype(np.float32)
    f_dc = np.stack([v[f"f_dc_{i}"] for i in range(3)], axis=1)
    f_dc = f_dc.reshape(n, 3, 1).transpose(0, 2, 1).astype(np.float32)
    rest_names = sorted(
        (kk for kk in v if kk.startswith("f_rest_")),
        key=lambda s: int(s.split("_")[-1]),
    )
    f_rest = np.stack([v[kk] for kk in rest_names], axis=1)
    f_rest = f_rest.reshape(n, 3, k - 1).transpose(0, 2, 1).astype(np.float32)
    scaling = np.stack(
        [v[f"scale_{i}"] for i in range(3)], axis=1).astype(np.float32)
    rotation = np.stack(
        [v[f"rot_{i}"] for i in range(4)], axis=1).astype(np.float32)
    opacity = v["opacity"].reshape(n, 1).astype(np.float32)
    filter_3d = v.get("filter_3D")
    if filter_3d is not None:
        filter_3d = filter_3d.astype(np.float32)
    return {
        "xyz": xyz,
        "features_dc": f_dc,
        "features_rest": f_rest,
        "opacity": opacity,
        "scaling": scaling,
        "rotation": rotation,
        "filter_3d": filter_3d,
        "sh_degree": deg,
    }
