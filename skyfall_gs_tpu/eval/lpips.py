"""LPIPS perceptual distance in pure JAX (weight-gated).

Capability parity: the reference's vendored ``lpipsPyTorch`` (Alex/Squeeze/
VGG backbones + learned linear heads, lpipsPyTorch/modules/networks.py:12-96)
and the ``lpips`` pip package used by the optional photometric loss
(train.py:46,80-85,218-220) and eval suite (eval.py:298-302).

The metric: run both images through a frozen classification backbone,
channel-normalize each tap's activations, weight the squared differences
with learned 1x1 "lin" layers, spatially average, and sum over taps.

The backbone/lin weights are pretrained artifacts; this environment has no
network egress, so construction requires local checkpoints:
  * ``backbone_state``: a torch state dict of torchvision AlexNet or VGG16
    features (or a path to one);
  * ``lin_state``: the LPIPS linear-head state dict (``lin{i}.model.1.weight``).
Given those, everything runs as one jitted JAX function (conv stacks on the
MXU).  ``lpips_from_torch_files`` loads both from disk.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

# torchvision feature-stack layouts: (conv indices per tap block)
_ALEX_TAPS = ((0,), (3,), (6,), (8,), (10,))       # conv layers before each relu tap
_VGG_TAPS = ((0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28))
_ALEX_META = {  # layer index -> (stride, padding)
    0: (4, 2), 3: (1, 2), 6: (1, 1), 8: (1, 1), 10: (1, 1),
}

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b, stride=1, padding=1):
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + b


def _maxpool(x, window=2, stride=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1), "VALID")


def _alex_maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")


class LPIPS:
    """Functional LPIPS scorer over converted torch weights."""

    def __init__(self, net: str = "alex",
                 backbone_state: Optional[Dict] = None,
                 lin_state: Optional[Dict] = None):
        if backbone_state is None or lin_state is None:
            raise RuntimeError(
                "LPIPS requires pretrained backbone + linear-head weights; "
                "none are available locally (no network egress). Provide "
                "backbone_state/lin_state torch state dicts or use "
                "lpips_from_torch_files(...).")
        self.net = net
        sd = {k: np.asarray(v) for k, v in backbone_state.items()}

        def cw(i):
            # torch conv weight (O, I, H, W) -> HWIO
            return (jnp.asarray(sd[f"{i}.weight"].transpose(2, 3, 1, 0)),
                    jnp.asarray(sd[f"{i}.bias"]))

        taps = _ALEX_TAPS if net == "alex" else _VGG_TAPS
        self.convs = [[cw(i) for i in block] for block in taps]
        lsd = {k: np.asarray(v) for k, v in lin_state.items()}
        self.lins = [
            jnp.asarray(lsd[f"lin{i}.model.1.weight"][:, :, 0, 0].T)  # (C, 1)
            for i in range(len(taps))
        ]
        self._jitted = jax.jit(self._score)

    def _features(self, x):
        """x: (B, H, W, 3) in [-1, 1] -> list of tap activations."""
        x = (x - _SHIFT) / _SCALE
        feats = []
        h = x
        for bi, block in enumerate(self.convs):
            for li, (w, b) in enumerate(block):
                if self.net == "alex":
                    idx = _ALEX_TAPS[bi][li]
                    stride, pad = _ALEX_META[idx]
                    # torchvision alexnet pools only after blocks 0 and 1
                    if bi in (1, 2) and li == 0:
                        h = _alex_maxpool(h)
                    h = _conv(h, w, b, stride, pad)
                else:
                    if bi > 0 and li == 0:
                        h = _maxpool(h)
                    h = _conv(h, w, b, 1, 1)
                h = jax.nn.relu(h)
            feats.append(h)
        return feats

    def _score(self, a, b):
        fa = self._features(a)
        fb = self._features(b)
        total = 0.0
        for xa, xb, lin in zip(fa, fb, self.lins):
            na = xa / (jnp.linalg.norm(xa, axis=-1, keepdims=True) + 1e-10)
            nb = xb / (jnp.linalg.norm(xb, axis=-1, keepdims=True) + 1e-10)
            d = (na - nb) ** 2
            total = total + jnp.mean(d @ lin, axis=(1, 2, 3))
        return total

    def __call__(self, img0: np.ndarray, img1: np.ndarray) -> float:
        """(H, W, 3) float [0,1] images -> LPIPS distance."""
        a = jnp.asarray(img0)[None] * 2.0 - 1.0
        b = jnp.asarray(img1)[None] * 2.0 - 1.0
        return float(self._jitted(a, b)[0])


def lpips_from_torch_files(backbone_path: str, lin_path: str,
                           net: str = "alex") -> LPIPS:
    import torch

    backbone = torch.load(backbone_path, map_location="cpu")
    lin = torch.load(lin_path, map_location="cpu")
    to_np = lambda d: {k: v.numpy() for k, v in d.items()}
    return LPIPS(net=net, backbone_state=to_np(backbone),
                 lin_state=to_np(lin))


def lpips_from_local_packages(net: str = "alex") -> LPIPS:
    """Build from torchvision/lpips caches if they exist on this machine."""
    try:
        import torchvision.models as tvm

        if net == "alex":
            model = tvm.alexnet(weights=tvm.AlexNet_Weights.IMAGENET1K_V1)
        else:
            model = tvm.vgg16(weights=tvm.VGG16_Weights.IMAGENET1K_V1)
        backbone = {k.replace("features.", ""): v.detach().numpy()
                    for k, v in model.features.state_dict().items()}
    except Exception as e:
        raise RuntimeError(f"torchvision backbone unavailable locally: {e}")
    try:
        import lpips as lpips_pkg  # noqa: F401
        import os

        base = os.path.join(os.path.dirname(lpips_pkg.__file__), "weights",
                            "v0.1", f"{net}.pth")
        import torch

        lin = {k: v.numpy() for k, v in torch.load(base, map_location="cpu").items()}
    except Exception as e:
        raise RuntimeError(f"lpips linear heads unavailable locally: {e}")
    return LPIPS(net=net, backbone_state=backbone, lin_state=lin)
