"""Live viewer bridge: SIBR-compatible TCP protocol.

Capability parity: reference gaussian_renderer/network_gui.py:26-86 — a
non-blocking listener polled each training iteration; the viewer sends a
length-prefixed JSON message with resolution, FoV, near/far, row-major
transposed view / view-projection matrices (with the SIBR y/z sign flips)
and training toggles; the trainer replies with raw RGB bytes plus a
length-prefixed verification string.

The wire protocol is preserved exactly so existing SIBR remote viewers work;
the camera is converted into this framework's column-vector Camera pytree.
"""

from __future__ import annotations

import json
import socket
from typing import Optional, Tuple

import numpy as np

from skyfall_gs_tpu.core.camera import Camera


class NetworkGUI:
    def __init__(self, host: str = "127.0.0.1", port: int = 6009):
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)
        self.conn: Optional[socket.socket] = None

    def try_connect(self) -> None:
        if self.conn is not None:
            return
        try:
            self.conn, addr = self.listener.accept()
            self.conn.settimeout(None)
            print(f"viewer connected from {addr}")
        except (BlockingIOError, socket.timeout, OSError):
            pass

    def _read_message(self) -> dict:
        raw_len = self._recv_exact(4)
        n = int.from_bytes(raw_len, "little")
        return json.loads(self._recv_exact(n).decode("utf-8"))

    def _recv_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("viewer disconnected")
            buf += chunk
        return buf

    def receive(self) -> Tuple[Optional[Camera], dict]:
        """Read one viewer request.  Returns (camera or None, toggles)."""
        msg = self._read_message()
        width, height = msg["resolution_x"], msg["resolution_y"]
        toggles = {
            "train": bool(msg.get("train", True)),
            "keep_alive": bool(msg.get("keep_alive", False)),
            "scaling_modifier": float(msg.get("scaling_modifier", 1.0)),
        }
        if width == 0 or height == 0:
            return None, toggles

        fovy, fovx = msg["fov_y"], msg["fov_x"]
        znear, zfar = msg["z_near"], msg["z_far"]
        # SIBR sends row-major transposed matrices with y/z column flips.
        wv_t = np.array(msg["view_matrix"], np.float32).reshape(4, 4)
        wv_t[:, 1] *= -1
        wv_t[:, 2] *= -1
        fp_t = np.array(msg["view_projection_matrix"], np.float32).reshape(4, 4)
        fp_t[:, 1] *= -1
        # transpose back to column-vector convention
        world_view = wv_t.T
        full_proj = fp_t.T
        c2w = np.linalg.inv(world_view.astype(np.float64))

        import jax.numpy as jnp
        import math

        cam = Camera(
            world_view=jnp.asarray(world_view),
            full_proj=jnp.asarray(full_proj),
            cam_center=jnp.asarray(c2w[:3, 3].astype(np.float32)),
            tan_fovx=jnp.float32(math.tan(fovx / 2)),
            tan_fovy=jnp.float32(math.tan(fovy / 2)),
            focal_x=jnp.float32(width / (2 * math.tan(fovx / 2))),
            focal_y=jnp.float32(height / (2 * math.tan(fovy / 2))),
            cx=jnp.float32(0.0),
            cy=jnp.float32(0.0),
            uid=jnp.int32(0),
            znear=float(znear),
            zfar=float(zfar),
            width=int(width),
            height=int(height),
        )
        return cam, toggles

    def send(self, image: Optional[np.ndarray], verify: str) -> None:
        """Send an (H, W, 3) float [0,1] frame (or None) + verify string."""
        if image is not None:
            data = (np.clip(image, 0, 1) * 255).astype(np.uint8).tobytes()
            self.conn.sendall(data)
        self.conn.sendall(len(verify).to_bytes(4, "little"))
        self.conn.sendall(verify.encode("ascii"))

    def drop(self) -> None:
        if self.conn is not None:
            try:
                self.conn.close()
            except OSError:
                pass
            self.conn = None

    def poll(self, render_fn, source_path: str, training_active: bool) -> bool:
        """One training-loop poll (reference train.py:143-156 semantics).

        render_fn(camera, scaling_modifier) -> (H, W, 3) image or None.
        Returns True while the loop should keep servicing the viewer.
        """
        if self.conn is None:
            self.try_connect()
        while self.conn is not None:
            try:
                cam, toggles = self.receive()
                image = None
                if cam is not None:
                    image = render_fn(cam, toggles["scaling_modifier"])
                self.send(np.asarray(image) if image is not None else None,
                          source_path)
                if toggles["train"] and (training_active
                                         or not toggles["keep_alive"]):
                    break
            except Exception:
                self.drop()
        return True
