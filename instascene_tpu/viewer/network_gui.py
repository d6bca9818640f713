"""SIBR-compatible live-viewer TCP protocol.

Parity: reference gaussian_renderer/network_gui.py — non-blocking listener on
127.0.0.1:6009, length-prefixed JSON control messages from the viewer (camera
matrices in the reference's transposed-storage convention, which we transpose
back), raw RGB bytes + source-path + metrics JSON in reply."""

from __future__ import annotations

import json
import socket
import struct
import traceback

import numpy as np

from ..cameras import MiniCam


def _send_json(conn, data) -> None:
    payload = json.dumps(data).encode("utf-8")
    conn.sendall(struct.pack("I", len(payload)))
    conn.sendall(payload)


class NetworkGUI:
    def __init__(self, host: str = "127.0.0.1", port: int = 6009):
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)
        self.conn = None

    def try_connect(self, render_items) -> None:
        try:
            self.conn, _ = self.listener.accept()
            self.conn.settimeout(None)
            _send_json(self.conn, render_items)
        except (BlockingIOError, OSError):
            pass

    def _read(self):
        n = int.from_bytes(self.conn.recv(4), "little")
        return json.loads(self.conn.recv(n).decode("utf-8"))

    def receive(self):
        msg = self._read()
        width, height = msg["resolution_x"], msg["resolution_y"]
        if width == 0 or height == 0:
            return None, None, None, None, None
        try:
            # viewer sends the reference's transposed-storage matrices with
            # sign flips on columns 1,2 (network_gui.py:91-95)
            wvt = np.array(msg["view_matrix"], np.float32).reshape(4, 4)
            wvt[:, 1] *= -1
            wvt[:, 2] *= -1
            fpt = np.array(msg["view_projection_matrix"],
                           np.float32).reshape(4, 4)
            fpt[:, 1] *= -1
            cam = MiniCam(width, height, msg["fov_y"], msg["fov_x"],
                          msg["z_near"], msg["z_far"],
                          w2v=wvt.T, full_proj=fpt.T)
            return (cam, bool(msg["train"]), bool(msg["keep_alive"]),
                    msg["scaling_modifier"], msg["render_mode"])
        except Exception:
            traceback.print_exc()
            return None, None, None, None, None

    def send(self, image_bytes, verify: str, metrics) -> None:
        if image_bytes is not None:
            self.conn.sendall(image_bytes)
        self.conn.sendall(len(verify).to_bytes(4, "little"))
        self.conn.sendall(bytes(verify, "ascii"))
        _send_json(self.conn, metrics)

    def tick(self, trainer, pipe, dataset) -> None:
        """One viewer service round inside the training loop
        (reference train.py:162-185)."""
        if self.conn is None:
            self.try_connect(getattr(dataset, "render_items", ["RGB"]))
        while self.conn is not None:
            try:
                cam, do_training, keep_alive, scale_mod, _mode = self.receive()
                img_bytes = None
                if cam is not None:
                    from ..render import render
                    pkg = render(cam, trainer.params, pipe,
                                 trainer.bg, scaling_modifier=scale_mod)
                    img = np.asarray(pkg["render"])
                    img_bytes = memoryview(
                        (np.clip(img, 0, 1) * 255).astype(np.uint8).tobytes())
                metrics = {"#": int(trainer.params.n_alive()),
                           "loss": trainer.ema.get("loss", 0.0)}
                self.send(img_bytes, dataset.source_path, metrics)
                if do_training:
                    break
            except Exception:
                self.conn = None
