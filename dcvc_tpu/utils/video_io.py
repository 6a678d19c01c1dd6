"""Frame readers/writers: PNG sequences, planar YUV420, raw RGB.

Parity target: DCVC-DC/src/utils/video_reader.py:45-161 / video_writer.py:
26-111 (im1.png / im00001.png auto-detect, 8/16-bit, skip_frame). Frames are
HWC float arrays in [0, 1] (reference uses CHW).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
from PIL import Image


class PNGReader:
    def __init__(self, src_path: str, width: int | None = None,
                 height: int | None = None, start_num: int = 1):
        self.src_path = src_path
        self.width, self.height = width, height
        self.current = start_num
        if Path(src_path, f"im{start_num}.png").is_file():
            self.pattern = "im{}.png"
        elif Path(src_path, f"im{start_num:05d}.png").is_file():
            self.pattern = "im{:05d}.png"
        elif Path(src_path, f"im{start_num:03d}.png").is_file():
            self.pattern = "im{:03d}.png"
        else:
            raise FileNotFoundError(f"no im*.png found under {src_path}")

    def read_one_frame(self) -> np.ndarray | None:
        path = Path(self.src_path, self.pattern.format(self.current))
        if not path.is_file():
            return None
        self.current += 1
        img = np.asarray(Image.open(path).convert("RGB"), dtype=np.float32) / 255.0
        return img  # HWC in [0, 1]

    def close(self):
        pass


class PNGWriter:
    def __init__(self, dst_path: str, width: int, height: int, start_num: int = 1):
        self.dst_path = dst_path
        self.current = start_num
        os.makedirs(dst_path, exist_ok=True)

    def write_one_frame(self, rgb: np.ndarray):
        """HWC float [0,1]."""
        arr = np.clip(np.rint(rgb * 255.0), 0, 255).astype(np.uint8)
        Image.fromarray(arr).save(
            Path(self.dst_path, f"im{self.current:05d}.png"))
        self.current += 1

    def close(self):
        pass


class YUVReader:
    """Planar YUV420, 8-bit."""

    def __init__(self, src_path: str, width: int, height: int, skip_frame: int = 0):
        self.width, self.height = width, height
        self.eof = False
        self._f = open(src_path, "rb")
        frame_bytes = width * height * 3 // 2
        if skip_frame:
            self._f.seek(frame_bytes * skip_frame)

    def read_one_frame(self, dst_format: str = "420"):
        w, h = self.width, self.height
        y = np.frombuffer(self._f.read(w * h), dtype=np.uint8)
        uv = np.frombuffer(self._f.read(w * h // 2), dtype=np.uint8)
        if y.size < w * h or uv.size < w * h // 2:
            self.eof = True
            return None, None
        y = y.reshape(h, w).astype(np.float32) / 255.0
        uv = uv.reshape(2, h // 2, w // 2).astype(np.float32) / 255.0
        if dst_format == "420":
            return y, uv
        raise ValueError(dst_format)

    def close(self):
        self._f.close()


class YUVWriter:
    def __init__(self, dst_path: str, width: int, height: int):
        if not dst_path.endswith(".yuv"):
            dst_path += ".yuv"
        os.makedirs(os.path.dirname(dst_path) or ".", exist_ok=True)
        self.width, self.height = width, height
        self._f = open(dst_path, "wb")

    def write_one_frame(self, y: np.ndarray, uv: np.ndarray):
        self._f.write(np.clip(np.rint(y * 255), 0, 255).astype(np.uint8).tobytes())
        self._f.write(np.clip(np.rint(uv * 255), 0, 255).astype(np.uint8).tobytes())

    def close(self):
        self._f.close()
