"""Training / validation datasets (numpy host pipeline, torch-free).

Parity target: the fork's dataloader (DCVC-HEM/dataloader.py:21-289):
VimeoDataset (septuplet list, random crop 256, hflip, shared per-gop
augmentation seed) and VideoTestData (per-GOP items over the standard test
sets). Batches are NHWC float32 in [0, 1], clip-shaped [B, T, H, W, 3].
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np
from PIL import Image


class VimeoDataset:
    """Vimeo-90k septuplet clips with shared-seed crop + hflip."""

    def __init__(self, root: str, list_file: str = "sep_trainlist.txt",
                 frames: int = 7, crop: int = 256, seed: int = 0):
        self.root = Path(root)
        list_path = self.root / list_file
        if list_path.is_file():
            with open(list_path) as f:
                self.items = [ln.strip() for ln in f if ln.strip()]
        else:  # fall back to directory scan
            seq_dir = self.root / "sequences"
            base = seq_dir if seq_dir.is_dir() else self.root
            self.items = sorted(
                str(p.relative_to(base))
                for p in base.glob("*/*") if p.is_dir())
            self.root = base
        self.frames = frames
        self.crop = crop
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.items)

    def _load_clip(self, item: str, rng: np.random.Generator) -> np.ndarray:
        base = self.root / "sequences" / item
        if not base.is_dir():
            base = self.root / item
        frames = []
        for i in range(1, self.frames + 1):
            img = Image.open(base / f"im{i}.png").convert("RGB")
            frames.append(np.asarray(img, dtype=np.float32) / 255.0)
        clip = np.stack(frames)  # [T, H, W, 3]
        T, H, W, _ = clip.shape
        c = self.crop
        # shared per-gop augmentation (dataloader.py: same seed for all frames)
        top = int(rng.integers(0, max(H - c, 0) + 1))
        left = int(rng.integers(0, max(W - c, 0) + 1))
        clip = clip[:, top:top + c, left:left + c]
        if rng.random() < 0.5:
            clip = clip[:, :, ::-1]
        if rng.random() < 0.5:
            clip = clip[::-1]  # temporal flip (common aug)
        return np.ascontiguousarray(clip)

    def batches(self, batch_size: int, steps: int, num_workers: int = 4):
        """Yield [B, T, c, c, 3] batches for ``steps`` iterations."""
        with ThreadPoolExecutor(num_workers) as pool:
            for _ in range(steps):
                picks = self.rng.choice(len(self.items), batch_size)
                seeds = self.rng.integers(0, 2 ** 31, batch_size)
                clips = list(pool.map(
                    lambda iv: self._load_clip(
                        self.items[iv[0]], np.random.default_rng(iv[1])),
                    zip(picks, seeds)))
                yield np.stack(clips)


class SyntheticClips:
    """Deterministic synthetic clips for harness smoke tests (no dataset)."""

    def __init__(self, crop: int = 64, frames: int = 3, seed: int = 0):
        self.crop, self.frames = crop, frames
        self.rng = np.random.default_rng(seed)

    def batches(self, batch_size: int, steps: int, **_):
        c, T = self.crop, self.frames
        for _ in range(steps):
            base = self.rng.random((batch_size, 1, c // 8 + 2, c // 8 + 2, 3))
            big = np.repeat(np.repeat(base, 8, axis=2), 8, axis=3)
            clip = np.concatenate(
                [big[:, :, s:s + c, s:s + c] for s in range(T)], axis=1)
            clip += self.rng.normal(0, 0.02, clip.shape)
            yield np.clip(clip, 0, 1).astype(np.float32)
