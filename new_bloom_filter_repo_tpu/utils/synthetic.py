"""Synthetic test-clip generation.

The reference CLI advertises a ``synthetic`` subcommand but its handler
reads arguments its subparser never defines and calls a generator that
does not exist (improved_video_compressor.py:1626-1643 vs :1778-1784 —
SURVEY.md §2 broken subcommands).  This is the working implementation:
a static textured scene, moving objects, and Gaussian sensor noise of a
chosen level, in BGR / RGB / YUV / grayscale.
"""

from __future__ import annotations

import numpy as np


def generate_frames(frame_count: int = 90, width: int = 640,
                    height: int = 480, noise: float = 1.0,
                    speed: float = 1.0, color_space: str = "BGR",
                    seed: int = 0):
    """Synthetic clip; returns a list of uint8 frames (HxWx3 or HxW)."""
    rng = np.random.default_rng(seed)
    gray = color_space.upper() in ("GRAY", "GREY", "MONO")
    shape = (height, width) if gray else (height, width, 3)
    base = rng.integers(20, 200, size=shape, dtype=np.uint8)

    frames = []
    for i in range(frame_count):
        f = base.astype(np.float32)
        if noise > 0:
            f = f + rng.normal(0.0, noise, size=shape)
        frame = np.clip(np.round(f), 0, 255).astype(np.uint8)
        # two moving objects
        x = int(20 + speed * 6 * i) % max(1, width - 80)
        y = int(14 + speed * 3 * i) % max(1, height - 60)
        if gray:
            frame[y:y + 48, x:x + 64] = 235
            frame[(height - y - 40):(height - y), x // 2:x // 2 + 40] = 16
        else:
            frame[y:y + 48, x:x + 64] = (30, 200, 240)
            frame[(height - y - 40):(height - y),
                  x // 2:x // 2 + 40] = (220, 60, 40)
        frames.append(frame)
    return frames
