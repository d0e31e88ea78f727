"""Video assembly utilities (frames -> mp4, side-by-side, wipes).

Parity: reference utils/video.py roles. Uses imageio's ffmpeg backend when
present; falls back to writing a frame directory + an index file so nothing
in the pipeline hard-fails without ffmpeg.
"""

from __future__ import annotations

import os

import numpy as np


def _to_uint8(frame: np.ndarray) -> np.ndarray:
    f = np.clip(np.asarray(frame), 0.0, 1.0)
    f = (f * 255).astype(np.uint8)
    h, w = f.shape[:2]
    return f[: h - h % 2, : w - w % 2]  # even dims for yuv420p


def write_video(path: str, frames, fps: int = 30) -> str:
    """frames: iterable of (H, W, 3) float arrays in [0,1]."""
    frames = [_to_uint8(f) for f in frames]
    try:
        import imageio

        imageio.mimwrite(path, frames, fps=fps, codec="libx264",
                         output_params=["-pix_fmt", "yuv420p"])
        return path
    except Exception:
        d = os.path.splitext(path)[0] + "_frames"
        os.makedirs(d, exist_ok=True)
        from PIL import Image

        for i, f in enumerate(frames):
            Image.fromarray(f).save(os.path.join(d, f"{i:05d}.png"))
        with open(os.path.join(d, "INDEX.txt"), "w") as fh:
            fh.write(f"{len(frames)} frames @ {fps} fps (no ffmpeg backend)\n")
        return d


def side_by_side(a: np.ndarray, b: np.ndarray, axis: int = 1) -> np.ndarray:
    return np.concatenate([a, b], axis=axis)


def wipe(a: np.ndarray, b: np.ndarray, t: float) -> np.ndarray:
    """Left-to-right wipe transition at fraction t in [0,1]."""
    w = a.shape[1]
    cut = int(w * t)
    out = a.copy()
    out[:, cut:] = b[:, cut:]
    return out
