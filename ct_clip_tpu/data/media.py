"""Media I/O utilities (transformer_maskgit/transformer_maskgit/data.py).

tensor <-> gif/mp4 (:129-208), `tensor_to_nifti` lives in data/nifti.py as
write_volume (:105-125), frame-count trimming `cast_num_frames` (:32-39),
and string-aware batch collation (:316-336).
"""
from __future__ import annotations

from pathlib import Path
from typing import List, Sequence, Tuple

import numpy as np


def cast_num_frames(video: np.ndarray, frames: int, axis: int = 0) -> np.ndarray:
    """Trim or zero-pad the frame axis to exactly `frames` (data.py:32-39)."""
    f = video.shape[axis]
    if f == frames:
        return video
    if f > frames:
        sl = [slice(None)] * video.ndim
        sl[axis] = slice(0, frames)
        return video[tuple(sl)]
    pad = [(0, 0)] * video.ndim
    pad[axis] = (0, frames - f)
    return np.pad(video, pad)


def video_to_gif(video: np.ndarray, path: str | Path, fps: int = 10,
                 value_range: Tuple[float, float] = (-1.0, 1.0)) -> None:
    """(f, H, W) or (f, H, W, c) float video -> animated gif
    (video_tensor_to_gif, data.py:129-151)."""
    from PIL import Image

    lo, hi = value_range
    arr = np.clip((video - lo) / (hi - lo), 0, 1)
    arr = (arr * 255).astype(np.uint8)
    if arr.ndim == 4 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    frames = [Image.fromarray(a) for a in arr]
    frames[0].save(str(path), save_all=True, append_images=frames[1:],
                   duration=int(1000 / fps), loop=0)


def gif_to_video(path: str | Path) -> np.ndarray:
    """gif -> (f, H, W, c) float32 in [0, 1] (gif_to_tensor, data.py:154-160)."""
    from PIL import Image, ImageSequence

    img = Image.open(str(path))
    frames = [np.asarray(f.convert("L"), np.float32) / 255.0
              for f in ImageSequence.Iterator(img)]
    return np.stack(frames)[..., None]


def video_to_mp4(video: np.ndarray, path: str | Path, fps: int = 10,
                 value_range: Tuple[float, float] = (-1.0, 1.0)) -> None:
    """(f, H, W[, c]) float video -> mp4 (video_to_tensor inverse,
    data.py:163-208)."""
    import cv2

    lo, hi = value_range
    arr = (np.clip((video - lo) / (hi - lo), 0, 1) * 255).astype(np.uint8)
    if arr.ndim == 4 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    f, H, W = arr.shape[:3]
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (W, H), isColor=False)
    for frame in arr:
        writer.write(frame)
    writer.release()


def mp4_to_video(path: str | Path, num_frames: int | None = None) -> np.ndarray:
    """mp4 -> (f, H, W, 1) float32 in [0, 1] (data.py:163-186)."""
    import cv2

    cap = cv2.VideoCapture(str(path))
    frames: List[np.ndarray] = []
    while cap.isOpened():
        ok, frame = cap.read()
        if not ok:
            break
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        frames.append(gray.astype(np.float32) / 255.0)
        if num_frames is not None and len(frames) >= num_frames:
            break
    cap.release()
    return np.stack(frames)[..., None]


def collate_with_strings(batch: Sequence):
    """torch-style default collate that passes strings through as lists
    (collate_tensors_and_strings, data.py:316-336)."""
    elem = batch[0]
    if isinstance(elem, (tuple, list)):
        return tuple(collate_with_strings([b[i] for b in batch])
                     for i in range(len(elem)))
    if isinstance(elem, str):
        return list(batch)
    if isinstance(elem, np.ndarray):
        return np.stack(batch)
    return np.asarray(batch)
