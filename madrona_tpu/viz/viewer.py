"""Viewer-lite: top-down world schematics + PNG output, no display stack.

Replaces the reference's interactive flycam viewer (src/viz/viewer.cpp)
for headless debugging: render_topdown draws body footprints of one
world; save_frame_grid tiles per-agent RGB views (e.g. HideSeek "rgb"
exports) into one image. PNG writing is a dependency-free encoder.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def png_bytes(img: np.ndarray) -> bytes:
    """Encode [H, W, 3] float [0,1] or uint8 as PNG (dependency-free;
    the single encoder shared by save_png, the web viewer, and the
    playback page)."""
    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
    h, w, _ = img.shape
    raw = b"".join(
        b"\x00" + img[y].tobytes() for y in range(h)
    )

    def chunk(tag, data):
        out = struct.pack(">I", len(data)) + tag + data
        return out + struct.pack(">I", zlib.crc32(tag + data))

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def save_png(path: str, img: np.ndarray) -> None:
    """img: [H, W, 3] float [0,1] or uint8."""
    with open(path, "wb") as f:
        f.write(png_bytes(img))


def render_topdown(
    positions, scales, colors=None, world=0, extent=None, res=512,
) -> np.ndarray:
    """Axis-aligned top-down footprint image of one world.

    positions [W, N, 3], scales [W, N, 3] (box half extents; used as
    footprint), colors optional [N, 3]. Returns [res, res, 3] float."""
    pos = np.asarray(positions)[world]
    sc = np.asarray(scales)[world]
    n = pos.shape[0]
    if colors is None:
        rs = np.random.RandomState(0)
        colors = 0.3 + 0.7 * rs.rand(n, 3)
    colors = np.asarray(colors)
    if extent is None:
        extent = float(np.abs(pos[:, :2]).max() + np.abs(sc[:, :2]).max())
    img = np.full((res, res, 3), 0.08, np.float32)

    def to_px(v):
        return np.clip(
            ((v / extent) * 0.5 + 0.5) * (res - 1), 0, res - 1
        ).astype(int)

    for i in range(n):
        x0, x1 = to_px(pos[i, 0] - sc[i, 0]), to_px(pos[i, 0] + sc[i, 0])
        y0, y1 = to_px(pos[i, 1] - sc[i, 1]), to_px(pos[i, 1] + sc[i, 1])
        img[res - 1 - y1:res - y0, x0:x1 + 1] = colors[i % len(colors)]
    return img


def save_frame_grid(path: str, rgb, world=0) -> None:
    """Tile one world's per-agent RGB views ([W, V, H, Wpx, 3]) into a
    single row image."""
    frames = np.asarray(rgb)[world]
    grid = np.concatenate(list(frames), axis=1)
    save_png(path, grid)
