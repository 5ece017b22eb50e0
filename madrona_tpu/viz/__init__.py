"""Viz: headless recorder + lightweight viewer.

TPU-native equivalent of the reference viz layer (``src/viz/`` — GLFW/
ImGui interactive viewer + ``viz::Recorder`` headless capture,
``include/madrona/viz/viewer.hpp``, ``recorder.hpp``). SURVEY.md §7
scopes the interactive Vulkan viewer out of the parity metric and calls
for a headless substitute: the Recorder captures per-step state/RGBD
trajectories; the Viewer renders top-down world schematics or saved
camera frames to PNG (pure NumPy PPM/PNG writer — no display stack); the
WebViewer serves the full interactive loop (flycam, pause/step, world
switch, keyboard agent control) to a browser over stdlib HTTP.
"""

from .playback import PlaybackViewer
from .recorder import Recorder
from .viewer import render_topdown, save_png, save_frame_grid
from .web_viewer import WebViewer

__all__ = [
    "PlaybackViewer", "Recorder", "render_topdown", "save_png",
    "save_frame_grid", "WebViewer",
]
