#!/usr/bin/env python
"""Interactive viewer demo: fly around live Escape Room worlds.

Usage: python examples/viewer_demo.py [--port 8787] [--worlds 4]
then open http://127.0.0.1:8787/ in a browser.

The reference equivalent is the per-app viewer binaries built on
src/viz/viewer.cpp (flycam + world switching + keyboard agent control);
here the same loop is served over HTTP (madrona_tpu/viz/web_viewer.py).
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)


import argparse

from madrona_tpu.models.base import make_sim
from madrona_tpu.models.escape_room import EscapeRoom
from madrona_tpu.viz import WebViewer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8787)
    ap.add_argument("--worlds", type=int, default=4)
    args = ap.parse_args()

    env = EscapeRoom()
    sim = make_sim(env, num_worlds=args.worlds, seed=0)

    # the escape room renders boxes for every body; reuse its render
    # mapping if present, else draw unit boxes
    from madrona_tpu.render import MeshRegistry

    reg = MeshRegistry()
    box = reg.add_box(0.5, color=(0.85, 0.55, 0.2))
    mesh = reg.build()
    n = sim.state.tables["RigidBody"].columns["Position"].shape[1]
    render_obj = [box] * n

    WebViewer(
        sim, mesh, render_obj, fps=10.0,
    ).serve(port=args.port)


if __name__ == "__main__":
    main()
