#!/usr/bin/env python
"""Capture compiled (Mosaic, non-interpret) Pallas kernel outputs on the
real TPU for the fixed golden inputs and commit them.

Run once per round on hardware:
    python scripts/capture_kernel_goldens.py
writes tests/goldens/kernels_v1.npz. tests/test_kernel_goldens.py then
compares interpret-mode (CPU CI) or compiled (TPU) outputs against it.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax
import numpy as np

from madrona_tpu.utils.config import enable_compile_cache

enable_compile_cache()

import golden_inputs


def main():
    backend = jax.default_backend()
    if backend == "cpu":
        raise SystemExit(
            "capture must run on the real TPU (backend is cpu)"
        )
    print(f"backend: {backend}; running compiled kernels...", flush=True)
    gdir = os.path.join(os.path.dirname(__file__), "..", "tests",
                        "goldens")
    os.makedirs(gdir, exist_ok=True)
    for name, runner in (
        ("kernels_v1", golden_inputs.run_kernels),
        ("kernels_v2", golden_inputs.run_kernels_v2),
        ("kernels_v3", golden_inputs.run_kernels_v3),
    ):
        out = runner(interpret=False)
        path = os.path.join(gdir, f"{name}.npz")
        np.savez_compressed(path, **out)
        print(f"wrote {os.path.abspath(path)}:")
        for k, v in out.items():
            print(f"  {k}: {v.shape} {v.dtype}")


if __name__ == "__main__":
    main()
