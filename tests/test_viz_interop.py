"""Viewer-lite, Recorder, and torch interop tests."""

import os

import jax.numpy as jnp
import numpy as np

from madrona_tpu.models.base import make_sim
from madrona_tpu.models.cartpole import Cartpole
from madrona_tpu.viz import Recorder, render_topdown, save_png, save_frame_grid
from madrona_tpu.interop import TrainInterface, to_torch, from_torch

W = 4


def test_recorder_roundtrip(tmp_path):
    sim = make_sim(Cartpole(), num_worlds=W, seed=0, donate=False)
    rec = Recorder()
    step = sim.step_fn()
    s = sim.state
    for t in range(5):
        s, o = step(s, {"action": jnp.zeros((W,), jnp.int32),
                        "reset": jnp.zeros((W,), jnp.int32)})
        rec.record(s, o)
    assert len(rec) == 5
    traj = rec.stacked()
    assert traj["obs"].shape == (5, W, 1, 4)
    p = os.path.join(tmp_path, "traj.npz")
    rec.save(p)
    loaded = Recorder.load(p)
    np.testing.assert_array_equal(loaded["obs"], traj["obs"])


def test_topdown_and_png(tmp_path):
    pos = np.zeros((1, 3, 3), np.float32)
    pos[0, 1] = [2, 2, 0]
    pos[0, 2] = [-2, -1, 0]
    sc = np.full((1, 3, 3), 0.5, np.float32)
    img = render_topdown(pos, sc, res=64)
    assert img.shape == (64, 64, 3)
    assert img.max() > 0.2  # something drawn
    p = os.path.join(tmp_path, "world.png")
    save_png(p, img)
    with open(p, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"

    rgb = np.random.RandomState(0).rand(1, 2, 8, 8, 3)
    save_frame_grid(os.path.join(tmp_path, "grid.png"), rgb)
    assert os.path.exists(os.path.join(tmp_path, "grid.png"))


def test_torch_bridge_zero_copy_semantics():
    x = jnp.arange(12, dtype=jnp.float32).reshape(3, 4)
    t = to_torch(x)
    assert tuple(t.shape) == (3, 4)
    np.testing.assert_array_equal(t.numpy(), np.asarray(x))
    back = from_torch(t)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_train_interface_torch_step():
    import torch

    sim = make_sim(Cartpole(), num_worlds=W, seed=0, donate=False)
    ti = TrainInterface(sim)
    ins = ti.step_inputs
    assert "action" in ins and "reset" in ins
    outs = ti.torch_step(
        action=torch.zeros(W, dtype=torch.int32),
        reset=torch.zeros(W, dtype=torch.int32),
    )
    assert isinstance(outs["obs"], torch.Tensor)
    assert outs["obs"].shape == (W, 1, 4)
    assert torch.isfinite(outs["obs"]).all()
