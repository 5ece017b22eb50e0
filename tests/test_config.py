"""Config env-override tests."""

import os

from madrona_tpu.physics.xpbd import PhysicsConfig
from madrona_tpu.utils.config import env_override


def test_env_override_roundtrip(monkeypatch):
    monkeypatch.setenv("MADRONA_TPU_SUBSTEPS", "8")
    monkeypatch.setenv("MADRONA_TPU_GRAVITY", "0,0,-1.62")
    monkeypatch.setenv("MADRONA_TPU_SOLVER", "gauss_seidel")
    cfg = env_override(PhysicsConfig())
    assert cfg.substeps == 8
    assert cfg.gravity == (0.0, 0.0, -1.62)
    assert cfg.solver == "gauss_seidel"
    assert cfg.dt == PhysicsConfig().dt  # untouched


def test_no_overrides_identity():
    cfg = PhysicsConfig()
    assert env_override(cfg) is cfg or env_override(cfg) == cfg
