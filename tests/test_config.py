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


def test_tuned_table_overlay(monkeypatch):
    """apply_tuned: committed-table knobs overlay defaults, bench_* and
    unknown keys are ignored, env vars still win (PGO-table precedence,
    reference cuda_exec.cpp:2115-2203 analogue)."""
    from madrona_tpu.utils import config as C

    monkeypatch.setattr(C, "_tuned_cache", {
        "fake_env": {
            "tpu": {"megakernel_tile": 256, "bench_worlds": 4096,
                    "not_a_field": 1},
            "cpu": {"megakernel_tile": 256, "bench_worlds": 4096,
                    "not_a_field": 1},
        }
    })
    cfg = C.apply_tuned(PhysicsConfig(), "fake_env")
    assert cfg.megakernel_tile == 256
    assert C.apply_tuned(PhysicsConfig(), "no_such_env") == PhysicsConfig()
    # env var wins over the table when applied on top
    monkeypatch.setenv("MADRONA_TPU_MEGAKERNEL_TILE", "64")
    assert env_override(cfg).megakernel_tile == 64
    # harness-level keys are exposed via load_tuned for bench.py
    row = C.load_tuned("fake_env", "tpu")
    assert row["bench_worlds"] == 4096


def test_tuned_table_commit_is_valid_json():
    import json
    import os

    import madrona_tpu

    path = os.path.join(os.path.dirname(madrona_tpu.__file__),
                        "tuned_configs.json")
    with open(path) as f:
        table = json.load(f)
    assert "escape_room" in table and "tpu" in table["escape_room"]
