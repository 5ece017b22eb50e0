"""Bundle registration + Morton code tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from madrona_tpu.core.registry import ECSRegistry
from madrona_tpu.core.state import StateManager
from madrona_tpu.utils.morton import morton3d


def test_bundles_expand_and_nest():
    sm = StateManager()
    reg = ECSRegistry(sm)
    reg.register_component("Position", (3,))
    reg.register_component("Rotation", (4,))
    reg.register_component("Scale", (3,))
    reg.register_component("Hp", (), jnp.int32)
    reg.register_bundle("Transform", ["Position", "Rotation", "Scale"])
    reg.register_bundle("Base", ["Transform", "Hp"])  # nested
    reg.register_bundle_alias("SolverBundle", "Transform")
    spec = reg.register_archetype("Agent", ["Base"], capacity=4)
    assert spec.components == ("Position", "Rotation", "Scale", "Hp")
    spec2 = reg.register_archetype(
        "Prop", ["SolverBundle", "Hp"], capacity=4
    )
    assert spec2.components == ("Position", "Rotation", "Scale", "Hp")
    with pytest.raises(ValueError):
        reg.register_bundle("Transform", ["Position"])  # collision
    with pytest.raises(ValueError):
        reg.register_bundle_alias("X", "NoSuchBundle")
    state = sm.init_state(2)
    assert state.tables["Agent"].columns["Position"].shape == (2, 4, 3)


def test_morton_locality_and_determinism():
    pts = jnp.asarray(
        [[0, 0, 0], [0.01, 0.01, 0.01], [0.9, 0.9, 0.9], [0.5, 0.5, 0.5]],
        jnp.float32,
    )
    codes = np.asarray(morton3d(pts, [0, 0, 0], [1, 1, 1]))
    # nearby points get nearby codes; far points get far codes
    assert abs(int(codes[0]) - int(codes[1])) < abs(
        int(codes[0]) - int(codes[2])
    )
    # interleave check: (1,0,0) in a 2-cell grid sets the x bit above y,z
    c = morton3d(
        jnp.asarray([[0.9999, 0.0, 0.0]]), [0, 0, 0], [1, 1, 1]
    )
    assert (int(np.asarray(c)[0]) >> 2) & 1 or int(np.asarray(c)[0]) >= (1 << 29)
    # vectorized over leading dims
    batch = jnp.zeros((5, 7, 3))
    assert morton3d(batch, [0, 0, 0], [1, 1, 1]).shape == (5, 7)
