"""Training checkpoint/resume: a PPO run saved to disk mid-training and
resumed in a FRESH process-state must continue bit-identically — the
§5.4 contract (reference TrainInterface checkpoint tensors,
include/madrona/py/utils.hpp:143-201) extended to the whole train loop,
which the TPU design can make exact because sim + learner state are one
pytree of arrays."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from madrona_tpu.utils import checkpoint as ckpt


def _train(n_updates, sim_state=None, params=None, rng=None, seed=0):
    import examples.train_ppo as tp

    cfg = dataclasses.replace(tp.PPOConfig(), horizon=4)
    sim, update, pi_p, v_p = tp.make_train(8, cfg, seed=seed)
    st = sim.state if sim_state is None else sim_state
    if params is not None:
        pi_p, v_p = params
    r = jax.random.PRNGKey(seed + 1) if rng is None else rng
    for _ in range(n_updates):
        st, pi_p, v_p, r, ep_len = update(st, pi_p, v_p, r)
    return sim, st, (pi_p, v_p), r, float(ep_len)


def test_resume_is_bit_identical(tmp_path):
    # straight 4-update run
    _, st_a, p_a, _, _ = _train(4)

    # 2 updates -> checkpoint to disk -> fresh build -> 2 more
    sim, st_b, p_b, rng_b, _ = _train(2)
    path = str(tmp_path / "ck.npz")
    ckpt.save_npz(path, st_b)
    np.savez(
        str(tmp_path / "learner.npz"),
        rng=np.asarray(rng_b),
        **{f"pi_{i}": np.asarray(x) for i, x in
           enumerate(jax.tree_util.tree_leaves(p_b[0]))},
        **{f"v_{i}": np.asarray(x) for i, x in
           enumerate(jax.tree_util.tree_leaves(p_b[1]))},
    )

    st_r = ckpt.load_npz(path, sim.state)
    blob = np.load(str(tmp_path / "learner.npz"))
    pi_t = jax.tree_util.tree_structure(p_b[0])
    v_t = jax.tree_util.tree_structure(p_b[1])
    pi_r = jax.tree_util.tree_unflatten(
        pi_t, [jnp.asarray(blob[f"pi_{i}"])
               for i in range(pi_t.num_leaves)])
    v_r = jax.tree_util.tree_unflatten(
        v_t, [jnp.asarray(blob[f"v_{i}"])
              for i in range(v_t.num_leaves)])
    _, st_c, p_c, _, _ = _train(
        2, sim_state=st_r, params=(pi_r, v_r),
        rng=jnp.asarray(blob["rng"]),
    )

    for a, c in zip(jax.tree_util.tree_leaves(p_a),
                    jax.tree_util.tree_leaves(p_c)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    for a, c in zip(jax.tree_util.tree_leaves(st_a),
                    jax.tree_util.tree_leaves(st_c)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
