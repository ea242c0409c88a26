"""Golden-trajectory pins for Forager: the env's RNG stream IS its
behavioral contract (forager.py's step draws one batched uniform whose
static column layout defines the stream; worldgen chains keys per floor),
so fixed-seed trajectories must be bit-stable across refactors. These pins
were generated on the 65-achievement tier-4 world (5 floors, table-driven
step, batched worldgen) and guard against accidental stream reshuffles —
intentional content additions are EXPECTED to change them (append-only
consumers keep old columns stable; a failure here means either a regression
or a deliberate env version bump, in which case regenerate the literals).
"""

import jax
import jax.numpy as jnp
import numpy as np

from purejaxql_tpu.envs.gridworld import forager as F


def _rollout(n_steps=64, reset_seed=7, act_seed=8):
    env = F.Forager()
    p = env.default_params
    obs, s = env.reset_env(jax.random.PRNGKey(reset_seed), p)

    def body(carry, t):
        s, rng = carry
        rng, k, ka = jax.random.split(rng, 3)
        a = jax.random.randint(ka, (), 0, F.NUM_ACTIONS)
        o, s2, r, d, _ = env.step_env(k, s, a, p)
        return (s2, rng), (o.sum(), r, d)

    (sf, _), (osum, rs, ds) = jax.jit(
        lambda s: jax.lax.scan(
            body, (s, jax.random.PRNGKey(act_seed)), jnp.arange(n_steps)
        )
    )(s)
    return obs, sf, np.asarray(osum), np.asarray(rs)


def test_forager_golden_trajectory():
    obs0, sf, osum, rs = _rollout()
    assert float(np.asarray(obs0).sum()) == 87.0
    np.testing.assert_allclose(
        osum[-8:],
        [87.8535, 87.8414, 87.8288, 87.5934, 87.5797, 87.5654, 87.5506,
         87.7575],
        rtol=0, atol=2e-4,
    )
    assert float(rs.sum()) == 1.0
    assert np.asarray(sf.pos).tolist() == [27, 27]
    assert int(sf.health) == 9 and int(sf.time) == 64
    assert int(np.asarray(sf.blocks, np.int64).sum()) == 111053


def test_forager_worldgen_deterministic():
    """Same key -> bit-identical world; the reset is a pure function."""
    env = F.Forager()
    p = env.default_params
    _, s1 = env.reset_env(jax.random.PRNGKey(123), p)
    _, s2 = env.reset_env(jax.random.PRNGKey(123), p)
    assert (np.asarray(s1.blocks) == np.asarray(s2.blocks)).all()
    assert (np.asarray(s1.mob_pos) == np.asarray(s2.mob_pos)).all()
    assert (
        np.asarray(s1.potion_map) == np.asarray(s2.potion_map)
    ).all()
