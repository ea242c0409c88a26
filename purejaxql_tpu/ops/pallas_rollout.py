"""Pallas TPU mega-kernel: the ENTIRE Breakout-MinAtar rollout in one kernel.

The parity rollout (algo/pqn.py `_step_env` under `lax.scan`) launches
~60 fused kernels per env step — CNN forward, eps-greedy, env dynamics,
obs build — all on tiny (128, ...) tensors, so at the reference
pqn_minatar config the rollout is kernel-dispatch-bound, not
compute-bound. This kernel runs all NUM_STEPS env steps in ONE
`pallas_call`: env state lives in VMEM scratch across a sequential grid,
the CNN forward is an in-register conv + one MXU matmul, and exploration
uses the hardware PRNG. Zero dispatch between steps.

Layout: everything is ENV-MINOR — boards are (10, 10, B), per-env
scalars are (1, B) rows, activations are (features, B) — so the env
batch rides the 128-wide lane dimension and no tensor ever needs a
minor-dim reshape (Mosaic's unsupported-shape-cast class). The 3x3
conv is 36 broadcast-FMA terms accumulated into a (16, 8, 8, B) map
with the feature axis LEADING; the dense layer consumes it through a
leading-dim merge reshape and one (128, 1024) x (1024, B) MXU matmul
with host-reordered weight rows.

OPT-IN fast path (config FUSED_ROLLOUT=True, Breakout-MinAtar +
layer_norm only): the exploration/reset random stream differs from the
reference's threefry discipline (same statistics: P(random)=eps, uniform
actions, uniform reset ball side), so bitwise trajectory parity is traded
for rollout speed — the same trade EXPLORATION_KERNEL="pallas" makes
(ops/pallas_explore.py), applied to the whole rollout. The deterministic
math (CNN forward, env dynamics, obs build) matches the XLA engine and is
pinned by tests/test_ops.py in interpret mode with the PRNG disabled.

Env semantics mirror envs/minatar/breakout.py exactly (MinAtar Breakout,
arXiv 1903.03176); network math mirrors models/cnn.py `CNNQNetwork`
(norm_input=False: dummy input BatchNorm, /255 scaling, conv16-LN-relu,
dense128-LN-relu, linear head — flax LayerNorm eps 1e-6). Board logic is
gather-free: per-env cell tests are one-hot masks over (10, 10, B).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# state-matrix row layout (the (8, B) int32 scratch)
_BY, _BX, _DIR, _POS, _STRIKE, _LY, _LX, _TIME = range(8)

_QPAD = 8  # head padded to 8 rows; rows 3..7 carry a -1e9 bias


def _layer_norm0(h, scale, bias):
    """LayerNorm over the LEADING (feature) axis — flax LN semantics
    (eps 1e-6) transposed into the env-minor layout."""
    mu = jnp.mean(h, axis=0, keepdims=True)
    var = jnp.mean(jnp.square(h - mu), axis=0, keepdims=True)
    return (h - mu) * jax.lax.rsqrt(var + 1e-6) * scale + bias


def _sel4(d, v0, v1, v2, v3):
    """Branchless 4-way select on direction id (replaces const-array
    gathers, which don't vectorize across lanes on the VPU)."""
    return jnp.where(
        d == 0, v0, jnp.where(d == 1, v1, jnp.where(d == 2, v2, v3))
    )


def _board_masks(st, brick, row, col):
    """The four obs channel planes (10, 10, B) f32 in breakout.py's
    channel order [paddle, ball, trail, brick]."""
    B = st.shape[1]
    by = st[_BY, :].reshape(1, 1, B)
    bx = st[_BX, :].reshape(1, 1, B)
    ly = st[_LY, :].reshape(1, 1, B)
    lx = st[_LX, :].reshape(1, 1, B)
    pp = st[_POS, :].reshape(1, 1, B)
    pad_m = ((row == 9) & (col == pp)).astype(jnp.float32)
    ball_m = ((row == by) & (col == bx)).astype(jnp.float32)
    trail_m = ((row == ly) & (col == lx)).astype(jnp.float32)
    return pad_m, ball_m, trail_m, brick.astype(jnp.float32)


def _cnn_forward(
    planes, cw_ref, cb_ref, l1s_ref, l1b_ref, dw_ref, db_ref, l2s_ref,
    l2b_ref, hw_ref, hb_ref, B,
):
    """The MinAtar CNN forward in env-minor layout: 9*C-term conv FMA
    into (16, 8, 8, B), leading-dim merge, one MXU matmul, padded head.
    Shared by every MinAtar game kernel (C = number of obs channels)."""
    C = len(planes)
    h1 = jnp.zeros((16, 8, 8, B), jnp.float32) + cb_ref[:, :, :, :]
    for di in range(3):
        for dj in range(3):
            for c in range(C):
                k = (di * 3 + dj) * C + c
                xk = planes[c][di : di + 8, dj : dj + 8, :].reshape(
                    1, 8, 8, B
                )
                h1 = h1 + xk * cw_ref[k]
    h1 = jnp.maximum(
        _layer_norm0(h1, l1s_ref[:, :, :, :], l1b_ref[:, :, :, :]), 0.0
    )
    h2 = (
        jnp.dot(
            dw_ref[:, :], h1.reshape(1024, B),
            preferred_element_type=jnp.float32,
        )
        + db_ref[:, :]
    )
    h2 = jnp.maximum(_layer_norm0(h2, l2s_ref[:, :], l2b_ref[:, :]), 0.0)
    return (
        jnp.dot(hw_ref[:, :], h2, preferred_element_type=jnp.float32)
        + hb_ref[:, :]
    )  # (8, B); padded rows carry a -1e9 bias


def _pack_cnn_params(p, action_dim, n_channels=4):
    """Host-side weight prep shared by the MinAtar kernels: conv weights
    term-indexed with /255 folded in, dense rows reordered from flax's
    (i, j, f) flatten to the kernel's (f, i, j) merge, padded head."""
    cw = (p["CNN_0"]["Conv_0"]["kernel"] / 255.0).reshape(9 * n_channels, 16)
    cw = cw[:, :, None, None, None]                          # (36,16,1,1,1)
    cb = p["CNN_0"]["Conv_0"]["bias"].reshape(16, 1, 1, 1)
    l1s = p["CNN_0"]["LayerNorm_0"]["scale"].reshape(16, 1, 1, 1)
    l1b = p["CNN_0"]["LayerNorm_0"]["bias"].reshape(16, 1, 1, 1)
    dw = p["CNN_0"]["Dense_0"]["kernel"]                      # (1024, 128)
    dw = dw.reshape(8, 8, 16, 128).transpose(2, 0, 1, 3).reshape(1024, 128)
    dw = dw.T                                                 # (128, 1024)
    db = p["CNN_0"]["Dense_0"]["bias"].reshape(128, 1)
    l2s = p["CNN_0"]["LayerNorm_1"]["scale"].reshape(128, 1)
    l2b = p["CNN_0"]["LayerNorm_1"]["bias"].reshape(128, 1)
    hw = jnp.pad(
        p["Dense_0"]["kernel"].T, ((0, _QPAD - action_dim), (0, 0))
    )
    hb = jnp.pad(
        p["Dense_0"]["bias"], (0, _QPAD - action_dim), constant_values=-1e9
    ).reshape(_QPAD, 1)
    return cw, cb, l1s, l1b, dw, db, l2s, l2b, hw, hb


def _call_game_kernel(
    kernel, T, B, n_channels, weights, state_ins, state_out_shapes,
    scratch_shapes, seed, eps, interpret,
):
    """Shared pallas_call plumbing for every fused game kernel: standard
    per-step outputs (channel-planar obs, packed scalars, padded q) plus
    game-specific final-state outputs; converts back to env-major."""
    vm = pltpu.ANY if interpret else pltpu.VMEM
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        *([pl.BlockSpec(memory_space=vm)] * (len(weights) + len(state_ins))),
    ]
    out_specs = [
        pl.BlockSpec(
            (1, n_channels, 10, 10, B),
            lambda t: (t, 0, 0, 0, 0),
            memory_space=vm,
        ),
        pl.BlockSpec((1, 8, B), lambda t: (t, 0, 0), memory_space=vm),
        pl.BlockSpec((1, _QPAD, B), lambda t: (t, 0, 0), memory_space=vm),
        pl.BlockSpec(memory_space=vm),
        *([pl.BlockSpec(memory_space=vm)] * len(state_out_shapes)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((T, n_channels, 10, 10, B), jnp.float32),
        jax.ShapeDtypeStruct((T, 8, B), jnp.float32),
        jax.ShapeDtypeStruct((T, _QPAD, B), jnp.float32),
        jax.ShapeDtypeStruct((n_channels, 10, 10, B), jnp.float32),
        *state_out_shapes,
    ]
    obs_cm, scal, q_cm, fobs_cm, *state_outs = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(
        jnp.asarray([seed], jnp.int32),
        jnp.asarray([eps], jnp.float32),
        *weights,
        *state_ins,
    )
    obs_seq = jnp.transpose(obs_cm, (0, 4, 2, 3, 1))
    final_obs = jnp.transpose(fobs_cm, (3, 1, 2, 0))
    act = scal[:, 0, :].astype(jnp.int32)
    rew = scal[:, 1, :]
    done = scal[:, 2, :].astype(jnp.int32)
    q_seq = jnp.transpose(q_cm, (0, 2, 1))
    return obs_seq, act, rew, done, q_seq, final_obs, state_outs


def _make_kernel(num_steps: int, batch: int, use_prng: bool, max_steps: int):
    B = batch

    def kernel(
        seed_ref, eps_ref,                                   # SMEM
        cw_ref, cb_ref, l1s_ref, l1b_ref,                    # conv + LN1
        dw_ref, db_ref, l2s_ref, l2b_ref,                    # dense + LN2
        hw_ref, hb_ref,                                      # head (padded)
        st0_ref, brick0_ref,                                 # initial state
        obs_out, scal_out, q_out,                            # per-step outs
        fobs_out, st_out, brick_out,                         # final outs
        st, brick,                                           # VMEM scratch
    ):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            st[:, :] = st0_ref[:, :]
            brick[:, :, :] = brick0_ref[:, :, :]

        if use_prng:
            pltpu.prng_seed(seed_ref[0] + t)

        row = jax.lax.broadcasted_iota(jnp.int32, (10, 10, B), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (10, 10, B), 1)

        s = st[:, :]
        bmap = brick[:, :, :]

        # ---- observation + CNN forward -------------------------------
        planes = _board_masks(s, bmap, row, col)   # 4 x (10, 10, B)
        obs_out[0, 0, :, :, :] = planes[0]
        obs_out[0, 1, :, :, :] = planes[1]
        obs_out[0, 2, :, :, :] = planes[2]
        obs_out[0, 3, :, :, :] = planes[3]

        q = _cnn_forward(
            planes, cw_ref, cb_ref, l1s_ref, l1b_ref, dw_ref, db_ref,
            l2s_ref, l2b_ref, hw_ref, hb_ref, B,
        )
        q_out[0, :, :] = q
        greedy = jnp.argmax(q, axis=0).astype(jnp.int32).reshape(1, B)

        # ---- eps-greedy (hardware PRNG) -------------------------------
        if use_prng:
            ebits = pltpu.bitcast(pltpu.prng_random_bits((1, B)), jnp.uint32)
            abits = pltpu.bitcast(pltpu.prng_random_bits((1, B)), jnp.uint32)
            rbits = pltpu.bitcast(pltpu.prng_random_bits((1, B)), jnp.uint32)
            u = (ebits >> 8).astype(jnp.int32).astype(jnp.float32) * (
                1.0 / (1 << 24)
            )
            rand_act = (abits >> 8).astype(jnp.int32) % 3
            reset_side = ((rbits >> 8) & 1).astype(jnp.int32)
        else:  # deterministic variant for interpret-mode exactness tests
            u = jnp.ones((1, B), jnp.float32)
            rand_act = jnp.zeros((1, B), jnp.int32)
            reset_side = jnp.zeros((1, B), jnp.int32)
        act = jnp.where(u < eps_ref[0], rand_act, greedy)   # (1, B)

        # ---- env dynamics (breakout.py step_env, vectorized) ----------
        by, bx = s[_BY : _BY + 1, :], s[_BX : _BX + 1, :]
        d = s[_DIR : _DIR + 1, :]
        strike = s[_STRIKE : _STRIKE + 1, :]
        pos = jnp.clip(
            s[_POS : _POS + 1, :]
            + jnp.where(act == 1, -1, jnp.where(act == 2, 1, 0)),
            0,
            9,
        )
        last_y, last_x = by, bx
        new_x = bx + _sel4(d, -1, 1, 1, -1)
        new_y = by + _sel4(d, -1, -1, 1, 1)

        hit_wall = (new_x < 0) | (new_x > 9)
        new_x = jnp.clip(new_x, 0, 9)
        d = jnp.where(hit_wall, _sel4(d, 1, 0, 3, 2), d)

        hit_ceiling = new_y < 0
        new_y = jnp.maximum(new_y, 0)
        d = jnp.where(hit_ceiling, _sel4(d, 3, 2, 1, 0), d)

        ball_m = (row == new_y.reshape(1, 1, B)) & (
            col == new_x.reshape(1, 1, B)
        )
        hit_brick = (
            jnp.sum(bmap * ball_m.astype(jnp.int32), axis=(0, 1)).reshape(1, B)
            > 0
        )
        scored = hit_brick & (strike == 0)
        reward = scored.astype(jnp.float32)
        bmap = bmap - ball_m.astype(jnp.int32) * scored.astype(
            jnp.int32
        ).reshape(1, 1, B)
        d = jnp.where(scored, _sel4(d, 3, 2, 1, 0), d)
        new_y = jnp.where(scored, last_y, new_y)

        at_bottom = (new_y == 9) & ~hit_brick
        cleared = jnp.sum(bmap, axis=(0, 1)).reshape(1, B) == 0
        wall_rows = ((row >= 1) & (row <= 3)).astype(jnp.int32)
        bmap = jnp.where(
            (at_bottom & cleared).reshape(1, 1, B), wall_rows, bmap
        )
        caught_above = at_bottom & (bx == pos)
        caught_corner = at_bottom & ~caught_above & (new_x == pos)
        missed = at_bottom & ~(caught_above | caught_corner)
        d = jnp.where(caught_above, _sel4(d, 3, 2, 1, 0), d)
        d = jnp.where(caught_corner, _sel4(d, 2, 3, 0, 1), d)
        new_y = jnp.where(caught_above | caught_corner, last_y, new_y)

        strike = jnp.where(
            hit_brick, (scored | (strike > 0)).astype(jnp.int32), 0
        )

        time = s[_TIME : _TIME + 1, :] + 1
        done = missed | (time >= max_steps)
        # scal_out packs [action, reward, done] — (1, B) outputs would
        # violate Mosaic's (8, 128)-divisible block rule
        scal_out[0, :, :] = jnp.concatenate(
            [
                act.astype(jnp.float32),
                reward,
                done.astype(jnp.float32),
                jnp.zeros((5, B), jnp.float32),
            ],
            axis=0,
        )

        # ---- auto-reset (gymnax protocol: obs/state post-reset,
        # reward/done from the terminal transition) ---------------------
        rx = jnp.where(reset_side == 0, 0, 9)
        rd = jnp.where(reset_side == 0, 2, 3)
        new_y = jnp.where(done, 3, new_y)
        new_x = jnp.where(done, rx, new_x)
        d = jnp.where(done, rd, d)
        pos = jnp.where(done, 4, pos)
        strike = jnp.where(done, 0, strike)
        last_y = jnp.where(done, 3, last_y)
        last_x = jnp.where(done, rx, last_x)
        time = jnp.where(done, 0, time)
        bmap = jnp.where(done.reshape(1, 1, B), wall_rows, bmap)

        ns = jnp.concatenate(
            [new_y, new_x, d, pos, strike, last_y, last_x, time], axis=0
        )
        st[:, :] = ns
        brick[:, :, :] = bmap

        @pl.when(t == num_steps - 1)
        def _():
            st_out[:, :] = ns
            brick_out[:, :, :] = bmap
            fp = _board_masks(ns, bmap, row, col)
            fobs_out[0, :, :, :] = fp[0]
            fobs_out[1, :, :, :] = fp[1]
            fobs_out[2, :, :, :] = fp[2]
            fobs_out[3, :, :, :] = fp[3]

    return kernel


@partial(
    jax.jit,
    static_argnames=("num_steps", "use_prng", "interpret", "max_steps"),
)
def breakout_rollout_pallas(
    seed: jax.Array,
    eps: jax.Array,
    params: dict,
    st0: jax.Array,       # (8, B) int32 state matrix (env-minor)
    brick0: jax.Array,    # (10, 10, B) int32
    num_steps: int,
    use_prng: bool = True,
    interpret: bool = False,
    max_steps: int = 1000,
):
    """Run `num_steps` Breakout env steps for a (B,)-lane batch in one
    kernel. Returns (obs_seq (T,B,10,10,4), act (T,B) int32, rew (T,B),
    done (T,B) int32, q_seq (T,B,8), final_obs (B,10,10,4), st (8,B),
    brick (10,10,B))."""
    B = st0.shape[1]
    T = num_steps
    cw, cb, l1s, l1b, dw, db, l2s, l2b, hw, hb = _pack_cnn_params(params, 3)

    vm = pltpu.ANY if interpret else pltpu.VMEM
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        *([pl.BlockSpec(memory_space=vm)] * 12),
    ]
    out_specs = [
        pl.BlockSpec((1, 4, 10, 10, B), lambda t: (t, 0, 0, 0, 0), memory_space=vm),
        pl.BlockSpec((1, 8, B), lambda t: (t, 0, 0), memory_space=vm),
        pl.BlockSpec((1, _QPAD, B), lambda t: (t, 0, 0), memory_space=vm),
        pl.BlockSpec(memory_space=vm),
        pl.BlockSpec(memory_space=vm),
        pl.BlockSpec(memory_space=vm),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((T, 4, 10, 10, B), jnp.float32),
        jax.ShapeDtypeStruct((T, 8, B), jnp.float32),
        jax.ShapeDtypeStruct((T, _QPAD, B), jnp.float32),
        jax.ShapeDtypeStruct((4, 10, 10, B), jnp.float32),
        jax.ShapeDtypeStruct((8, B), jnp.int32),
        jax.ShapeDtypeStruct((10, 10, B), jnp.int32),
    ]
    kernel = _make_kernel(T, B, use_prng, max_steps)
    obs_cm, scal, q_cm, fobs_cm, st, brick = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((8, B), jnp.int32),
            pltpu.VMEM((10, 10, B), jnp.int32),
        ],
        interpret=interpret,
    )(
        jnp.asarray([seed], jnp.int32),
        jnp.asarray([eps], jnp.float32),
        cw, cb, l1s, l1b, dw, db, l2s, l2b, hw, hb,
        st0, brick0,
    )
    obs_seq = jnp.transpose(obs_cm, (0, 4, 2, 3, 1))          # (T,B,10,10,4)
    final_obs = jnp.transpose(fobs_cm, (3, 1, 2, 0))          # (B,10,10,4)
    act = scal[:, 0, :].astype(jnp.int32)
    rew = scal[:, 1, :]
    done = scal[:, 2, :].astype(jnp.int32)
    q_seq = jnp.transpose(q_cm, (0, 2, 1))                    # (T,B,8)
    return obs_seq, act, rew, done, q_seq, final_obs, st, brick


def state_matrix_from_breakout(bstate) -> tuple:
    """Pack a vmapped BreakoutState into the kernel's env-minor (8, B)
    int32 matrix + (10, 10, B) brick map."""
    st = jnp.stack(
        [
            bstate.ball_y, bstate.ball_x, bstate.ball_dir, bstate.pos,
            bstate.strike.astype(jnp.int32), bstate.last_y, bstate.last_x,
            bstate.time,
        ],
        axis=0,
    ).astype(jnp.int32)
    return st, jnp.transpose(bstate.brick_map.astype(jnp.int32), (1, 2, 0))


def breakout_from_state_matrix(st, brick, terminal=None):
    """Inverse of `state_matrix_from_breakout` (post-reset: terminal False)."""
    from purejaxql_tpu.envs.minatar.breakout import BreakoutState

    B = st.shape[1]
    if terminal is None:
        terminal = jnp.zeros((B,), bool)
    return BreakoutState(
        ball_y=st[_BY], ball_x=st[_BX], ball_dir=st[_DIR],
        pos=st[_POS], brick_map=jnp.transpose(brick, (2, 0, 1)),
        strike=st[_STRIKE].astype(bool),
        last_y=st[_LY], last_x=st[_LX], terminal=terminal,
        time=st[_TIME],
    )


# ======================================================================
# CartPole fused rollout — same architecture, MLP net + analytic physics
# ======================================================================

def _mlp_ln(h, scale, bias):
    return _layer_norm0(h, scale, bias)


def _make_cartpole_kernel(num_steps: int, batch: int, use_prng: bool,
                          max_steps: int):
    B = batch
    # CartPole-v1 constants (envs/classic/cartpole.py CartPoleParams)
    G, POLEMASS_L, TOTAL_M = 9.8, 0.05, 1.1
    LENGTH, MASSPOLE, FORCE, TAU = 0.5, 0.1, 10.0, 0.02
    X_THR = 2.4
    TH_THR = 12 * 2 * 3.141592653589793 / 360

    def kernel(
        seed_ref, eps_ref,
        w1_ref, b1_ref, l1s_ref, l1b_ref,
        w2_ref, b2_ref, l2s_ref, l2b_ref,
        hw_ref, hb_ref,
        stf0_ref, sti0_ref,
        obs_out, scal_out, q_out, fobs_out, stf_out, sti_out,
        stf, sti,
    ):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            stf[:, :] = stf0_ref[:, :]
            sti[:, :] = sti0_ref[:, :]

        if use_prng:
            pltpu.prng_seed(seed_ref[0] + t)

        s = stf[:, :]                     # (4, B): x, x_dot, theta, theta_dot
        time = sti[:, :]                  # (1, B)
        obs_out[0, :, :] = s

        h1 = (
            jnp.dot(w1_ref[:, :], s, preferred_element_type=jnp.float32)
            + b1_ref[:, :]
        )
        h1 = jnp.maximum(_mlp_ln(h1, l1s_ref[:, :], l1b_ref[:, :]), 0.0)
        h2 = (
            jnp.dot(w2_ref[:, :], h1, preferred_element_type=jnp.float32)
            + b2_ref[:, :]
        )
        h2 = jnp.maximum(_mlp_ln(h2, l2s_ref[:, :], l2b_ref[:, :]), 0.0)
        q = (
            jnp.dot(hw_ref[:, :], h2, preferred_element_type=jnp.float32)
            + hb_ref[:, :]
        )
        q_out[0, :, :] = q
        greedy = jnp.argmax(q, axis=0).astype(jnp.int32).reshape(1, B)

        if use_prng:
            ebits = pltpu.bitcast(pltpu.prng_random_bits((1, B)), jnp.uint32)
            abits = pltpu.bitcast(pltpu.prng_random_bits((1, B)), jnp.uint32)
            rbits = pltpu.bitcast(pltpu.prng_random_bits((4, B)), jnp.uint32)
            u = (ebits >> 8).astype(jnp.int32).astype(jnp.float32) * (
                1.0 / (1 << 24)
            )
            rand_act = (abits >> 8).astype(jnp.int32) % 2
            reset_f = (rbits >> 8).astype(jnp.int32).astype(jnp.float32) * (
                0.1 / (1 << 24)
            ) - 0.05
        else:
            u = jnp.ones((1, B), jnp.float32)
            rand_act = jnp.zeros((1, B), jnp.int32)
            reset_f = jnp.zeros((4, B), jnp.float32)
        act = jnp.where(u < eps_ref[0], rand_act, greedy).astype(jnp.float32)

        # ---- physics (cartpole.py step_env, Euler) --------------------
        x = s[0:1, :]
        x_dot = s[1:2, :]
        theta = s[2:3, :]
        theta_dot = s[3:4, :]
        force = FORCE * act - FORCE * (1.0 - act)
        costh = jnp.cos(theta)
        sinth = jnp.sin(theta)
        temp = (force + POLEMASS_L * theta_dot * theta_dot * sinth) / TOTAL_M
        thacc = (G * sinth - costh * temp) / (
            LENGTH * (4.0 / 3.0 - MASSPOLE * costh * costh / TOTAL_M)
        )
        xacc = temp - POLEMASS_L * thacc * costh / TOTAL_M
        nx = x + TAU * x_dot
        nx_dot = x_dot + TAU * xacc
        nth = theta + TAU * theta_dot
        nth_dot = theta_dot + TAU * thacc
        ntime = time + 1

        oob = (jnp.abs(nx) > X_THR) | (jnp.abs(nth) > TH_THR)
        done = oob | (ntime >= max_steps)
        # reward: 1 unless the INCOMING state was terminal — post-reset
        # states never are under auto-reset, so this stays exact
        prev_oob = (jnp.abs(x) > X_THR) | (jnp.abs(theta) > TH_THR)
        prev_done = prev_oob | (time >= max_steps)
        reward = 1.0 - prev_done.astype(jnp.float32)

        scal_out[0, :, :] = jnp.concatenate(
            [
                act,
                reward,
                done.astype(jnp.float32),
                jnp.zeros((5, B), jnp.float32),
            ],
            axis=0,
        )

        nsf = jnp.concatenate([nx, nx_dot, nth, nth_dot], axis=0)
        nsf = jnp.where(done, reset_f, nsf)
        ntime = jnp.where(done, 0, ntime)
        stf[:, :] = nsf
        sti[:, :] = ntime

        @pl.when(t == num_steps - 1)
        def _():
            stf_out[:, :] = nsf
            sti_out[:, :] = ntime
            fobs_out[:, :] = nsf

    return kernel


@partial(
    jax.jit,
    static_argnames=("num_steps", "use_prng", "interpret", "max_steps"),
)
def cartpole_rollout_pallas(
    seed: jax.Array,
    eps: jax.Array,
    params: dict,
    stf0: jax.Array,      # (4, B) f32 [x, x_dot, theta, theta_dot]
    sti0: jax.Array,      # (1, B) int32 time
    num_steps: int,
    use_prng: bool = True,
    interpret: bool = False,
    max_steps: int = 500,
):
    """CartPole analogue of `breakout_rollout_pallas` for the MLP
    QNetwork (models/qnet.py, norm_input=False, layer_norm, 2 layers).
    Returns (obs (T,B,4), act (T,B), rew (T,B), done (T,B) int32,
    q (T,B,8), final_obs (B,4), stf (4,B), sti (1,B))."""
    B = stf0.shape[1]
    T = num_steps
    p = params
    w1 = p["Dense_0"]["kernel"].T                      # (H, 4)
    b1 = p["Dense_0"]["bias"][:, None]
    l1s = p["LayerNorm_0"]["scale"][:, None]
    l1b = p["LayerNorm_0"]["bias"][:, None]
    w2 = p["Dense_1"]["kernel"].T                      # (H, H)
    b2 = p["Dense_1"]["bias"][:, None]
    l2s = p["LayerNorm_1"]["scale"][:, None]
    l2b = p["LayerNorm_1"]["bias"][:, None]
    hw = jnp.pad(p["Dense_2"]["kernel"].T, ((0, _QPAD - 2), (0, 0)))
    hb = jnp.pad(
        p["Dense_2"]["bias"], (0, _QPAD - 2), constant_values=-1e9
    )[:, None]

    vm = pltpu.ANY if interpret else pltpu.VMEM
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        *([pl.BlockSpec(memory_space=vm)] * 12),
    ]
    out_specs = [
        pl.BlockSpec((1, 4, B), lambda t: (t, 0, 0), memory_space=vm),
        pl.BlockSpec((1, 8, B), lambda t: (t, 0, 0), memory_space=vm),
        pl.BlockSpec((1, _QPAD, B), lambda t: (t, 0, 0), memory_space=vm),
        pl.BlockSpec(memory_space=vm),
        pl.BlockSpec(memory_space=vm),
        pl.BlockSpec(memory_space=vm),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((T, 4, B), jnp.float32),
        jax.ShapeDtypeStruct((T, 8, B), jnp.float32),
        jax.ShapeDtypeStruct((T, _QPAD, B), jnp.float32),
        jax.ShapeDtypeStruct((4, B), jnp.float32),
        jax.ShapeDtypeStruct((4, B), jnp.float32),
        jax.ShapeDtypeStruct((1, B), jnp.int32),
    ]
    kernel = _make_cartpole_kernel(T, B, use_prng, max_steps)
    obs_cm, scal, q_cm, fobs_cm, stf, sti = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((4, B), jnp.float32),
            pltpu.VMEM((1, B), jnp.int32),
        ],
        interpret=interpret,
    )(
        jnp.asarray([seed], jnp.int32),
        jnp.asarray([eps], jnp.float32),
        w1, b1, l1s, l1b, w2, b2, l2s, l2b, hw, hb,
        stf0, sti0,
    )
    obs_seq = jnp.transpose(obs_cm, (0, 2, 1))          # (T, B, 4)
    final_obs = fobs_cm.T                               # (B, 4)
    act = scal[:, 0, :].astype(jnp.int32)
    rew = scal[:, 1, :]
    done = scal[:, 2, :].astype(jnp.int32)
    q_seq = jnp.transpose(q_cm, (0, 2, 1))              # (T, B, 8)
    return obs_seq, act, rew, done, q_seq, final_obs, stf, sti


def state_matrix_from_cartpole(cstate) -> tuple:
    st = jnp.stack(
        [cstate.x, cstate.x_dot, cstate.theta, cstate.theta_dot], axis=0
    ).astype(jnp.float32)
    return st, cstate.time.astype(jnp.int32)[None, :]


def cartpole_from_state_matrix(stf, sti):
    from purejaxql_tpu.envs.classic.cartpole import CartPoleState

    return CartPoleState(
        x=stf[0], x_dot=stf[1], theta=stf[2], theta_dot=stf[3], time=sti[0]
    )


# ======================================================================
# Asterix fused rollout — 8-slot entity table, same CNN
# ======================================================================

# state-matrix rows for Asterix (int32 (48, B); 42 used, padded to 48)
_A_PX, _A_PY, _A_SSP, _A_STM, _A_MSP, _A_MTM = range(6)
_A_RTM, _A_RIX, _A_TIME, _A_TERM = 6, 7, 8, 9
_A_EE, _A_EX, _A_ELR, _A_EG = 10, 18, 26, 34  # 8-row blocks
_A_ROWS = 48


def _make_asterix_kernel(num_steps: int, batch: int, use_prng: bool,
                         max_steps: int, ramp_interval: int,
                         init_spawn: int, init_move: int):
    B = batch

    def kernel(
        seed_ref, eps_ref,
        cw_ref, cb_ref, l1s_ref, l1b_ref,
        dw_ref, db_ref, l2s_ref, l2b_ref,
        hw_ref, hb_ref,
        st0_ref,
        obs_out, scal_out, q_out, fobs_out, st_out,
        st,
    ):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            st[:, :] = st0_ref[:, :]

        if use_prng:
            pltpu.prng_seed(seed_ref[0] + t)

        row = jax.lax.broadcasted_iota(jnp.int32, (10, 10, B), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (10, 10, B), 1)

        s = st[:, :]
        px, py = s[_A_PX : _A_PX + 1, :], s[_A_PY : _A_PY + 1, :]
        ee = s[_A_EE : _A_EE + 8, :]
        ex = s[_A_EX : _A_EX + 8, :]
        elr = s[_A_ELR : _A_ELR + 8, :]
        eg = s[_A_EG : _A_EG + 8, :]

        # ---- observation (asterix.py get_obs channel order:
        # [player, enemy, trail, gold]; one (10,10,B) mask per slot row)
        def entity_planes(ee, ex, elr, eg):
            enemy_ch = jnp.zeros((10, 10, B), jnp.float32)
            trail_ch = jnp.zeros((10, 10, B), jnp.float32)
            gold_ch = jnp.zeros((10, 10, B), jnp.float32)
            for r in range(8):
                exr = ex[r : r + 1, :].reshape(1, 1, B)
                eer = ee[r : r + 1, :].reshape(1, 1, B).astype(jnp.float32)
                egr = eg[r : r + 1, :].reshape(1, 1, B).astype(jnp.float32)
                elrr = elr[r : r + 1, :].reshape(1, 1, B)
                rowm = row == (r + 1)
                cm = (rowm & (col == exr)).astype(jnp.float32)
                enemy_ch = enemy_ch + cm * eer * (1.0 - egr)
                gold_ch = gold_ch + cm * eer * egr
                txr = jnp.clip(exr + jnp.where(elrr > 0, -1, 1), 0, 9)
                trail_ch = trail_ch + (
                    rowm & (col == txr)
                ).astype(jnp.float32) * eer
            return enemy_ch, trail_ch, gold_ch

        player_m = ((row == py.reshape(1, 1, B)) & (
            col == px.reshape(1, 1, B)
        )).astype(jnp.float32)
        enemy_ch, trail_ch, gold_ch = entity_planes(ee, ex, elr, eg)
        planes = (player_m, enemy_ch, trail_ch, gold_ch)
        obs_out[0, 0, :, :, :] = planes[0]
        obs_out[0, 1, :, :, :] = planes[1]
        obs_out[0, 2, :, :, :] = planes[2]
        obs_out[0, 3, :, :, :] = planes[3]

        q = _cnn_forward(
            planes, cw_ref, cb_ref, l1s_ref, l1b_ref, dw_ref, db_ref,
            l2s_ref, l2b_ref, hw_ref, hb_ref, B,
        )
        q_out[0, :, :] = q
        greedy = jnp.argmax(q, axis=0).astype(jnp.int32).reshape(1, B)

        if use_prng:
            ebits = pltpu.bitcast(pltpu.prng_random_bits((1, B)), jnp.uint32)
            abits = pltpu.bitcast(pltpu.prng_random_bits((1, B)), jnp.uint32)
            gbits = pltpu.bitcast(pltpu.prng_random_bits((8, B)), jnp.uint32)
            lrbits = pltpu.bitcast(pltpu.prng_random_bits((1, B)), jnp.uint32)
            gdbits = pltpu.bitcast(pltpu.prng_random_bits((1, B)), jnp.uint32)
            u = (ebits >> 8).astype(jnp.int32).astype(jnp.float32) * (
                1.0 / (1 << 24)
            )
            rand_act = (abits >> 8).astype(jnp.int32) % 5
            gumbel = (gbits >> 8).astype(jnp.int32).astype(jnp.float32) * (
                1.0 / (1 << 24)
            )
            lr = ((lrbits >> 8) & 1).astype(jnp.int32)
            gold = (
                (gdbits >> 8).astype(jnp.int32).astype(jnp.float32)
                * (1.0 / (1 << 24))
                < (1.0 / 3.0)
            ).astype(jnp.int32)
        else:
            u = jnp.ones((1, B), jnp.float32)
            rand_act = jnp.zeros((1, B), jnp.int32)
            gumbel = jax.lax.broadcasted_iota(
                jnp.float32, (8, B), 0
            )  # deterministic: highest index wins among free slots
            lr = jnp.zeros((1, B), jnp.int32)
            gold = jnp.zeros((1, B), jnp.int32)
        act = jnp.where(u < eps_ref[0], rand_act, greedy)

        # ---- spawn (asterix.py step_env order: spawn, player move,
        # collide, entity move, collide, ramp) ---------------------------
        spawn_timer = s[_A_STM : _A_STM + 1, :]
        spawn_speed = s[_A_SSP : _A_SSP + 1, :]
        do_spawn = spawn_timer == 0
        free = ee == 0
        score = jnp.where(free, gumbel, -1.0)
        best = jnp.max(score, axis=0, keepdims=True)
        sel = (score == best) & free
        # keep only the first tied row (Mosaic has no cumsum lowering:
        # min-reduce the row index of the selected slots instead)
        rowidx = jax.lax.broadcasted_iota(jnp.int32, (8, B), 0)
        first = jnp.min(
            jnp.where(sel, rowidx, 99), axis=0, keepdims=True
        )
        sel = sel & (rowidx == first)
        any_free = free.any(axis=0).reshape(1, B)
        spawn_now = (do_spawn & any_free).astype(jnp.int32)
        take = sel.astype(jnp.int32) * spawn_now
        ee = jnp.maximum(ee, take)
        ex = jnp.where(take > 0, jnp.where(lr > 0, 0, 9), ex)
        elr = jnp.where(take > 0, lr, elr)
        eg = jnp.where(take > 0, gold, eg)
        spawn_timer = jnp.where(do_spawn, spawn_speed, spawn_timer - 1)

        # ---- player move (actions: noop, left, up, right, down) --------
        px = jnp.clip(
            px + (act == 3).astype(jnp.int32) - (act == 1).astype(jnp.int32),
            0, 9,
        )
        py = jnp.clip(
            py + (act == 4).astype(jnp.int32) - (act == 2).astype(jnp.int32),
            1, 8,
        )

        rowsvec = jax.lax.broadcasted_iota(jnp.int32, (8, B), 0) + 1
        terminal = s[_A_TERM : _A_TERM + 1, :]
        reward = jnp.zeros((1, B), jnp.float32)

        def collide(ee, ex, eg, reward, terminal):
            hit = (ee > 0) & (ex == px) & (rowsvec == py)
            reward = reward + jnp.sum(
                (hit & (eg > 0)).astype(jnp.float32), axis=0, keepdims=True
            )
            died = (hit & (eg == 0)).any(axis=0).reshape(1, B)
            terminal = jnp.maximum(terminal, died.astype(jnp.int32))
            ee = ee * (1 - hit.astype(jnp.int32))
            return ee, reward, terminal

        ee, reward, terminal = collide(ee, ex, eg, reward, terminal)

        # ---- entity move ------------------------------------------------
        move_timer = s[_A_MTM : _A_MTM + 1, :]
        move_speed = s[_A_MSP : _A_MSP + 1, :]
        do_move = move_timer == 0
        movedx = ex + jnp.where(elr > 0, 1, -1)
        off = (movedx < 0) | (movedx > 9)
        ex = jnp.where(do_move & (ee > 0), movedx, ex)
        ee = ee * (1 - (do_move & off).astype(jnp.int32))
        ex = jnp.clip(ex, 0, 9)
        move_timer = jnp.where(do_move, move_speed, move_timer - 1)

        ee, reward, terminal = collide(ee, ex, eg, reward, terminal)

        # ---- ramping ----------------------------------------------------
        ramp_timer = s[_A_RTM : _A_RTM + 1, :]
        ramp_index = s[_A_RIX : _A_RIX + 1, :]
        can_ramp = (spawn_speed > 1) | (move_speed > 1)
        do_ramp = can_ramp & (ramp_timer <= 0)
        ramp_move = do_ramp & (ramp_index % 2 == 1) & (move_speed > 1)
        ramp_spawn = do_ramp & (ramp_index % 2 == 0) & (spawn_speed > 1)
        move_speed = move_speed - ramp_move.astype(jnp.int32)
        spawn_speed = spawn_speed - ramp_spawn.astype(jnp.int32)
        ramp_index = ramp_index + do_ramp.astype(jnp.int32)
        ramp_timer = jnp.where(
            do_ramp, ramp_interval, ramp_timer - can_ramp.astype(jnp.int32)
        )

        time = s[_A_TIME : _A_TIME + 1, :] + 1
        done = (terminal > 0) | (time >= max_steps)
        scal_out[0, :, :] = jnp.concatenate(
            [
                act.astype(jnp.float32),
                reward,
                done.astype(jnp.float32),
                jnp.zeros((5, B), jnp.float32),
            ],
            axis=0,
        )

        # ---- auto-reset (deterministic: asterix.py reset_env) ----------
        di = done.astype(jnp.int32)
        ndi = 1 - di
        px = px * ndi + 5 * di
        py = py * ndi + 5 * di
        ee = ee * ndi
        # dead-slot attributes are masked everywhere, but zeroing them
        # keeps the state matrix equal to the XLA reset state
        ex = ex * ndi
        elr = elr * ndi
        eg = eg * ndi
        spawn_speed = spawn_speed * ndi + init_spawn * di
        spawn_timer = spawn_timer * ndi + init_spawn * di
        move_speed = move_speed * ndi + init_move * di
        move_timer = move_timer * ndi + init_move * di
        ramp_timer = ramp_timer * ndi + ramp_interval * di
        ramp_index = ramp_index * ndi
        terminal = terminal * ndi
        time = time * ndi

        ns = jnp.concatenate(
            [
                px, py, spawn_speed, spawn_timer, move_speed, move_timer,
                ramp_timer, ramp_index, time, terminal,
                ee, ex, elr, eg,
                jnp.zeros((_A_ROWS - 42, B), jnp.int32),
            ],
            axis=0,
        )
        st[:, :] = ns

        @pl.when(t == num_steps - 1)
        def _():
            st_out[:, :] = ns
            npx = ns[_A_PX : _A_PX + 1, :].reshape(1, 1, B)
            npy = ns[_A_PY : _A_PY + 1, :].reshape(1, 1, B)
            fp = ((row == npy) & (col == npx)).astype(jnp.float32)
            fe, ft, fg = entity_planes(
                ns[_A_EE : _A_EE + 8, :], ns[_A_EX : _A_EX + 8, :],
                ns[_A_ELR : _A_ELR + 8, :], ns[_A_EG : _A_EG + 8, :],
            )
            fobs_out[0, :, :, :] = fp
            fobs_out[1, :, :, :] = fe
            fobs_out[2, :, :, :] = ft
            fobs_out[3, :, :, :] = fg

    return kernel


@partial(
    jax.jit,
    static_argnames=(
        "num_steps", "use_prng", "interpret", "max_steps",
        "ramp_interval", "init_spawn", "init_move",
    ),
)
def asterix_rollout_pallas(
    seed: jax.Array,
    eps: jax.Array,
    params: dict,
    st0: jax.Array,       # (48, B) int32 state matrix (env-minor)
    num_steps: int,
    use_prng: bool = True,
    interpret: bool = False,
    max_steps: int = 1000,
    ramp_interval: int = 100,
    init_spawn: int = 10,
    init_move: int = 5,
):
    """Asterix analogue of `breakout_rollout_pallas` (5 actions).
    Returns (obs (T,B,10,10,4), act, rew, done int32, q (T,B,8),
    final_obs (B,10,10,4), st (48,B))."""
    B = st0.shape[1]
    T = num_steps
    cw, cb, l1s, l1b, dw, db, l2s, l2b, hw, hb = _pack_cnn_params(params, 5)
    kernel = _make_asterix_kernel(
        T, B, use_prng, max_steps, ramp_interval, init_spawn, init_move
    )
    obs_seq, act, rew, done, q_seq, final_obs, (st,) = _call_game_kernel(
        kernel, T, B, 4,
        (cw, cb, l1s, l1b, dw, db, l2s, l2b, hw, hb), (st0,),
        [jax.ShapeDtypeStruct((_A_ROWS, B), jnp.int32)],
        [pltpu.VMEM((_A_ROWS, B), jnp.int32)],
        seed, eps, interpret,
    )
    return obs_seq, act, rew, done, q_seq, final_obs, st


def state_matrix_from_asterix(astate) -> jax.Array:
    B = astate.player_x.shape[0]
    rows = [
        astate.player_x, astate.player_y, astate.spawn_speed,
        astate.spawn_timer, astate.move_speed, astate.move_timer,
        astate.ramp_timer, astate.ramp_index, astate.time,
        astate.terminal.astype(jnp.int32),
    ]
    st = jnp.stack(rows, axis=0).astype(jnp.int32)
    return jnp.concatenate(
        [
            st,
            astate.e_exists.astype(jnp.int32).T,
            astate.e_x.astype(jnp.int32).T,
            astate.e_lr.astype(jnp.int32).T,
            astate.e_gold.astype(jnp.int32).T,
            jnp.zeros((_A_ROWS - 42, B), jnp.int32),
        ],
        axis=0,
    )


def asterix_from_state_matrix(st):
    from purejaxql_tpu.envs.minatar.asterix import AsterixState

    return AsterixState(
        player_x=st[_A_PX], player_y=st[_A_PY],
        e_exists=st[_A_EE : _A_EE + 8].T.astype(bool),
        e_x=st[_A_EX : _A_EX + 8].T,
        e_lr=st[_A_ELR : _A_ELR + 8].T.astype(bool),
        e_gold=st[_A_EG : _A_EG + 8].T.astype(bool),
        spawn_speed=st[_A_SSP], spawn_timer=st[_A_STM],
        move_speed=st[_A_MSP], move_timer=st[_A_MTM],
        ramp_timer=st[_A_RTM], ramp_index=st[_A_RIX],
        terminal=st[_A_TERM].astype(bool), time=st[_A_TIME],
    )


# ======================================================================
# Freeway fused rollout — 8 car lanes, 7 obs channels, same CNN trunk
# ======================================================================

# state-matrix rows for Freeway (int32 (32, B); 27 used)
_F_POS, _F_MTM, _F_TIME = range(3)
_F_CX, _F_CTM, _F_CSP = 3, 11, 19  # 8-row blocks (car x, timer, signed speed)
_F_ROWS = 32


def _freeway_planes(pos, cx, csp, row, col, B):
    """The 7 obs channel planes (freeway.py get_obs): chicken at column 4,
    cars, and a speed trail behind each car on channel 1+|speed|."""
    chicken = ((row == pos.reshape(1, 1, B)) & (col == 4)).astype(jnp.float32)
    car_ch = jnp.zeros((10, 10, B), jnp.float32)
    speed_chs = [jnp.zeros((10, 10, B), jnp.float32) for _ in range(5)]
    for r in range(8):
        rowm = row == (r + 1)
        cxr = cx[r : r + 1, :].reshape(1, 1, B)
        cspr = csp[r : r + 1, :].reshape(1, 1, B)
        car_ch = car_ch + (rowm & (col == cxr)).astype(jnp.float32)
        bx = cxr + jnp.where(cspr > 0, -1, 1)
        bx = jnp.where(bx < 0, 9, jnp.where(bx > 9, 0, bx))
        bm = (rowm & (col == bx)).astype(jnp.float32)
        aspd = jnp.abs(cspr).astype(jnp.float32)
        for sch in range(5):
            speed_chs[sch] = speed_chs[sch] + bm * (aspd == (sch + 1))
    return (chicken, car_ch, *speed_chs)


def _make_freeway_kernel(num_steps: int, batch: int, use_prng: bool,
                         max_steps: int, player_speed: int):
    B = batch

    def kernel(
        seed_ref, eps_ref,
        cw_ref, cb_ref, l1s_ref, l1b_ref,
        dw_ref, db_ref, l2s_ref, l2b_ref,
        hw_ref, hb_ref,
        st0_ref,
        obs_out, scal_out, q_out, fobs_out, st_out,
        st,
    ):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            st[:, :] = st0_ref[:, :]

        if use_prng:
            pltpu.prng_seed(seed_ref[0] + t)

        row = jax.lax.broadcasted_iota(jnp.int32, (10, 10, B), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (10, 10, B), 1)

        s = st[:, :]
        pos = s[_F_POS : _F_POS + 1, :]
        move_timer = s[_F_MTM : _F_MTM + 1, :]
        cx = s[_F_CX : _F_CX + 8, :]
        ctm = s[_F_CTM : _F_CTM + 8, :]
        csp = s[_F_CSP : _F_CSP + 8, :]

        planes = _freeway_planes(pos, cx, csp, row, col, B)
        for c in range(7):
            obs_out[0, c, :, :, :] = planes[c]

        q = _cnn_forward(
            planes, cw_ref, cb_ref, l1s_ref, l1b_ref, dw_ref, db_ref,
            l2s_ref, l2b_ref, hw_ref, hb_ref, B,
        )
        q_out[0, :, :] = q
        greedy = jnp.argmax(q, axis=0).astype(jnp.int32).reshape(1, B)

        if use_prng:
            ebits = pltpu.bitcast(pltpu.prng_random_bits((1, B)), jnp.uint32)
            abits = pltpu.bitcast(pltpu.prng_random_bits((1, B)), jnp.uint32)
            spbits = pltpu.bitcast(pltpu.prng_random_bits((8, B)), jnp.uint32)
            drbits = pltpu.bitcast(pltpu.prng_random_bits((8, B)), jnp.uint32)
            u = (ebits >> 8).astype(jnp.int32).astype(jnp.float32) * (
                1.0 / (1 << 24)
            )
            rand_act = (abits >> 8).astype(jnp.int32) % 3
            new_speeds = ((spbits >> 8).astype(jnp.int32) % 5) + 1  # 1..5
            new_dirs = jnp.where(((drbits >> 8) & 1) > 0, 1, -1)
        else:
            u = jnp.ones((1, B), jnp.float32)
            rand_act = jnp.zeros((1, B), jnp.int32)
            new_speeds = jnp.full((8, B), 3, jnp.int32)
            new_dirs = jnp.full((8, B), 1, jnp.int32)
        act = jnp.where(u < eps_ref[0], rand_act, greedy)

        # ---- chicken move (freeway.py step_env: 3-step cooldown) -------
        can_move = move_timer == 0
        wants = act != 0
        moved = can_move & wants
        pos = jnp.clip(
            pos + jnp.where(moved, jnp.where(act == 1, -1, 1), 0), 0, 9
        )
        move_timer = jnp.where(
            moved, player_speed, jnp.maximum(move_timer - 1, 0)
        )

        # ---- scoring: top row re-randomizes car speeds -----------------
        scored = pos == 0
        reward = scored.astype(jnp.float32)
        signed = new_speeds * new_dirs
        ctm = jnp.where(scored, new_speeds, ctm)
        csp = jnp.where(scored, signed, csp)
        pos = jnp.where(scored, 9, pos)

        # ---- car movement + collision at column 4 ----------------------
        rowsvec = jax.lax.broadcasted_iota(jnp.int32, (8, B), 0) + 1
        hit_before = ((cx == 4) & (rowsvec == pos)).any(
            axis=0
        ).reshape(1, B)
        do_move = ctm <= 0
        nx = cx + jnp.where(csp > 0, 1, -1)
        nx = jnp.where(nx < 0, 9, jnp.where(nx > 9, 0, nx))
        cx = jnp.where(do_move, nx, cx)
        ctm = jnp.where(do_move, jnp.abs(csp), ctm - 1)
        hit_after = ((cx == 4) & (rowsvec == pos)).any(axis=0).reshape(1, B)
        pos = jnp.where(hit_before | hit_after, 9, pos)

        time = s[_F_TIME : _F_TIME + 1, :] + 1
        done = time >= max_steps
        scal_out[0, :, :] = jnp.concatenate(
            [
                act.astype(jnp.float32),
                reward,
                done.astype(jnp.float32),
                jnp.zeros((5, B), jnp.float32),
            ],
            axis=0,
        )

        # ---- auto-reset (reset_env re-randomizes x too; reuse the step's
        # speed draws and derive fresh x from their bits) -----------------
        di = done.astype(jnp.int32)
        ndi = 1 - di
        if use_prng:
            xb = pltpu.bitcast(pltpu.prng_random_bits((8, B)), jnp.uint32)
            reset_x = (xb >> 8).astype(jnp.int32) % 10
        else:
            reset_x = jnp.zeros((8, B), jnp.int32)
        pos = pos * ndi + 9 * di
        move_timer = move_timer * ndi
        cx = jnp.where(di > 0, reset_x, cx)
        ctm = jnp.where(di > 0, new_speeds, ctm)
        csp = jnp.where(di > 0, signed, csp)
        time = time * ndi

        ns = jnp.concatenate(
            [
                pos, move_timer, time, cx, ctm, csp,
                jnp.zeros((_F_ROWS - 27, B), jnp.int32),
            ],
            axis=0,
        )
        st[:, :] = ns

        @pl.when(t == num_steps - 1)
        def _():
            st_out[:, :] = ns
            fp = _freeway_planes(
                ns[_F_POS : _F_POS + 1, :], ns[_F_CX : _F_CX + 8, :],
                ns[_F_CSP : _F_CSP + 8, :], row, col, B,
            )
            for c in range(7):
                fobs_out[c, :, :, :] = fp[c]

    return kernel


@partial(
    jax.jit,
    static_argnames=(
        "num_steps", "use_prng", "interpret", "max_steps", "player_speed",
    ),
)
def freeway_rollout_pallas(
    seed: jax.Array,
    eps: jax.Array,
    params: dict,
    st0: jax.Array,       # (32, B) int32 state matrix (env-minor)
    num_steps: int,
    use_prng: bool = True,
    interpret: bool = False,
    max_steps: int = 2500,
    player_speed: int = 3,
):
    """Freeway analogue (3 actions, 7 obs channels). Returns
    (obs (T,B,10,10,7), act, rew, done int32, q (T,B,8),
    final_obs (B,10,10,7), st (32,B))."""
    B = st0.shape[1]
    T = num_steps
    cw, cb, l1s, l1b, dw, db, l2s, l2b, hw, hb = _pack_cnn_params(
        params, 3, n_channels=7
    )
    kernel = _make_freeway_kernel(T, B, use_prng, max_steps, player_speed)
    obs_seq, act, rew, done, q_seq, final_obs, (st,) = _call_game_kernel(
        kernel, T, B, 7,
        (cw, cb, l1s, l1b, dw, db, l2s, l2b, hw, hb), (st0,),
        [jax.ShapeDtypeStruct((_F_ROWS, B), jnp.int32)],
        [pltpu.VMEM((_F_ROWS, B), jnp.int32)],
        seed, eps, interpret,
    )
    return obs_seq, act, rew, done, q_seq, final_obs, st


def state_matrix_from_freeway(fstate) -> jax.Array:
    B = fstate.pos.shape[0]
    head = jnp.stack(
        [fstate.pos, fstate.move_timer, fstate.time], axis=0
    ).astype(jnp.int32)
    return jnp.concatenate(
        [
            head,
            fstate.car_x.astype(jnp.int32).T,
            fstate.car_timer.astype(jnp.int32).T,
            fstate.car_speed.astype(jnp.int32).T,
            jnp.zeros((_F_ROWS - 27, B), jnp.int32),
        ],
        axis=0,
    )


def freeway_from_state_matrix(st):
    from purejaxql_tpu.envs.minatar.freeway import FreewayState

    B = st.shape[1]
    return FreewayState(
        pos=st[_F_POS],
        car_x=st[_F_CX : _F_CX + 8].T,
        car_timer=st[_F_CTM : _F_CTM + 8].T,
        car_speed=st[_F_CSP : _F_CSP + 8].T,
        move_timer=st[_F_MTM],
        terminal=jnp.zeros((B,), bool),
        time=st[_F_TIME],
    )


# ======================================================================
# SpaceInvaders fused rollout — 3 board maps, RNG-free env dynamics
# ======================================================================

# scalar rows (int32 (16, B); 9 used)
_S_POS, _S_DIR, _S_EMI, _S_AMT, _S_AST, _S_RIX, _S_SHT, _S_TERM, _S_TIME = (
    range(9)
)
_S_ROWS = 16


def _si_planes(pos, adir, alien, fmap, emap, row, col, B):
    """The 6 obs channel planes (space_invaders.py get_obs)."""
    cannon = ((row == 9) & (col == pos.reshape(1, 1, B))).astype(jnp.float32)
    af = alien.astype(jnp.float32)
    adirb = (adir < 0).reshape(1, 1, B)
    return (
        cannon,
        af,
        jnp.where(adirb, af, 0.0),
        jnp.where(~adirb, af, 0.0),
        fmap.astype(jnp.float32),
        emap.astype(jnp.float32),
    )


def _make_si_kernel(num_steps: int, batch: int, use_prng: bool,
                    max_steps: int, shot_cd: int, shot_interval: int):
    B = batch

    def kernel(
        seed_ref, eps_ref,
        cw_ref, cb_ref, l1s_ref, l1b_ref,
        dw_ref, db_ref, l2s_ref, l2b_ref,
        hw_ref, hb_ref,
        st0_ref, alien0_ref, fmap0_ref, emap0_ref,
        obs_out, scal_out, q_out, fobs_out, st_out,
        alien_out, fmap_out, emap_out,
        st, alien_s, fmap_s, emap_s,
    ):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            st[:, :] = st0_ref[:, :]
            alien_s[:, :, :] = alien0_ref[:, :, :]
            fmap_s[:, :, :] = fmap0_ref[:, :, :]
            emap_s[:, :, :] = emap0_ref[:, :, :]

        if use_prng:
            pltpu.prng_seed(seed_ref[0] + t)

        row = jax.lax.broadcasted_iota(jnp.int32, (10, 10, B), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (10, 10, B), 1)

        s = st[:, :]
        pos = s[_S_POS : _S_POS + 1, :]
        adir = s[_S_DIR : _S_DIR + 1, :]
        alien = alien_s[:, :, :]
        fmap = fmap_s[:, :, :]
        emap = emap_s[:, :, :]

        planes = _si_planes(pos, adir, alien, fmap, emap, row, col, B)
        for c in range(6):
            obs_out[0, c, :, :, :] = planes[c]

        q = _cnn_forward(
            planes, cw_ref, cb_ref, l1s_ref, l1b_ref, dw_ref, db_ref,
            l2s_ref, l2b_ref, hw_ref, hb_ref, B,
        )
        q_out[0, :, :] = q
        greedy = jnp.argmax(q, axis=0).astype(jnp.int32).reshape(1, B)

        if use_prng:
            ebits = pltpu.bitcast(pltpu.prng_random_bits((1, B)), jnp.uint32)
            abits = pltpu.bitcast(pltpu.prng_random_bits((1, B)), jnp.uint32)
            u = (ebits >> 8).astype(jnp.int32).astype(jnp.float32) * (
                1.0 / (1 << 24)
            )
            rand_act = (abits >> 8).astype(jnp.int32) % 4
        else:
            u = jnp.ones((1, B), jnp.float32)
            rand_act = jnp.zeros((1, B), jnp.int32)
        act = jnp.where(u < eps_ref[0], rand_act, greedy)

        # ---- cannon: move + fire (space_invaders.py step_env) ----------
        shot_timer = s[_S_SHT : _S_SHT + 1, :]
        fire = (act == 3) & (shot_timer == 0)
        pos = jnp.clip(
            pos + (act == 2).astype(jnp.int32) - (act == 1).astype(jnp.int32),
            0, 9,
        )
        fire_m = (row == 9) & (col == pos.reshape(1, 1, B))
        fmap = jnp.maximum(
            fmap, (fire_m & fire.reshape(1, 1, B)).astype(jnp.int32)
        )
        shot_timer = jnp.where(
            fire, shot_cd, jnp.maximum(shot_timer - 1, 0)
        )

        # ---- bullets travel (shift with zero-fill == the env's
        # roll+clear; wrap never matters pre-terminal) --------------------
        fmap = jnp.concatenate(
            [fmap[1:, :, :], jnp.zeros((1, 10, B), jnp.int32)], axis=0
        )
        emap = jnp.concatenate(
            [jnp.zeros((1, 10, B), jnp.int32), emap[:-1, :, :]], axis=0
        )
        terminal = s[_S_TERM : _S_TERM + 1, :]
        hit = jnp.sum(
            emap * ((row == 9) & (col == pos.reshape(1, 1, B))).astype(
                jnp.int32
            ),
            axis=(0, 1),
        ).reshape(1, B)
        terminal = jnp.maximum(terminal, (hit > 0).astype(jnp.int32))

        # ---- alien march -------------------------------------------------
        amt = s[_S_AMT : _S_AMT + 1, :]
        emi = s[_S_EMI : _S_EMI + 1, :]
        do_move = amt == 0
        col0 = jnp.sum(alien[:, 0, :], axis=0).reshape(1, B)
        col9 = jnp.sum(alien[:, 9, :], axis=0).reshape(1, B)
        at_edge = ((col0 > 0) & (adir < 0)) | ((col9 > 0) & (adir > 0))
        drop = do_move & at_edge
        shift = do_move & ~at_edge
        row9 = jnp.sum(alien[9, :, :], axis=0).reshape(1, B)
        terminal = jnp.maximum(
            terminal, (drop & (row9 > 0)).astype(jnp.int32)
        )
        new_dir = jnp.where(drop, -adir, adir)
        dropped = jnp.concatenate(
            [jnp.zeros((1, 10, B), jnp.int32), alien[:-1, :, :]], axis=0
        )
        shifted_l = jnp.concatenate(
            [alien[:, 1:, :], jnp.zeros((10, 1, B), jnp.int32)], axis=1
        )
        shifted_r = jnp.concatenate(
            [jnp.zeros((10, 1, B), jnp.int32), alien[:, :-1, :]], axis=1
        )
        alien = jnp.where(
            drop.reshape(1, 1, B),
            dropped,
            jnp.where(
                shift.reshape(1, 1, B),
                jnp.where(
                    (adir < 0).reshape(1, 1, B), shifted_l, shifted_r
                ),
                alien,
            ),
        )
        n_alien = jnp.sum(alien, axis=(0, 1)).reshape(1, B)
        amt = jnp.where(do_move, jnp.minimum(n_alien, emi), amt - 1)
        under = jnp.sum(
            alien * ((row == 9) & (col == pos.reshape(1, 1, B))).astype(
                jnp.int32
            ),
            axis=(0, 1),
        ).reshape(1, B)
        terminal = jnp.maximum(terminal, (under > 0).astype(jnp.int32))

        # ---- alien shoots from the column nearest the cannon ------------
        ast = s[_S_AST : _S_AST + 1, :]
        do_shoot = ast == 0
        colidx = jax.lax.broadcasted_iota(jnp.int32, (10, B), 0)
        col_has = jnp.sum(alien, axis=0) > 0                     # (10, B)
        col_dist = jnp.where(
            col_has, jnp.abs(colidx - pos), 100
        )
        dmin = jnp.min(col_dist, axis=0, keepdims=True)
        is_min = (col_dist == dmin) & col_has
        shoot_col = jnp.min(
            jnp.where(is_min, colidx, 99), axis=0, keepdims=True
        )  # argmin-first semantics
        colm = (col == shoot_col.reshape(1, 1, B)).astype(jnp.int32)
        col_aliens = jnp.sum(alien * colm, axis=1)               # (10, B)
        rowidx = jax.lax.broadcasted_iota(jnp.int32, (10, B), 0)
        shoot_row = jnp.max(
            jnp.where(col_aliens > 0, rowidx, -1), axis=0, keepdims=True
        )
        can_shoot = do_shoot & col_has.any(axis=0).reshape(1, B)
        shot_m = (
            (row == jnp.maximum(shoot_row, 0).reshape(1, 1, B))
            & (col == shoot_col.reshape(1, 1, B))
            & can_shoot.reshape(1, 1, B)
        )
        emap = jnp.maximum(emap, shot_m.astype(jnp.int32))
        ast = jnp.where(do_shoot, shot_interval, ast - 1)

        # ---- kills -------------------------------------------------------
        kill = alien * fmap
        reward = jnp.sum(kill, axis=(0, 1)).reshape(1, B).astype(jnp.float32)
        alien = alien * (1 - kill)
        fmap = fmap * (1 - kill)

        # ---- wave cleared: respawn + ramp ---------------------------------
        wave = (
            (row >= 0) & (row <= 3) & (col >= 2) & (col <= 7)
        ).astype(jnp.int32)
        cleared = jnp.sum(alien, axis=(0, 1)).reshape(1, B) == 0
        alien = jnp.where(cleared.reshape(1, 1, B), wave, alien)
        rix = s[_S_RIX : _S_RIX + 1, :]
        emi = jnp.where(cleared & (emi > 6), emi - 1, emi)
        rix = rix + cleared.astype(jnp.int32)

        time = s[_S_TIME : _S_TIME + 1, :] + 1
        done = (terminal > 0) | (time >= max_steps)
        scal_out[0, :, :] = jnp.concatenate(
            [
                act.astype(jnp.float32),
                reward,
                done.astype(jnp.float32),
                jnp.zeros((5, B), jnp.float32),
            ],
            axis=0,
        )

        # ---- auto-reset (deterministic) -----------------------------------
        di = done.astype(jnp.int32)
        ndi = 1 - di
        d3 = di.reshape(1, 1, B)
        pos = pos * ndi + 5 * di
        adir = new_dir * ndi + (-1) * di
        emi = emi * ndi + 12 * di
        amt = amt * ndi + 12 * di
        ast = ast * ndi + shot_interval * di
        rix = rix * ndi
        shot_timer = shot_timer * ndi
        terminal = terminal * ndi
        time = time * ndi
        alien = jnp.where(d3 > 0, wave, alien)
        fmap = fmap * (1 - d3)
        emap = emap * (1 - d3)

        ns = jnp.concatenate(
            [
                pos, adir, emi, amt, ast, rix, shot_timer, terminal, time,
                jnp.zeros((_S_ROWS - 9, B), jnp.int32),
            ],
            axis=0,
        )
        st[:, :] = ns
        alien_s[:, :, :] = alien
        fmap_s[:, :, :] = fmap
        emap_s[:, :, :] = emap

        @pl.when(t == num_steps - 1)
        def _():
            st_out[:, :] = ns
            alien_out[:, :, :] = alien
            fmap_out[:, :, :] = fmap
            emap_out[:, :, :] = emap
            fp = _si_planes(pos, adir, alien, fmap, emap, row, col, B)
            for c in range(6):
                fobs_out[c, :, :, :] = fp[c]

    return kernel


@partial(
    jax.jit,
    static_argnames=(
        "num_steps", "use_prng", "interpret", "max_steps", "shot_cd",
        "shot_interval",
    ),
)
def space_invaders_rollout_pallas(
    seed: jax.Array,
    eps: jax.Array,
    params: dict,
    st0: jax.Array,       # (16, B) int32 scalars (env-minor)
    alien0: jax.Array,    # (10, 10, B) int32
    fmap0: jax.Array,
    emap0: jax.Array,
    num_steps: int,
    use_prng: bool = True,
    interpret: bool = False,
    max_steps: int = 1000,
    shot_cd: int = 5,
    shot_interval: int = 10,
):
    """SpaceInvaders analogue (4 actions, 6 obs channels, RNG-free env).
    Returns (obs (T,B,10,10,6), act, rew, done int32, q (T,B,8),
    final_obs (B,10,10,6), st (16,B), alien, fmap, emap (10,10,B))."""
    B = st0.shape[1]
    T = num_steps
    cw, cb, l1s, l1b, dw, db, l2s, l2b, hw, hb = _pack_cnn_params(
        params, 4, n_channels=6
    )
    kernel = _make_si_kernel(T, B, use_prng, max_steps, shot_cd, shot_interval)
    (
        obs_seq, act, rew, done, q_seq, final_obs,
        (st, alien, fmap, emap),
    ) = _call_game_kernel(
        kernel, T, B, 6,
        (cw, cb, l1s, l1b, dw, db, l2s, l2b, hw, hb),
        (st0, alien0, fmap0, emap0),
        [
            jax.ShapeDtypeStruct((_S_ROWS, B), jnp.int32),
            jax.ShapeDtypeStruct((10, 10, B), jnp.int32),
            jax.ShapeDtypeStruct((10, 10, B), jnp.int32),
            jax.ShapeDtypeStruct((10, 10, B), jnp.int32),
        ],
        [
            pltpu.VMEM((_S_ROWS, B), jnp.int32),
            pltpu.VMEM((10, 10, B), jnp.int32),
            pltpu.VMEM((10, 10, B), jnp.int32),
            pltpu.VMEM((10, 10, B), jnp.int32),
        ],
        seed, eps, interpret,
    )
    return obs_seq, act, rew, done, q_seq, final_obs, st, alien, fmap, emap


def state_matrix_from_space_invaders(sstate) -> tuple:
    B = sstate.pos.shape[0]
    st = jnp.stack(
        [
            sstate.pos, sstate.alien_dir, sstate.enemy_move_interval,
            sstate.alien_move_timer, sstate.alien_shot_timer,
            sstate.ramp_index, sstate.shot_timer,
            sstate.terminal.astype(jnp.int32), sstate.time,
        ],
        axis=0,
    ).astype(jnp.int32)
    st = jnp.concatenate(
        [st, jnp.zeros((_S_ROWS - 9, B), jnp.int32)], axis=0
    )
    tr = lambda m: jnp.transpose(m.astype(jnp.int32), (1, 2, 0))
    return st, tr(sstate.alien_map), tr(sstate.f_bullet_map), tr(
        sstate.e_bullet_map
    )


def space_invaders_from_state_matrix(st, alien, fmap, emap):
    from purejaxql_tpu.envs.minatar.space_invaders import SpaceInvadersState

    tr = lambda m: jnp.transpose(m, (2, 0, 1))
    return SpaceInvadersState(
        pos=st[_S_POS],
        f_bullet_map=tr(fmap),
        e_bullet_map=tr(emap),
        alien_map=tr(alien),
        alien_dir=st[_S_DIR],
        enemy_move_interval=st[_S_EMI],
        alien_move_timer=st[_S_AMT],
        alien_shot_timer=st[_S_AST],
        ramp_index=st[_S_RIX],
        shot_timer=st[_S_SHT],
        terminal=st[_S_TERM].astype(bool),
        time=st[_S_TIME],
    )


# ======================================================================
# Seaquest fused rollout — five entity pools, oxygen economy, 10 channels
# ======================================================================

# scalar rows (int32 (128, B) total; every row used)
_Q_SX, _Q_SY, _Q_SOR, _Q_OXY, _Q_DVR, _Q_SHT = range(6)
_Q_SPT, _Q_DST, _Q_MVI, _Q_SRF, _Q_TERM, _Q_TIME = range(6, 12)
_Q_F = 12    # fish: EE/X/Y/DIR/TMR x8 rows each
_Q_S = 52    # subs: EE/X/Y/DIR/TMR/SST x4 rows each
_Q_FB = 76   # friendly bullets: EE/X/Y/DIR x4
_Q_EB = 92   # enemy bullets: EE/X/Y/DIR x4
_Q_D = 108   # divers: EE/X/Y/DIR/TMR x4
_Q_ROWS = 128


def _first_free(free, gumbel):
    """One-hot of a uniformly random free slot (argmax-first semantics)."""
    n = free.shape[0]
    score = jnp.where(free, gumbel, -1.0)
    best = jnp.max(score, axis=0, keepdims=True)
    sel = (score == best) & free
    idx = jax.lax.broadcasted_iota(jnp.int32, free.shape, 0)
    first = jnp.min(jnp.where(sel, idx, 99), axis=0, keepdims=True)
    sel = sel & (idx == first)
    return sel.astype(jnp.int32), free.any(axis=0, keepdims=True)


def _pool_mask(ee, xx, yy, row, col, B):
    """Accumulated one-hot board (10, 10, B) of a pool's live entities
    (counts can exceed 1; callers clamp like the env's min(obs, 1))."""
    out = jnp.zeros((10, 10, B), jnp.float32)
    for r in range(ee.shape[0]):
        m = (
            (row == yy[r : r + 1, :].reshape(1, 1, B))
            & (col == xx[r : r + 1, :].reshape(1, 1, B))
        ).astype(jnp.float32)
        out = out + m * ee[r : r + 1, :].reshape(1, 1, B).astype(jnp.float32)
    return out


def _seaquest_planes(s, row, col, B, max_oxygen):
    """The 10 obs channel planes (seaquest.py get_obs)."""
    sx = s[_Q_SX : _Q_SX + 1, :].reshape(1, 1, B)
    sy = s[_Q_SY : _Q_SY + 1, :].reshape(1, 1, B)
    sor = s[_Q_SOR : _Q_SOR + 1, :].reshape(1, 1, B)
    front = ((row == sy) & (col == sx)).astype(jnp.float32)
    bx = jnp.clip(sx + jnp.where(sor == 1, -1, 1), 0, 9)
    back = ((row == sy) & (col == bx)).astype(jnp.float32)

    fbE, fbX, fbY = (
        s[_Q_FB : _Q_FB + 4, :], s[_Q_FB + 4 : _Q_FB + 8, :],
        s[_Q_FB + 8 : _Q_FB + 12, :],
    )
    fbD = s[_Q_FB + 12 : _Q_FB + 16, :]
    fb_ch = _pool_mask(fbE, fbX, fbY, row, col, B)
    tr_ch = _pool_mask(fbE, jnp.clip(fbX - fbD, 0, 9), fbY, row, col, B)
    sub_ch = _pool_mask(
        s[_Q_S : _Q_S + 4, :], s[_Q_S + 4 : _Q_S + 8, :],
        s[_Q_S + 8 : _Q_S + 12, :], row, col, B,
    )
    eb_ch = _pool_mask(
        s[_Q_EB : _Q_EB + 4, :], s[_Q_EB + 4 : _Q_EB + 8, :],
        s[_Q_EB + 8 : _Q_EB + 12, :], row, col, B,
    )
    fish_ch = _pool_mask(
        s[_Q_F : _Q_F + 8, :], s[_Q_F + 8 : _Q_F + 16, :],
        s[_Q_F + 16 : _Q_F + 24, :], row, col, B,
    )
    d_ch = _pool_mask(
        s[_Q_D : _Q_D + 4, :], s[_Q_D + 4 : _Q_D + 8, :],
        s[_Q_D + 8 : _Q_D + 12, :], row, col, B,
    )
    oxy = s[_Q_OXY : _Q_OXY + 1, :].reshape(1, 1, B)
    oxy_cells = jnp.clip((oxy * 10) // max_oxygen, 0, 9)
    gauge_o = ((row == 9) & (col < oxy_cells)).astype(jnp.float32)
    dvr = s[_Q_DVR : _Q_DVR + 1, :].reshape(1, 1, B)
    gauge_d = ((row == 9) & (col < dvr)).astype(jnp.float32)
    clamp = lambda p: jnp.minimum(p, 1.0)
    return (
        clamp(front), clamp(back), clamp(fb_ch), clamp(tr_ch),
        clamp(sub_ch), clamp(eb_ch), clamp(fish_ch), clamp(d_ch),
        gauge_o, gauge_d,
    )


def _make_seaquest_kernel(num_steps: int, batch: int, use_prng: bool,
                          max_steps: int, max_oxygen: int, spawn_speed: int,
                          diver_speed: int, move_interval0: int,
                          shot_cd: int, eshot_interval: int):
    B = batch

    def kernel(
        seed_ref, eps_ref,
        cw_ref, cb_ref, l1s_ref, l1b_ref,
        dw_ref, db_ref, l2s_ref, l2b_ref,
        hw_ref, hb_ref,
        st0_ref,
        obs_out, scal_out, q_out, fobs_out, st_out,
        st,
    ):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            st[:, :] = st0_ref[:, :]

        if use_prng:
            pltpu.prng_seed(seed_ref[0] + t)

        row = jax.lax.broadcasted_iota(jnp.int32, (10, 10, B), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (10, 10, B), 1)

        s = st[:, :]
        planes = _seaquest_planes(s, row, col, B, max_oxygen)
        for c in range(10):
            obs_out[0, c, :, :, :] = planes[c]

        q = _cnn_forward(
            planes, cw_ref, cb_ref, l1s_ref, l1b_ref, dw_ref, db_ref,
            l2s_ref, l2b_ref, hw_ref, hb_ref, B,
        )
        q_out[0, :, :] = q
        greedy = jnp.argmax(q, axis=0).astype(jnp.int32).reshape(1, B)

        def bits01(shape):
            b = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
            return (b >> 8).astype(jnp.int32).astype(jnp.float32) * (
                1.0 / (1 << 24)
            )

        if use_prng:
            u = bits01((1, B))
            rand_act = (
                pltpu.bitcast(pltpu.prng_random_bits((1, B)), jnp.uint32)
                >> 8
            ).astype(jnp.int32) % 6
            g_fb, g_eb = bits01((4, B)), bits01((4, B))
            g_f, g_s, g_d = bits01((8, B)), bits01((4, B)), bits01((4, B))
            lane = (
                pltpu.bitcast(pltpu.prng_random_bits((1, B)), jnp.uint32)
                >> 8
            ).astype(jnp.int32) % 8 + 1
            lr = (
                (pltpu.bitcast(pltpu.prng_random_bits((1, B)), jnp.uint32) >> 8)
                & 1
            ).astype(jnp.int32)
            is_sub = (bits01((1, B)) < (1.0 / 3.0)).astype(jnp.int32)
        else:
            u = jnp.ones((1, B), jnp.float32)
            rand_act = jnp.zeros((1, B), jnp.int32)
            # Mosaic's tpu.iota is integer-only: build int32, then cast
            neg_iota8 = -jax.lax.broadcasted_iota(
                jnp.int32, (8, B), 0
            ).astype(jnp.float32)
            g_fb, g_eb = neg_iota8[:4], neg_iota8[:4]
            g_f, g_s, g_d = neg_iota8, neg_iota8[:4], neg_iota8[:4]
            lane = jnp.full((1, B), 4, jnp.int32)
            lr = jnp.zeros((1, B), jnp.int32)
            is_sub = jnp.zeros((1, B), jnp.int32)
        act = jnp.where(u < eps_ref[0], rand_act, greedy)

        # ---- player (seaquest.py step_env order) ------------------------
        sub_x = jnp.clip(
            s[_Q_SX : _Q_SX + 1, :]
            + (act == 3).astype(jnp.int32) - (act == 1).astype(jnp.int32),
            0, 9,
        )
        sub_y = jnp.clip(
            s[_Q_SY : _Q_SY + 1, :]
            + (act == 4).astype(jnp.int32) - (act == 2).astype(jnp.int32),
            0, 8,
        )
        sub_or = jnp.where(
            act == 1, 0, jnp.where(act == 3, 1, s[_Q_SOR : _Q_SOR + 1, :])
        )

        shot_timer = s[_Q_SHT : _Q_SHT + 1, :]
        fire = (act == 5) & (shot_timer == 0)
        fbE = s[_Q_FB : _Q_FB + 4, :]
        fbX = s[_Q_FB + 4 : _Q_FB + 8, :]
        fbY = s[_Q_FB + 8 : _Q_FB + 12, :]
        fbD = s[_Q_FB + 12 : _Q_FB + 16, :]
        sel_fb, fb_free = _first_free(fbE == 0, g_fb)
        do_fire = (fire & fb_free).astype(jnp.int32)
        take = sel_fb * do_fire
        fbE = jnp.maximum(fbE, take)
        fbX = jnp.where(take > 0, sub_x, fbX)
        fbY = jnp.where(take > 0, sub_y, fbY)
        fbD = jnp.where(take > 0, jnp.where(sub_or == 1, 1, -1), fbD)
        shot_timer = jnp.where(
            do_fire > 0, shot_cd, jnp.maximum(shot_timer - 1, 0)
        )

        # ---- bullets move every step -------------------------------------
        fbX = jnp.where(fbE > 0, fbX + fbD, fbX)
        fbE = fbE * ((fbX >= 0) & (fbX <= 9)).astype(jnp.int32)
        fbX = jnp.clip(fbX, 0, 9)
        ebE = s[_Q_EB : _Q_EB + 4, :]
        ebX = s[_Q_EB + 4 : _Q_EB + 8, :]
        ebY = s[_Q_EB + 8 : _Q_EB + 12, :]
        ebD = s[_Q_EB + 12 : _Q_EB + 16, :]
        ebX = jnp.where(ebE > 0, ebX + ebD, ebX)
        ebE = ebE * ((ebX >= 0) & (ebX <= 9)).astype(jnp.int32)
        ebX = jnp.clip(ebX, 0, 9)

        # ---- enemies move on cadence -------------------------------------
        mvi = s[_Q_MVI : _Q_MVI + 1, :]

        def lane_move(ee, xx, yy, dd, tmr, interval):
            do_move = tmr <= 0
            nx = xx + jnp.where(do_move & (ee > 0), dd, 0)
            off = (nx < 0) | (nx > 9)
            ee = ee * (1 - (do_move & off).astype(jnp.int32))
            nx = jnp.clip(nx, 0, 9)
            tmr = jnp.where(do_move, interval, tmr - 1)
            return ee, nx, yy, tmr

        fE, fX, fY, fT = lane_move(
            s[_Q_F : _Q_F + 8, :], s[_Q_F + 8 : _Q_F + 16, :],
            s[_Q_F + 16 : _Q_F + 24, :], s[_Q_F + 24 : _Q_F + 32, :],
            s[_Q_F + 32 : _Q_F + 40, :], mvi,
        )
        fD = s[_Q_F + 24 : _Q_F + 32, :]
        sE, sX, sY, sT = lane_move(
            s[_Q_S : _Q_S + 4, :], s[_Q_S + 4 : _Q_S + 8, :],
            s[_Q_S + 8 : _Q_S + 12, :], s[_Q_S + 12 : _Q_S + 16, :],
            s[_Q_S + 16 : _Q_S + 20, :], mvi,
        )
        sD = s[_Q_S + 12 : _Q_S + 16, :]
        dE, dX, dY, dT = lane_move(
            s[_Q_D : _Q_D + 4, :], s[_Q_D + 4 : _Q_D + 8, :],
            s[_Q_D + 8 : _Q_D + 12, :], s[_Q_D + 12 : _Q_D + 16, :],
            s[_Q_D + 16 : _Q_D + 20, :], mvi * 2,
        )
        dD = s[_Q_D + 12 : _Q_D + 16, :]

        # ---- enemy subs shoot (first eligible sub, one per step) ---------
        sST = s[_Q_S + 20 : _Q_S + 24, :] - sE
        wants = (sE > 0) & (sST <= 0)
        idx4 = jax.lax.broadcasted_iota(jnp.int32, (4, B), 0)
        shooter_idx = jnp.min(
            jnp.where(wants, idx4, 99), axis=0, keepdims=True
        )
        shooter_sel = (idx4 == shooter_idx) & wants
        can_shoot = wants.any(axis=0).reshape(1, B)
        sel_eb, eb_free = _first_free(ebE == 0, g_eb)
        do_eshot = (can_shoot & eb_free).astype(jnp.int32)
        take_eb = sel_eb * do_eshot
        sh_x = jnp.sum(sX * shooter_sel.astype(jnp.int32), axis=0).reshape(1, B)
        sh_y = jnp.sum(sY * shooter_sel.astype(jnp.int32), axis=0).reshape(1, B)
        sh_d = jnp.sum(sD * shooter_sel.astype(jnp.int32), axis=0).reshape(1, B)
        ebE = jnp.maximum(ebE, take_eb)
        ebX = jnp.where(take_eb > 0, sh_x, ebX)
        ebY = jnp.where(take_eb > 0, sh_y, ebY)
        ebD = jnp.where(take_eb > 0, sh_d, ebD)
        sST = jnp.where(
            shooter_sel & (do_eshot > 0), eshot_interval, sST
        )

        # ---- friendly bullets hit enemies --------------------------------
        def hit_matrix(bE, bX, bY, eE, eX, eY):
            return (
                (bE > 0).reshape(bE.shape[0], 1, B)
                & (eE > 0).reshape(1, eE.shape[0], B)
                & (bX.reshape(bE.shape[0], 1, B) == eX.reshape(1, eE.shape[0], B))
                & (bY.reshape(bE.shape[0], 1, B) == eY.reshape(1, eE.shape[0], B))
            )

        fh = hit_matrix(fbE, fbX, fbY, fE, fX, fY)      # (4, 8, B)
        sh = hit_matrix(fbE, fbX, fbY, sE, sX, sY)      # (4, 4, B)
        reward = (
            jnp.sum(fh.any(axis=0).astype(jnp.float32), axis=0)
            + jnp.sum(sh.any(axis=0).astype(jnp.float32), axis=0)
        ).reshape(1, B)
        fE = fE * (1 - fh.any(axis=0).astype(jnp.int32))
        sE = sE * (1 - sh.any(axis=0).astype(jnp.int32))
        fbE = fbE * (
            1 - (fh.any(axis=1) | sh.any(axis=1)).astype(jnp.int32)
        )

        # ---- spawning ------------------------------------------------------
        spawn_timer = s[_Q_SPT : _Q_SPT + 1, :] - 1
        do_spawn = spawn_timer <= 0
        sel_f, f_free = _first_free(fE == 0, g_f)
        sel_s, s_free = _first_free(sE == 0, g_s)
        spawn_fish = (do_spawn & (is_sub == 0) & f_free).astype(jnp.int32)
        spawn_sub = (do_spawn & (is_sub == 1) & s_free).astype(jnp.int32)
        take_f = sel_f * spawn_fish
        take_s = sel_s * spawn_sub
        edge_x = jnp.where(lr > 0, 0, 9)
        edge_d = jnp.where(lr > 0, 1, -1)
        fE = jnp.maximum(fE, take_f)
        fX = jnp.where(take_f > 0, edge_x, fX)
        fY = jnp.where(take_f > 0, lane, fY)
        fD = jnp.where(take_f > 0, edge_d, fD)
        sE = jnp.maximum(sE, take_s)
        sX = jnp.where(take_s > 0, edge_x, sX)
        sY = jnp.where(take_s > 0, lane, sY)
        sD = jnp.where(take_s > 0, edge_d, sD)
        spawn_timer = jnp.where(do_spawn, spawn_speed, spawn_timer)

        dst = s[_Q_DST : _Q_DST + 1, :] - 1
        do_dspawn = dst <= 0
        sel_d, d_free = _first_free(dE == 0, g_d)
        spawn_diver = (do_dspawn & d_free).astype(jnp.int32)
        take_d = sel_d * spawn_diver
        dE = jnp.maximum(dE, take_d)
        dX = jnp.where(take_d > 0, edge_x, dX)
        dY = jnp.where(take_d > 0, lane, dY)
        dD = jnp.where(take_d > 0, edge_d, dD)
        dst = jnp.where(do_dspawn, diver_speed, dst)

        # ---- collisions with the player ------------------------------------
        divers = s[_Q_DVR : _Q_DVR + 1, :]
        pick = (dE > 0) & (dX == sub_x) & (dY == sub_y)
        divers = jnp.minimum(
            divers + jnp.sum(pick.astype(jnp.int32), axis=0).reshape(1, B), 6
        )
        dE = dE * (1 - pick.astype(jnp.int32))

        hit_enemy = (
            ((fE > 0) & (fX == sub_x) & (fY == sub_y)).any(axis=0)
            | ((sE > 0) & (sX == sub_x) & (sY == sub_y)).any(axis=0)
            | ((ebE > 0) & (ebX == sub_x) & (ebY == sub_y)).any(axis=0)
        ).reshape(1, B)

        # ---- oxygen / surfacing ---------------------------------------------
        oxygen = s[_Q_OXY : _Q_OXY + 1, :]
        surfaced = s[_Q_SRF : _Q_SRF + 1, :]
        underwater = sub_y > 0
        oxygen = jnp.where(underwater, oxygen - 1, oxygen)
        now_surf = (~underwater) & (surfaced == 0)
        fatal = now_surf & (divers == 0)
        cash = now_surf & (divers == 6)
        reward = reward + jnp.where(
            cash, oxygen.astype(jnp.float32) / 10.0, 0.0
        )
        divers = jnp.where(
            now_surf & ~fatal, jnp.where(cash, 0, divers - 1), divers
        )
        oxygen = jnp.where(now_surf & ~fatal, max_oxygen, oxygen)
        surfaced = (~underwater).astype(jnp.int32)

        terminal = jnp.maximum(
            s[_Q_TERM : _Q_TERM + 1, :],
            (hit_enemy | fatal | (oxygen < 0)).astype(jnp.int32),
        )
        time = s[_Q_TIME : _Q_TIME + 1, :] + 1
        done = (terminal > 0) | (time >= max_steps)
        scal_out[0, :, :] = jnp.concatenate(
            [
                act.astype(jnp.float32),
                reward,
                done.astype(jnp.float32),
                jnp.zeros((5, B), jnp.float32),
            ],
            axis=0,
        )

        # ---- auto-reset (deterministic: seaquest.py reset_env) ------------
        di = done.astype(jnp.int32)
        ndi = 1 - di
        sub_x = sub_x * ndi + 5 * di
        sub_y = sub_y * ndi
        sub_or = sub_or * ndi + 1 * di
        oxygen = oxygen * ndi + max_oxygen * di
        divers = divers * ndi
        shot_timer = shot_timer * ndi
        spawn_timer = spawn_timer * ndi + spawn_speed * di
        dst = dst * ndi + diver_speed * di
        mvi = mvi * ndi + move_interval0 * di
        surfaced = surfaced * ndi + 1 * di
        terminal = terminal * ndi
        time = time * ndi
        rst = lambda v, fill=0: v * ndi + fill * di
        fE, fX, fY, fT = rst(fE), rst(fX), rst(fY), rst(fT)
        fD = rst(fD, 1)
        sE, sX, sY, sT = rst(sE), rst(sX), rst(sY), rst(sT)
        sD = rst(sD, 1)
        sST = rst(sST, eshot_interval)
        fbE, fbX, fbY = rst(fbE), rst(fbX), rst(fbY)
        fbD = rst(fbD, 1)
        ebE, ebX, ebY = rst(ebE), rst(ebX), rst(ebY)
        ebD = rst(ebD, 1)
        dE, dX, dY, dT = rst(dE), rst(dX), rst(dY), rst(dT)
        dD = rst(dD, 1)

        ns = jnp.concatenate(
            [
                sub_x, sub_y, sub_or, oxygen, divers, shot_timer,
                spawn_timer, dst, mvi, surfaced, terminal, time,
                fE, fX, fY, fD, fT,
                sE, sX, sY, sD, sT, sST,
                fbE, fbX, fbY, fbD,
                ebE, ebX, ebY, ebD,
                dE, dX, dY, dD, dT,
            ],
            axis=0,
        )
        st[:, :] = ns

        @pl.when(t == num_steps - 1)
        def _():
            st_out[:, :] = ns
            fp = _seaquest_planes(ns, row, col, B, max_oxygen)
            for c in range(10):
                fobs_out[c, :, :, :] = fp[c]

    return kernel


@partial(
    jax.jit,
    static_argnames=(
        "num_steps", "use_prng", "interpret", "max_steps", "max_oxygen",
        "spawn_speed", "diver_speed", "move_interval0", "shot_cd",
        "eshot_interval",
    ),
)
def seaquest_rollout_pallas(
    seed: jax.Array,
    eps: jax.Array,
    params: dict,
    st0: jax.Array,       # (128, B) int32 state matrix (env-minor)
    num_steps: int,
    use_prng: bool = True,
    interpret: bool = False,
    max_steps: int = 1000,
    max_oxygen: int = 200,
    spawn_speed: int = 20,
    diver_speed: int = 30,
    move_interval0: int = 5,
    shot_cd: int = 5,
    eshot_interval: int = 10,
):
    """Seaquest analogue (6 actions, 10 obs channels). Returns
    (obs (T,B,10,10,10), act, rew, done int32, q (T,B,8),
    final_obs (B,10,10,10), st (128,B))."""
    B = st0.shape[1]
    T = num_steps
    cw, cb, l1s, l1b, dw, db, l2s, l2b, hw, hb = _pack_cnn_params(
        params, 6, n_channels=10
    )
    kernel = _make_seaquest_kernel(
        T, B, use_prng, max_steps, max_oxygen, spawn_speed, diver_speed,
        move_interval0, shot_cd, eshot_interval,
    )
    obs_seq, act, rew, done, q_seq, final_obs, (st,) = _call_game_kernel(
        kernel, T, B, 10,
        (cw, cb, l1s, l1b, dw, db, l2s, l2b, hw, hb), (st0,),
        [jax.ShapeDtypeStruct((_Q_ROWS, B), jnp.int32)],
        [pltpu.VMEM((_Q_ROWS, B), jnp.int32)],
        seed, eps, interpret,
    )
    return obs_seq, act, rew, done, q_seq, final_obs, st


def state_matrix_from_seaquest(qstate) -> jax.Array:
    tr = lambda m: m.astype(jnp.int32).T
    head = jnp.stack(
        [
            qstate.sub_x, qstate.sub_y, qstate.sub_or, qstate.oxygen,
            qstate.divers, qstate.shot_timer, qstate.spawn_timer,
            qstate.diver_spawn_timer, qstate.move_interval,
            qstate.surfaced.astype(jnp.int32),
            qstate.terminal.astype(jnp.int32), qstate.time,
        ],
        axis=0,
    ).astype(jnp.int32)
    return jnp.concatenate(
        [
            head,
            tr(qstate.f_exists), tr(qstate.f_x), tr(qstate.f_y),
            tr(qstate.f_dir), tr(qstate.f_timer),
            tr(qstate.s_exists), tr(qstate.s_x), tr(qstate.s_y),
            tr(qstate.s_dir), tr(qstate.s_timer), tr(qstate.s_shot_timer),
            tr(qstate.fb_exists), tr(qstate.fb_x), tr(qstate.fb_y),
            tr(qstate.fb_dir),
            tr(qstate.eb_exists), tr(qstate.eb_x), tr(qstate.eb_y),
            tr(qstate.eb_dir),
            tr(qstate.d_exists), tr(qstate.d_x), tr(qstate.d_y),
            tr(qstate.d_dir), tr(qstate.d_timer),
        ],
        axis=0,
    )


def seaquest_from_state_matrix(st):
    from purejaxql_tpu.envs.minatar.seaquest import SeaquestState

    r = lambda a, n: st[a : a + n].T
    return SeaquestState(
        sub_x=st[_Q_SX], sub_y=st[_Q_SY], sub_or=st[_Q_SOR],
        oxygen=st[_Q_OXY], divers=st[_Q_DVR], shot_timer=st[_Q_SHT],
        f_exists=r(_Q_F, 8).astype(bool), f_x=r(_Q_F + 8, 8),
        f_y=r(_Q_F + 16, 8), f_dir=r(_Q_F + 24, 8), f_timer=r(_Q_F + 32, 8),
        s_exists=r(_Q_S, 4).astype(bool), s_x=r(_Q_S + 4, 4),
        s_y=r(_Q_S + 8, 4), s_dir=r(_Q_S + 12, 4), s_timer=r(_Q_S + 16, 4),
        s_shot_timer=r(_Q_S + 20, 4),
        fb_exists=r(_Q_FB, 4).astype(bool), fb_x=r(_Q_FB + 4, 4),
        fb_y=r(_Q_FB + 8, 4), fb_dir=r(_Q_FB + 12, 4),
        eb_exists=r(_Q_EB, 4).astype(bool), eb_x=r(_Q_EB + 4, 4),
        eb_y=r(_Q_EB + 8, 4), eb_dir=r(_Q_EB + 12, 4),
        d_exists=r(_Q_D, 4).astype(bool), d_x=r(_Q_D + 4, 4),
        d_y=r(_Q_D + 8, 4), d_dir=r(_Q_D + 12, 4), d_timer=r(_Q_D + 16, 4),
        spawn_timer=st[_Q_SPT], diver_spawn_timer=st[_Q_DST],
        move_interval=st[_Q_MVI], surfaced=st[_Q_SRF].astype(bool),
        terminal=st[_Q_TERM].astype(bool), time=st[_Q_TIME],
    )


# ======================================================================
# Pendulum AC fused rollout — the continuous-control (actor-critic)
# analogue: actor MLP + tanh box-squash, the per-env Gaussian noise
# LADDER (linspace of stds across the env batch), a 2-critic ensemble
# value of the explored action, and the Pendulum-v1 physics, all in one
# kernel per update (algo/pqn_ac.py `_env_step` semantics; env math
# mirrors envs/classic/pendulum.py, networks models/actor_critic.py with
# norm_input=False + layer_norm). Exploration/reset randomness uses the
# hardware PRNG (Box–Muller for the Gaussian), the same
# statistics-not-bitstream trade every fused kernel makes.
# ======================================================================

# Pendulum-v1 constants (envs/classic/pendulum.py PendulumParams)
_P_MAX_SPEED, _P_MAX_TORQUE, _P_DT, _P_G, _P_M, _P_L = (
    8.0, 2.0, 0.05, 10.0, 1.0, 1.0,
)
_PI = 3.141592653589793
_TWO_PI = 2.0 * _PI


def _make_pendulum_ac_kernel(num_steps: int, batch: int, use_prng: bool,
                             max_steps: int, linspace_noise: bool):
    B = batch

    def _gauss(shape):
        """Box–Muller standard normals from two hardware-uniform draws."""
        b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        # u1 in (0, 1]: +1 keeps log() finite; u2 in [0, 1)
        u1 = ((b1 >> 8).astype(jnp.int32) + 1).astype(jnp.float32) * (
            1.0 / (1 << 24)
        )
        u2 = (b2 >> 8).astype(jnp.int32).astype(jnp.float32) * (
            1.0 / (1 << 24)
        )
        return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)

    def _mlp2(x, refs):
        """dense-LN-relu x2 + linear head in env-minor layout; `refs` is
        the 10-tuple (w1, b1, l1s, l1b, w2, b2, l2s, l2b, hw, hb)."""
        w1, b1, l1s, l1b, w2, b2, l2s, l2b, hw, hb = refs
        h = jnp.dot(w1[:, :], x, preferred_element_type=jnp.float32) + b1[:, :]
        h = jnp.maximum(_layer_norm0(h, l1s[:, :], l1b[:, :]), 0.0)
        h = jnp.dot(w2[:, :], h, preferred_element_type=jnp.float32) + b2[:, :]
        h = jnp.maximum(_layer_norm0(h, l2s[:, :], l2b[:, :]), 0.0)
        return (
            jnp.dot(hw[:, :], h, preferred_element_type=jnp.float32) + hb[:, :]
        )

    def kernel(
        seed_ref, noise_ref,
        # actor (10) + critic0 (10) + critic1 (10) weight refs
        *refs,
    ):
        (actor_refs, c0_refs, c1_refs) = (
            refs[0:10], refs[10:20], refs[20:30]
        )
        stf0_ref, sti0_ref = refs[30], refs[31]
        obs_out, scal_out, fobs_out, stf_out, sti_out = refs[32:37]
        stf, sti = refs[37], refs[38]

        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            stf[:, :] = stf0_ref[:, :]
            sti[:, :] = sti0_ref[:, :]

        if use_prng:
            pltpu.prng_seed(seed_ref[0] + t)

        theta = stf[0:1, :]
        theta_dot = stf[1:2, :]
        time = sti[:, :]
        obs = jnp.concatenate(
            [jnp.cos(theta), jnp.sin(theta), theta_dot], axis=0
        )                                                  # (3, B)
        obs_out[0, :, :] = obs

        greedy = jnp.tanh(_mlp2(obs, actor_refs)) * _P_MAX_TORQUE  # (1, B)

        if use_prng:
            z = _gauss((1, B))
            rst = pltpu.bitcast(pltpu.prng_random_bits((2, B)), jnp.uint32)
            ru = (rst >> 8).astype(jnp.int32).astype(jnp.float32) * (
                1.0 / (1 << 24)
            )                                              # U[0,1) (2, B)
            reset_theta = (ru[0:1, :] * 2.0 - 1.0) * _PI
            reset_thdot = ru[1:2, :] * 2.0 - 1.0
        else:
            z = jnp.zeros((1, B), jnp.float32)
            reset_theta = jnp.zeros((1, B), jnp.float32)
            reset_thdot = jnp.zeros((1, B), jnp.float32)

        if linspace_noise:
            # Mosaic's tpu.iota is integer-only: build int32, then cast
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1).astype(
                jnp.float32
            )
            stds = lane * (noise_ref[0] / max(B - 1, 1))
        else:
            stds = jnp.full((1, B), noise_ref[0])
        u = jnp.clip(
            greedy + z * stds * _P_MAX_TORQUE, -_P_MAX_TORQUE, _P_MAX_TORQUE
        )                                                  # explored (1, B)

        cx = jnp.concatenate([obs, u], axis=0)             # (4, B)
        v0 = _mlp2(cx, c0_refs)
        v1 = _mlp2(cx, c1_refs)
        value = 0.5 * (v0 + v1)                            # (1, B)

        # ---- physics (pendulum.py step_env) ---------------------------
        shifted = theta + _PI
        angle = shifted - _TWO_PI * jnp.floor(shifted / _TWO_PI) - _PI
        cost = (
            angle * angle
            + 0.1 * theta_dot * theta_dot
            + 0.001 * u * u
        )
        newthdot = theta_dot + (
            3.0 * _P_G / (2.0 * _P_L) * jnp.sin(theta)
            + 3.0 / (_P_M * _P_L * _P_L) * u
        ) * _P_DT
        newthdot = jnp.clip(newthdot, -_P_MAX_SPEED, _P_MAX_SPEED)
        newth = theta + newthdot * _P_DT
        ntime = time + 1
        done = (ntime >= max_steps).astype(jnp.float32)

        scal_out[0, :, :] = jnp.concatenate(
            [u, greedy, value, -cost, done, jnp.zeros((3, B), jnp.float32)],
            axis=0,
        )

        keep = 1.0 - done
        newth = newth * keep + reset_theta * done
        newthdot = newthdot * keep + reset_thdot * done
        new_last_u = u * keep
        ntime = jnp.where(done > 0.0, 0, ntime)
        nsf = jnp.concatenate([newth, newthdot, new_last_u], axis=0)
        stf[:, :] = nsf
        sti[:, :] = ntime

        @pl.when(t == num_steps - 1)
        def _():
            stf_out[:, :] = nsf
            sti_out[:, :] = ntime
            fobs_out[:, :] = jnp.concatenate(
                [jnp.cos(newth), jnp.sin(newth), newthdot], axis=0
            )

    return kernel


def _pack_mlp2(p, in_dim, out_dim):
    """Env-minor packing of a 2-hidden-layer dense-LN MLP param tree
    (models/actor_critic.py Actor/Critic with 2 hidden sizes)."""
    return (
        p["Dense_0"]["kernel"].T, p["Dense_0"]["bias"][:, None],
        p["LayerNorm_0"]["scale"][:, None], p["LayerNorm_0"]["bias"][:, None],
        p["Dense_1"]["kernel"].T, p["Dense_1"]["bias"][:, None],
        p["LayerNorm_1"]["scale"][:, None], p["LayerNorm_1"]["bias"][:, None],
        p["Dense_2"]["kernel"].T, p["Dense_2"]["bias"][:, None],
    )


@partial(
    jax.jit,
    static_argnames=(
        "num_steps", "use_prng", "interpret", "max_steps", "linspace_noise",
    ),
)
def pendulum_ac_rollout_pallas(
    seed: jax.Array,
    noise_std: jax.Array,
    actor_params: dict,
    critic_params: dict,     # vmapped tree with leading NUM_CRITICS=2 axis
    stf0: jax.Array,         # (3, B) f32 [theta, theta_dot, last_u]
    sti0: jax.Array,         # (1, B) int32 time
    num_steps: int,
    use_prng: bool = True,
    interpret: bool = False,
    max_steps: int = 200,
    linspace_noise: bool = True,
):
    """Pendulum actor-critic analogue of `cartpole_rollout_pallas`.
    Returns (obs (T,B,3), explored_u (T,B,1), greedy (T,B,1), value (T,B),
    reward (T,B), done (T,B) f32, final_obs (B,3), stf (3,B), sti (1,B))."""
    B = stf0.shape[1]
    T = num_steps
    actor_w = _pack_mlp2(actor_params, 3, 1)
    c0 = jax.tree_util.tree_map(lambda x: x[0], critic_params)
    c1 = jax.tree_util.tree_map(lambda x: x[1], critic_params)
    critic_w = _pack_mlp2(c0, 4, 1) + _pack_mlp2(c1, 4, 1)

    vm = pltpu.ANY if interpret else pltpu.VMEM
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        *([pl.BlockSpec(memory_space=vm)] * 32),
    ]
    out_specs = [
        pl.BlockSpec((1, 3, B), lambda t: (t, 0, 0), memory_space=vm),
        pl.BlockSpec((1, 8, B), lambda t: (t, 0, 0), memory_space=vm),
        pl.BlockSpec(memory_space=vm),
        pl.BlockSpec(memory_space=vm),
        pl.BlockSpec(memory_space=vm),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((T, 3, B), jnp.float32),
        jax.ShapeDtypeStruct((T, 8, B), jnp.float32),
        jax.ShapeDtypeStruct((3, B), jnp.float32),
        jax.ShapeDtypeStruct((3, B), jnp.float32),
        jax.ShapeDtypeStruct((1, B), jnp.int32),
    ]
    kernel = _make_pendulum_ac_kernel(T, B, use_prng, max_steps,
                                      linspace_noise)
    obs_cm, scal, fobs_cm, stf1, sti1 = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((3, B), jnp.float32),
            pltpu.VMEM((1, B), jnp.int32),
        ],
        interpret=interpret,
    )(
        jnp.asarray([seed], jnp.int32),
        jnp.asarray([noise_std], jnp.float32),
        *actor_w, *critic_w,
        stf0, sti0,
    )
    obs_seq = jnp.transpose(obs_cm, (0, 2, 1))           # (T, B, 3)
    final_obs = fobs_cm.T                                # (B, 3)
    u = scal[:, 0, :][..., None]                         # (T, B, 1)
    greedy = scal[:, 1, :][..., None]
    value = scal[:, 2, :]
    rew = scal[:, 3, :]
    done = scal[:, 4, :]
    return obs_seq, u, greedy, value, rew, done, final_obs, stf1, sti1


def state_matrix_from_pendulum(pstate) -> tuple:
    st = jnp.stack(
        [pstate.theta, pstate.theta_dot, pstate.last_u], axis=0
    ).astype(jnp.float32)
    return st, pstate.time.astype(jnp.int32)[None, :]


def pendulum_from_state_matrix(stf, sti):
    from purejaxql_tpu.envs.classic.pendulum import PendulumState

    return PendulumState(
        theta=stf[0], theta_dot=stf[1], last_u=stf[2], time=sti[0]
    )
