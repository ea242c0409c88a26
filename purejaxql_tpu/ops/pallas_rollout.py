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

        # 3x3 VALID conv: 36 broadcast-FMA terms into (16, 8, 8, B).
        # cw_ref is host-prepared as (36, 16, 1, 1, 1), term index
        # k = (di*3 + dj)*4 + c; 1/255 input scaling folded into weights.
        h1 = jnp.zeros((16, 8, 8, B), jnp.float32) + cb_ref[:, :, :, :]
        for di in range(3):
            for dj in range(3):
                for c in range(4):
                    k = (di * 3 + dj) * 4 + c
                    xk = planes[c][di : di + 8, dj : dj + 8, :].reshape(
                        1, 8, 8, B
                    )
                    h1 = h1 + xk * cw_ref[k]
        h1 = jnp.maximum(
            _layer_norm0(h1, l1s_ref[:, :, :, :], l1b_ref[:, :, :, :]), 0.0
        )
        # dense: dw_ref host-reordered to (128, 1024) with input order
        # (f, i, j) matching this leading-dim merge
        h2 = (
            jnp.dot(
                dw_ref[:, :], h1.reshape(1024, B),
                preferred_element_type=jnp.float32,
            )
            + db_ref[:, :]
        )
        h2 = jnp.maximum(_layer_norm0(h2, l2s_ref[:, :], l2b_ref[:, :]), 0.0)
        q = (
            jnp.dot(hw_ref[:, :], h2, preferred_element_type=jnp.float32)
            + hb_ref[:, :]
        )  # (8, B); rows 3.. carry -1e9 bias so argmax can't pick them
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
    p = params
    # conv weights with /255 input scaling folded in, term-indexed
    cw = (p["CNN_0"]["Conv_0"]["kernel"] / 255.0).transpose(0, 1, 2, 3)
    cw = cw.reshape(36, 16)[:, :, None, None, None]          # (36,16,1,1,1)
    cb = p["CNN_0"]["Conv_0"]["bias"].reshape(16, 1, 1, 1)
    l1s = p["CNN_0"]["LayerNorm_0"]["scale"].reshape(16, 1, 1, 1)
    l1b = p["CNN_0"]["LayerNorm_0"]["bias"].reshape(16, 1, 1, 1)
    # dense rows reordered from flax's (i, j, f) flatten to this kernel's
    # (f, i, j) leading-dim merge, then transposed to (128, 1024)
    dw = p["CNN_0"]["Dense_0"]["kernel"]                      # (1024, 128)
    dw = dw.reshape(8, 8, 16, 128).transpose(2, 0, 1, 3).reshape(1024, 128)
    dw = dw.T                                                 # (128, 1024)
    db = p["CNN_0"]["Dense_0"]["bias"].reshape(128, 1)
    l2s = p["CNN_0"]["LayerNorm_1"]["scale"].reshape(128, 1)
    l2b = p["CNN_0"]["LayerNorm_1"]["bias"].reshape(128, 1)
    hw = jnp.pad(p["Dense_0"]["kernel"].T, ((0, _QPAD - 3), (0, 0)))
    hb = jnp.pad(
        p["Dense_0"]["bias"], (0, _QPAD - 3), constant_values=-1e9
    ).reshape(_QPAD, 1)

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
