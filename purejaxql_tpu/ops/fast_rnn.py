"""Fast BPTT forward for the recurrent trainers (opt-in, FAST_BPTT=True).

The RNN family's dominant cost is the learn phase: NUM_EPOCHS x
NUM_MINIBATCHES sequential gradient steps, each a truncated-BPTT forward +
backward over the (MEMORY_WINDOW + NUM_STEPS)-step window on a small env
minibatch (reference shape: pqn_rnn_gymnax.py's _learn_phase). Inside
flax's `nn.scan`-of-`nn.GRUCell`, every timestep dispatches six small
matmuls (ir/iz/in on x, hr/hz/hn on h) plus gate elementwise kernels —
at minibatch sizes like 2 envs the TPU spends the whole phase in kernel
launch latency, not math.

This module recomputes the SAME network function (RNNQNetwork with
layer_norm trunk + GRU stack, models/rnn.py) directly from the flax param
dict, restructured for the hardware:

- the three input projections of every GRU layer are hoisted out of the
  time scan and fused into ONE (T*B, F) x (F, 3H) matmul over the whole
  window (MXU sees one large GEMM instead of 3T small ones),
- the per-step recurrence keeps only the irreducible part: one
  (B, H) x (H, 3H) hidden matmul + the fused gate math,
- the dummy/input BatchNorm running statistics are updated with the same
  momentum rule flax uses, so train_state.batch_stats stays faithful.

Gradients come from plain jax.grad through this function — the hoisted
projections make the backward pass one large matmul per layer too.

Numerically equivalent to `network.apply` (same math per element; the
fused GEMM may reduce in a different order than flax's per-gate GEMMs, so
equality is to float tolerance, not bitwise) — hence opt-in, with the
flax path remaining the parity default. Exactness + grad agreement are
pinned by tests/test_fast_rnn.py.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp


def _layer_norm(x, scale, bias, eps=1e-6):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * scale + bias


def _mp_matmul(a, b, dtype):
    """Mixed-precision GEMM: bf16 operands on the MXU, f32 accumulation
    and result (the activations/recurrent state stay f32 — only the
    matmul operands quantize). Exact identity for dtype=f32: the plain
    `@` keeps the established FAST_BPTT numerics."""
    if dtype == jnp.float32:
        return a @ b
    return jax.lax.dot_general(
        a.astype(dtype),
        b.astype(dtype),
        (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _batch_stats_update(x, ra_mean, ra_var, momentum=0.99):
    """flax nn.BatchNorm's running-average update (train mode): stats over
    all axes but the last, biased variance, EMA with `momentum`."""
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x, axis=axes)
    var = jnp.var(x, axis=axes)
    return momentum * ra_mean + (1 - momentum) * mean, (
        momentum * ra_var + (1 - momentum) * var
    )


def _batch_norm_train(x, scale, bias, eps=1e-5):
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x, axis=axes)
    var = jnp.var(x, axis=axes)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * scale + bias


def _batch_renorm_train(x, scale, bias, stats):
    """Train-mode BatchRenorm forward + state update, replicating
    models/batch_renorm.py exactly (fast-variance form, clipped r/d
    correction after warmup, sqrt-without-epsilon d-shift)."""
    eps = 1e-3
    momentum = 0.999
    warmup_steps = 1000
    axes = tuple(range(x.ndim - 1))
    batch_mean = jnp.mean(x, axis=axes)
    mean2 = jnp.mean(jax.lax.square(x), axis=axes)
    batch_var = jnp.maximum(0.0, mean2 - jax.lax.square(batch_mean))

    std = jnp.sqrt(batch_var + eps)
    ra_std = jnp.sqrt(stats["var"] + eps)
    r = jax.lax.stop_gradient(
        jnp.clip(std / ra_std, 1.0 / stats["r_max"], stats["r_max"])
    )
    d = jax.lax.stop_gradient(
        jnp.clip(
            (batch_mean - stats["mean"]) / ra_std,
            -stats["d_max"],
            stats["d_max"],
        )
    )
    tmp_var = batch_var / (r**2)
    tmp_mean = batch_mean - d * jnp.sqrt(batch_var) / r
    warmed = (stats["steps"] >= warmup_steps).astype(jnp.float32)
    var = warmed * tmp_var + (1.0 - warmed) * batch_var
    mean = warmed * tmp_mean + (1.0 - warmed) * batch_mean

    new_stats = {
        "mean": momentum * stats["mean"] + (1 - momentum) * batch_mean,
        "var": momentum * stats["var"] + (1 - momentum) * batch_var,
        "r_max": stats["r_max"],
        "d_max": stats["d_max"],
        "steps": stats["steps"] + 1,
    }
    y = x - mean
    mul = jax.lax.rsqrt(var + eps) * scale
    return y * mul + bias, new_stats


def lstm_layer_scan(x_seq, resets, carry0, cell_params,
                    compute_dtype=jnp.float32):
    """One LSTM layer over time with hoisted input projections.

    carry0: (c, h) each (B, H) — flax OptimizedLSTMCell order/math
    (i/f/g/o gates; input kernels ii/if/ig/io without bias, hidden kernels
    hi/hf/hg/ho with bias). Returns ((c_T, h_T), y_seq).
    `compute_dtype=bf16` runs the two GEMM families (window-wide input
    projection, per-step hidden projection) at MXU bf16 rate with f32
    accumulation; gates and the (c, h) state stay f32.
    """
    w_i = jnp.concatenate(
        [cell_params[f"i{g}"]["kernel"] for g in ("i", "f", "g", "o")],
        axis=1,
    )  # (F, 4H)
    w_h = jnp.concatenate(
        [cell_params[f"h{g}"]["kernel"] for g in ("i", "f", "g", "o")],
        axis=1,
    )  # (H, 4H)
    b_h = jnp.concatenate(
        [cell_params[f"h{g}"]["bias"] for g in ("i", "f", "g", "o")]
    )  # (4H,)
    hidden = w_h.shape[0]

    xi_seq = _mp_matmul(x_seq, w_i, compute_dtype)  # ONE window-wide GEMM

    def step(carry, inp):
        c, h = carry
        xi, reset = inp
        keep = 1.0 - reset[:, None]
        c = c * keep
        h = h * keep
        hh = _mp_matmul(h, w_h, compute_dtype) + b_h
        a = xi + hh
        i = jax.nn.sigmoid(a[..., :hidden])
        f = jax.nn.sigmoid(a[..., hidden:2 * hidden])
        g = jnp.tanh(a[..., 2 * hidden:3 * hidden])
        o = jax.nn.sigmoid(a[..., 3 * hidden:])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (c, h), h

    return jax.lax.scan(step, carry0, (xi_seq, resets))


def gru_layer_scan(x_seq, resets, h0, cell_params,
                   compute_dtype=jnp.float32):
    """One GRU layer over time with hoisted input projections.

    x_seq: (T, B, F), resets: (T, B), h0: (B, H).
    cell_params: flax GRUCell param dict (ir/iz/in with bias, hr/hz no
    bias, hn with bias — flax.linen.GRUCell math).
    Returns (h_T, y_seq (T, B, H)). `compute_dtype`: see lstm_layer_scan.
    """
    w_i = jnp.concatenate(
        [cell_params["ir"]["kernel"], cell_params["iz"]["kernel"],
         cell_params["in"]["kernel"]], axis=1,
    )  # (F, 3H)
    b_i = jnp.concatenate(
        [cell_params["ir"]["bias"], cell_params["iz"]["bias"],
         cell_params["in"]["bias"]]
    )  # (3H,)
    w_h = jnp.concatenate(
        [cell_params["hr"]["kernel"], cell_params["hz"]["kernel"],
         cell_params["hn"]["kernel"]], axis=1,
    )  # (H, 3H)
    b_hn = cell_params["hn"]["bias"]  # (H,)
    hidden = cell_params["hr"]["kernel"].shape[0]

    # ONE projection GEMM for the whole window
    xi_seq = _mp_matmul(x_seq, w_i, compute_dtype) + b_i  # (T, B, 3H)

    def step(h, inp):
        xi, reset = inp
        h = jnp.where(reset[:, None], jnp.zeros_like(h), h)
        hh = _mp_matmul(h, w_h, compute_dtype)  # the only per-step matmul
        r = jax.nn.sigmoid(xi[..., :hidden] + hh[..., :hidden])
        z = jax.nn.sigmoid(
            xi[..., hidden:2 * hidden] + hh[..., hidden:2 * hidden]
        )
        n = jnp.tanh(
            xi[..., 2 * hidden:] + r * (hh[..., 2 * hidden:] + b_hn)
        )
        h = (1.0 - z) * n + z * h
        return h, h

    return jax.lax.scan(step, h0, (xi_seq, resets))


# ---------------------------------------------------------------------------
# Pallas GRU time-scan: the whole T-step recurrence (and its backward) as ONE
# kernel each, so a gradient step pays 2 kernel launches for the sequential
# part instead of ~6T. The hoisted input-projection GEMMs stay in XLA; the
# kernel keeps only the irreducible per-step work — one (B,H)x(H,3H) MXU
# matmul + fused gate math — with h, weights, and residuals VMEM-resident.
# ---------------------------------------------------------------------------


def _gru_fwd_kernel(xi_ref, keep_ref, h0_ref, wh_ref, bhn_ref,
                    y_ref, r_ref, z_ref, n_ref, c_ref):
    T = xi_ref.shape[0]
    H = h0_ref.shape[-1]

    def step(t, h):
        h = h * keep_ref[t]  # (B, H) * (B, 1): episode-boundary reset
        hh = jnp.dot(h, wh_ref[:], preferred_element_type=jnp.float32)
        xi = xi_ref[t]
        r = jax.nn.sigmoid(xi[:, :H] + hh[:, :H])
        z = jax.nn.sigmoid(xi[:, H:2 * H] + hh[:, H:2 * H])
        c = hh[:, 2 * H:] + bhn_ref[:]
        n = jnp.tanh(xi[:, 2 * H:] + r * c)
        h_new = (1.0 - z) * n + z * h
        y_ref[t] = h_new
        r_ref[t] = r
        z_ref[t] = z
        n_ref[t] = n
        c_ref[t] = c
        return h_new

    jax.lax.fori_loop(0, T, step, h0_ref[:])


def _gru_bwd_kernel(keep_ref, hprev_ref, wh_ref, r_ref, z_ref, n_ref, c_ref,
                    gy_ref, ghT_ref,
                    dxi_ref, dh0_ref, dwh_ref, dbhn_ref):
    T = keep_ref.shape[0]
    H = hprev_ref.shape[-1]

    dwh_ref[:] = jnp.zeros_like(dwh_ref)
    dbhn_ref[:] = jnp.zeros_like(dbhn_ref)

    def step(i, g):
        t = T - 1 - i
        g = g + gy_ref[t]
        r, z, n, c = r_ref[t], z_ref[t], n_ref[t], c_ref[t]
        hbar = hprev_ref[t] * keep_ref[t]
        dn = g * (1.0 - z)
        dz = g * (hbar - n)
        da_n = dn * (1.0 - n * n)
        dr = da_n * c
        dc = da_n * r
        da_r = dr * r * (1.0 - r)
        da_z = dz * z * (1.0 - z)
        da_cat = jnp.concatenate([da_r, da_z, dc], axis=-1)  # (B, 3H)
        dxi_ref[t] = jnp.concatenate([da_r, da_z, da_n], axis=-1)
        # dhbar = g*z + da_cat @ Wh^T      (contract the 3H axis)
        dhbar = g * z + jax.lax.dot_general(
            da_cat, wh_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dWh += hbar^T @ da_cat           (contract the B axis)
        dwh_ref[:] += jax.lax.dot_general(
            hbar, da_cat, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbhn_ref[:] += jnp.sum(dc, axis=0)
        return dhbar * keep_ref[t]

    g0 = jax.lax.fori_loop(0, T, step, ghT_ref[:])
    dh0_ref[:] = g0


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def _gru_core(xi_seq, keep, h0, w_h, b_hn, interpret=False):
    y_seq, *_ = _gru_core_fwd_call(xi_seq, keep, h0, w_h, b_hn, interpret)
    return y_seq[-1], y_seq


def _gru_core_fwd_call(xi_seq, keep, h0, w_h, b_hn, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, B, _ = xi_seq.shape
    H = h0.shape[-1]
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    shapes = [jax.ShapeDtypeStruct((T, B, H), jnp.float32)] * 5
    return pl.pallas_call(
        _gru_fwd_kernel,
        out_shape=shapes,
        in_specs=[vmem] * 5,
        out_specs=[vmem] * 5,
        interpret=interpret,
    )(xi_seq, keep, h0, w_h, b_hn)


def _gru_core_fwd(xi_seq, keep, h0, w_h, b_hn, interpret):
    y_seq, r, z, n, c = _gru_core_fwd_call(
        xi_seq, keep, h0, w_h, b_hn, interpret
    )
    hprev = jnp.concatenate([h0[None], y_seq[:-1]], axis=0)
    return (y_seq[-1], y_seq), (keep, hprev, w_h, r, z, n, c)


def _gru_core_bwd(interpret, residuals, cotangents):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    keep, hprev, w_h, r, z, n, c = residuals
    g_hT, g_y = cotangents
    T, B, H = hprev.shape
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    dxi, dh0, dwh, dbhn = pl.pallas_call(
        _gru_bwd_kernel,
        out_shape=[
            jax.ShapeDtypeStruct((T, B, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((H, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((H,), jnp.float32),
        ],
        in_specs=[vmem] * 9,
        out_specs=[vmem] * 4,
        interpret=interpret,
    )(keep, hprev, w_h, r, z, n, c, g_y, g_hT)
    dkeep = jnp.zeros_like(keep)  # 0/1 episode mask: no useful gradient
    return dxi, dkeep, dh0, dwh, dbhn


_gru_core.defvjp(_gru_core_fwd, _gru_core_bwd)


def gru_layer_scan_pallas(x_seq, resets, h0, cell_params, interpret=False):
    """Same contract as `gru_layer_scan`, with the time recurrence (fwd and
    bwd) each running as one Pallas kernel."""
    w_i = jnp.concatenate(
        [cell_params["ir"]["kernel"], cell_params["iz"]["kernel"],
         cell_params["in"]["kernel"]], axis=1,
    )
    b_i = jnp.concatenate(
        [cell_params["ir"]["bias"], cell_params["iz"]["bias"],
         cell_params["in"]["bias"]]
    )
    w_h = jnp.concatenate(
        [cell_params["hr"]["kernel"], cell_params["hz"]["kernel"],
         cell_params["hn"]["kernel"]], axis=1,
    )
    b_hn = cell_params["hn"]["bias"]

    xi_seq = (x_seq @ w_i + b_i).astype(jnp.float32)
    keep = (1.0 - resets.astype(jnp.float32))[..., None]  # (T, B, 1)
    h_T, y_seq = _gru_core(
        xi_seq, keep, h0.astype(jnp.float32), w_h, b_hn, interpret
    )
    return h_T, y_seq


def supports_fast_bptt(config) -> bool:
    """The fast path covers the layer_norm-trunk recurrent families: GRU
    (pqn_rnn_gymnax.py / pqn_vdn_rnn_jaxmarl.py shape, BatchNorm input
    norm) and LSTM (pqn_rnn_craftax.py shape, BatchRenorm input norm).
    PALLAS_BPTT additionally requires GRU."""
    from purejaxql_tpu.models.factory import resolve_norms

    norm_type, input_norm_type = resolve_norms(config)
    cell = config.get("RNN_CELL", "gru")
    if config.get("PALLAS_BPTT", False) and cell != "gru":
        return False
    return (
        cell in ("gru", "lstm")
        and norm_type == "layer_norm"
        and input_norm_type in ("batch_norm", "batch_renorm")
        and not config.get("DUELING", False)
    )


def fast_rnn_train_forward(
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    hidden,
    x,
    done,
    last_action,
    *,
    num_layers: int,
    num_rnn_layers: int,
    action_dim: int,
    add_last_action: bool,
    norm_input: bool,
    cell_type: str = "gru",
    input_norm_type: str = "batch_norm",
    pallas: bool = False,
    interpret: bool = False,
    compute_dtype=jnp.float32,
) -> Tuple[Any, jax.Array, Dict[str, Any]]:
    """Train-mode forward of RNNQNetwork (GRU, layer_norm trunk) computed
    directly from the flax param dict. Returns (new_hidden, q_vals,
    new_batch_stats) — the same contract as
    ``network.apply(..., train=True, mutable=["batch_stats"])``.

    x: (T, B, F) obs, done: (T, B), last_action: (T, B) int,
    hidden: list of per-layer (B, H) carries.
    """
    if input_norm_type == "batch_renorm":
        brn = params["BatchRenorm_0"]
        y, new_stats = _batch_renorm_train(
            x, brn["scale"], brn["bias"], batch_stats["BatchRenorm_0"]
        )
        if norm_input:
            x = y
        new_batch_stats = {"BatchRenorm_0": new_stats}
    else:
        bn = params["BatchNorm_0"]
        bn_stats = batch_stats["BatchNorm_0"]
        new_mean, new_var = _batch_stats_update(
            x, bn_stats["mean"], bn_stats["var"]
        )
        if norm_input:
            x = _batch_norm_train(x, bn["scale"], bn["bias"])
        new_batch_stats = {"BatchNorm_0": {"mean": new_mean, "var": new_var}}

    for i in range(num_layers):
        d = params[f"Dense_{i}"]
        ln = params[f"LayerNorm_{i}"]
        x = _mp_matmul(x, d["kernel"], compute_dtype) + d["bias"]
        x = _layer_norm(x, ln["scale"], ln["bias"])
        x = jax.nn.relu(x)

    if add_last_action:
        x = jnp.concatenate(
            [x, jax.nn.one_hot(last_action, action_dim)], axis=-1
        )

    new_hidden = []
    for layer in range(num_rnn_layers):
        if cell_type == "lstm":
            cell = params[f"ScannedRNN_{layer}"]["OptimizedLSTMCell_0"]
            carry_T, x = lstm_layer_scan(
                x, done, hidden[layer], cell, compute_dtype=compute_dtype
            )
            new_hidden.append(carry_T)
        else:
            cell = params[f"ScannedRNN_{layer}"]["GRUCell_0"]
            if pallas:
                h_T, x = gru_layer_scan_pallas(
                    x, done, hidden[layer], cell, interpret=interpret
                )
            else:
                h_T, x = gru_layer_scan(
                    x, done, hidden[layer], cell, compute_dtype=compute_dtype
                )
            new_hidden.append(h_T)

    head = params[f"Dense_{num_layers}"]
    q_vals = _mp_matmul(x, head["kernel"], compute_dtype) + head["bias"]
    return new_hidden, q_vals, new_batch_stats
