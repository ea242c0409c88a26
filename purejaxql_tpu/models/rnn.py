"""Recurrent Q-networks: time-scanned GRU/LSTM cells with reset-on-done and
the RNN-PQN head.

Semantics match the reference recurrent models
(/root/reference/purejaxql/pqn_rnn_gymnax.py:26-96 — GRU ScannedRNN with
done-masked carry resets; pqn_rnn_craftax.py:30-113 — LSTM cells, multiple
RNN layers, last-action input; pqn_vdn_rnn_jaxmarl.py:61-99 — dueling
heads). One configurable module family covers all three.

TPU notes: `nn.scan` unrolls time on-device as a single fused loop; the
dense trunk runs on the whole (T*B, F) batch before the recurrence so the
MXU sees one large matmul instead of T small ones.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn


class ScannedRNN(nn.Module):
    """One recurrent layer scanned over the leading time axis.

    Input x = (ins, resets): ins (T, B, F), resets (T, B). The carry is
    zero-reset wherever `resets` is set (episode boundaries), so hidden
    state never leaks across episodes.
    """

    hidden_size: int
    cell_type: str = "gru"  # "gru" | "lstm"

    @partial(
        nn.scan,
        variable_broadcast="params",
        in_axes=0,
        out_axes=0,
        split_rngs={"params": False},
        # note: unroll>1 here was measured a dead end on the tunneled TPU —
        # runtime unchanged (the cost is per-step kernel dispatch, not loop
        # bookkeeping) and compile time exploded ~10x. Don't retry.
    )
    @nn.compact
    def __call__(self, carry, x):
        ins, resets = x
        init = self.initialize_carry(
            self.hidden_size, ins.shape[0], cell_type=self.cell_type
        )
        carry = jax.tree_util.tree_map(
            lambda i, c: jnp.where(resets[:, np.newaxis], i, c), init, carry
        )
        if self.cell_type == "lstm":
            cell = nn.OptimizedLSTMCell(self.hidden_size)
        else:
            cell = nn.GRUCell(self.hidden_size)
        new_carry, y = cell(carry, ins)
        return new_carry, y

    @staticmethod
    def initialize_carry(hidden_size, *batch_size, cell_type: str = "gru"):
        if cell_type == "lstm":
            cell = nn.OptimizedLSTMCell(hidden_size, parent=None)
        else:
            cell = nn.GRUCell(hidden_size, parent=None)
        return cell.initialize_carry(
            jax.random.PRNGKey(0), (*batch_size, hidden_size)
        )


class RNNQNetwork(nn.Module):
    """Dense trunk -> (optional one-hot last action) -> RNN stack -> Q head.

    Call: (hidden, obs, done, last_action, train) -> (hidden, q_vals) where
    obs is time-major (T, B, F), done/last_action (T, B), and hidden is a
    list of per-layer carries (pytree).
    """

    action_dim: int
    hidden_size: int = 512
    num_layers: int = 2
    num_rnn_layers: int = 1
    cell_type: str = "gru"
    norm_input: bool = False
    norm_type: str = "layer_norm"
    input_norm_type: str = "batch_norm"
    norm_axis_name: Optional[str] = None
    add_last_action: bool = False
    dueling: bool = False

    @nn.compact
    def __call__(self, hidden, x, done, last_action, train: bool = False):
        if self.norm_type == "layer_norm":
            normalize = lambda h: nn.LayerNorm()(h)
        elif self.norm_type == "batch_norm":
            normalize = lambda h: nn.BatchNorm(
                use_running_average=not train, axis_name=self.norm_axis_name
            )(h)
        elif self.norm_type == "batch_renorm":
            from purejaxql_tpu.models.batch_renorm import BatchRenorm

            normalize = lambda h: BatchRenorm(
                use_running_average=not train, axis_name=self.norm_axis_name
            )(h)
        else:
            normalize = lambda h: h

        # craftax-family RNN scripts use BatchRenorm for the input norm and
        # its dummy (pqn_rnn_craftax.py:83-87); gymnax-family uses BatchNorm
        # (pqn_rnn_gymnax.py:74-78). Module path feeds flax's init RNG, so
        # this choice must match per family for bitwise parity.
        if self.input_norm_type == "batch_renorm":
            from purejaxql_tpu.models.batch_renorm import BatchRenorm

            input_norm = BatchRenorm(
                use_running_average=not train, axis_name=self.norm_axis_name
            )
        else:
            input_norm = nn.BatchNorm(
                use_running_average=not train, axis_name=self.norm_axis_name
            )
        if self.norm_input:
            x = input_norm(x)
        else:
            _ = input_norm(x)  # dummy: config-independent param tree

        for _ in range(self.num_layers):
            x = nn.Dense(self.hidden_size)(x)
            x = normalize(x)
            x = nn.relu(x)

        if self.add_last_action:
            one_hot = jax.nn.one_hot(last_action, self.action_dim)
            x = jnp.concatenate([x, one_hot], axis=-1)

        new_hidden = []
        for layer in range(self.num_rnn_layers):
            carry, x = ScannedRNN(
                hidden_size=self.hidden_size, cell_type=self.cell_type
            )(hidden[layer], (x, done))
            new_hidden.append(carry)

        if self.dueling:
            value = nn.Dense(1)(x)
            adv = nn.Dense(self.action_dim)(x)
            q_vals = value + adv - adv.mean(axis=-1, keepdims=True)
        else:
            q_vals = nn.Dense(self.action_dim)(x)

        return new_hidden, q_vals

    def initialize_carry(self, *batch_size):
        return [
            ScannedRNN.initialize_carry(
                self.hidden_size, *batch_size, cell_type=self.cell_type
            )
            for _ in range(self.num_rnn_layers)
        ]
