"""Transition pytrees carried through the rollout scans
(reference: pqn_gymnax.py:61-68, pqn_rnn_gymnax.py:100-109,
pqn_vdn_rnn_jaxmarl.py:102-111)."""

from __future__ import annotations

import chex


@chex.dataclass(frozen=True)
class Transition:
    obs: chex.Array
    action: chex.Array
    reward: chex.Array
    done: chex.Array
    next_obs: chex.Array
    q_val: chex.Array


@chex.dataclass(frozen=True)
class RNNTransition:
    """Adds the recurrent carry entering the step plus the previous step's
    done/action (inputs to the recurrent Q-network)."""

    obs: chex.Array
    action: chex.Array
    reward: chex.Array
    done: chex.Array
    last_hs: chex.Array
    last_done: chex.Array
    last_action: chex.Array
    q_val: chex.Array


@chex.dataclass(frozen=True)
class MARLTransition:
    """Multi-agent transition: leading agent axis on obs/action/avail."""

    obs: chex.Array
    action: chex.Array
    reward: chex.Array
    done: chex.Array
    last_hs: chex.Array
    last_done: chex.Array
    last_action: chex.Array
    avail_actions: chex.Array
    q_val: chex.Array
