"""Model factory: choose the Q-network family from the config + obs shape,
mirroring how each reference script hardcodes its model
(pqn_gymnax.py:142-148, pqn_minatar.py:105-110, pqn_atari.py:73-97)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from purejaxql_tpu.models.cnn import CNNQNetwork
from purejaxql_tpu.models.qnet import QNetwork


def resolve_norms(config):
    """(norm_type, input_norm_type) with the reference's per-family mapping:
    the craftax scripts use BatchRenorm wherever the gymnax scripts use
    BatchNorm — for the input norm/dummy AND for NORM_TYPE="batch_norm"
    (pqn_craftax.py:41-51, pqn_rnn_craftax.py:74-87 vs pqn_gymnax.py:38-54).
    Explicit INPUT_NORM_TYPE / literal "batch_renorm" NORM_TYPE override.

    Craftax-family detection checks ENV_NAME too: the reference's own
    pqn_rnn_craftax.yaml ships ALG_NAME "pqn_rnn" while its script hardcodes
    BatchRenorm (pqn_rnn_craftax.py:83-87), so ALG_NAME alone under-detects."""
    family = str(config.get("ALG_NAME", ""))
    env_name = str(config.get("ENV_NAME", "")).lower()
    is_craftax = "craftax" in family or "craftax" in env_name
    norm_type = config["NORM_TYPE"]
    if is_craftax and norm_type == "batch_norm":
        norm_type = "batch_renorm"
    input_norm_type = config.get(
        "INPUT_NORM_TYPE", "batch_renorm" if is_craftax else "batch_norm"
    )
    return norm_type, input_norm_type


def make_q_network(
    config,
    action_dim: int,
    obs_shape,
    norm_axis_name: Optional[str] = None,
):
    dtype = jnp.bfloat16 if config.get("BF16_COMPUTE", False) else jnp.float32
    arch = config.get("ARCH")
    if arch is None:
        arch = "cnn" if len(obs_shape) >= 3 else "mlp"
    norm_type, input_norm_type = resolve_norms(config)

    if arch == "mlp":
        return QNetwork(
            action_dim=action_dim,
            hidden_size=config.get("HIDDEN_SIZE", 128),
            num_layers=config.get("NUM_LAYERS", 2),
            norm_type=norm_type,
            norm_input=config.get("NORM_INPUT", False),
            input_norm_type=input_norm_type,
            norm_axis_name=norm_axis_name,
            dtype=dtype,
        )
    if arch == "cnn":
        return CNNQNetwork(
            action_dim=action_dim,
            norm_type=config["NORM_TYPE"],
            norm_input=config.get("NORM_INPUT", False),
            norm_axis_name=norm_axis_name,
            trunk=config.get("CNN_TRUNK", "minatar"),
            hidden_size=config.get("HIDDEN_SIZE", 128),
            input_scale=config.get("INPUT_SCALE", 255.0),
            dtype=dtype,
        )
    raise ValueError(f"Unknown ARCH '{arch}'")
