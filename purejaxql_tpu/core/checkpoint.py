"""Checkpointing: safetensors params I/O (reference-compatible layout) plus
full-state resume the reference lacks.

The reference saves params-only safetensors with keys flattened by
`flatten_dict(sep=",")` (/root/reference/purejaxql/utils/save_load.py:9-16)
and drops optimizer state / batch_stats outside the playground script
(SURVEY.md §5 checkpoint notes). Here `save_params`/`load_params` keep that
wire format for interchange, and `save_state`/`load_state` additionally
persist batch_stats, optimizer state, and progress counters so training can
resume mid-run.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict
from safetensors.flax import load_file, save_file

from purejaxql_tpu.core.config import save_config


def save_params(params: Dict, filename: str) -> None:
    flattened = flatten_dict(params, sep=",")
    save_file(flattened, filename)


def load_params(filename: str) -> Dict:
    flattened = load_file(filename)
    return unflatten_dict(flattened, sep=",")


def save_run(
    params,
    config: Dict[str, Any],
    save_dir: str,
    run_name: str,
    vmapped: bool = True,
) -> str:
    """Save params (+ per-seed unstacking for vmapped states) and a config
    snapshot, mirroring the reference save layout (pqn_gymnax.py:455-473).
    With `vmapped`, the leading seed axis is stripped (one file per seed)."""
    os.makedirs(save_dir, exist_ok=True)
    save_config(config, os.path.join(save_dir, f"{run_name}_config.yaml"))

    num_seeds = config.get("NUM_SEEDS", 1)
    if vmapped and num_seeds > 1:
        for i in range(num_seeds):
            seed_params = jax.tree_util.tree_map(lambda x: x[i], params)
            save_params(
                seed_params,
                os.path.join(save_dir, f"{run_name}_vmap{i}.safetensors"),
            )
    else:
        if vmapped:
            params = jax.tree_util.tree_map(lambda x: x[0], params)
        save_params(params, os.path.join(save_dir, f"{run_name}.safetensors"))
    return save_dir


# -- full-state resume (improvement over the reference) ---------------------


def _tree_to_flat(tree, prefix: str) -> Dict[str, np.ndarray]:
    out = {}
    flat = flatten_dict(
        jax.tree_util.tree_map(np.asarray, tree), sep=","
    ) if isinstance(tree, dict) else None
    if flat is None:
        # generic pytree: enumerate leaves with structure stored separately
        leaves, _ = jax.tree_util.tree_flatten(tree)
        for i, leaf in enumerate(leaves):
            out[f"{prefix}/{i}"] = np.asarray(leaf)
        return out
    for k, v in flat.items():
        out[f"{prefix}/{k}"] = v
    return out


def save_state(train_state, filename: str) -> None:
    """Persist the full PQNTrainState (params, batch_stats, opt_state,
    counters) to one safetensors file."""
    os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
    tensors: Dict[str, np.ndarray] = {}
    tensors.update(_tree_to_flat(train_state.params, "params"))
    if train_state.batch_stats is not None:
        tensors.update(_tree_to_flat(train_state.batch_stats, "batch_stats"))
    opt_leaves = jax.tree_util.tree_leaves(train_state.opt_state)
    for i, leaf in enumerate(opt_leaves):
        tensors[f"opt_state/{i}"] = np.asarray(leaf)
    tensors["counters/step"] = np.asarray(train_state.step)
    tensors["counters/timesteps"] = np.asarray(train_state.timesteps)
    tensors["counters/n_updates"] = np.asarray(train_state.n_updates)
    tensors["counters/grad_steps"] = np.asarray(train_state.grad_steps)
    save_file(tensors, filename)


def load_state(train_state, filename: str):
    """Restore a PQNTrainState saved by `save_state` into a template state
    (same network/optimizer config)."""
    tensors = load_file(filename)
    params = unflatten_dict(
        {
            k[len("params/"):]: v
            for k, v in tensors.items()
            if k.startswith("params/")
        },
        sep=",",
    )
    batch_keys = {
        k[len("batch_stats/"):]: v
        for k, v in tensors.items()
        if k.startswith("batch_stats/")
    }
    batch_stats = unflatten_dict(batch_keys, sep=",") if batch_keys else None

    opt_leaves, opt_treedef = jax.tree_util.tree_flatten(train_state.opt_state)
    new_opt_leaves = [
        jnp.asarray(tensors[f"opt_state/{i}"]) for i in range(len(opt_leaves))
    ]
    opt_state = jax.tree_util.tree_unflatten(opt_treedef, new_opt_leaves)

    return train_state.replace(
        params=params,
        batch_stats=batch_stats if batch_stats is not None else train_state.batch_stats,
        opt_state=opt_state,
        step=jnp.asarray(tensors["counters/step"]),
        timesteps=jnp.asarray(tensors["counters/timesteps"]),
        n_updates=jnp.asarray(tensors["counters/n_updates"]),
        grad_steps=jnp.asarray(tensors["counters/grad_steps"]),
    )
