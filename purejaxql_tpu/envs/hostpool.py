"""Host env pool: ctypes bridge to the C++ batched env service.

This fills the architectural slot EnvPool occupies in the reference (C++
envs stepped on the host CPU feeding the device learner,
/root/reference/purejaxql/utils/atari_wrapper.py:85-169): a persistent
thread-pooled C++ env batch (purejaxql_tpu/cpp/envhost/) exchanged with JAX as flat
numpy buffers.

Two consumption modes:
- eager: `pool.reset() / pool.step(actions)` from a host training loop
  (algo/stages.train_stepwise style);
- in-graph: `make_callback_env(pool)` returns (reset_fn, step_fn) that run
  inside jit via `jax.experimental.io_callback` — an ordered host callback
  threaded through the scan carry exactly like the reference threads the
  EnvPool XLA handle (atari_wrapper.py:119-146). NOTE: host callbacks are
  unsupported on some TPU runtimes (the tunneled axon backend); the
  callback mode is validated on the CPU backend.

The shared library auto-builds on first use via `make` (g++ only).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

# The C++ sources ship inside the package (purejaxql_tpu/cpp/) so the
# auto-build works from a pip install, not only a source checkout.
_CPP_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "cpp",
)
_LIB_PATH = os.path.join(_CPP_DIR, "build", "libenvhost.so")

_lib = None


def _load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    # make is a no-op when the .so is fresher than the sources, so always
    # invoking it keeps the library in sync with checked-out code; the
    # flock serializes concurrent builders (pytest-xdist workers)
    import fcntl

    os.makedirs(os.path.join(_CPP_DIR, "build"), exist_ok=True)
    with open(os.path.join(_CPP_DIR, "build", ".lock"), "w") as lockf:
        fcntl.flock(lockf, fcntl.LOCK_EX)
        subprocess.run(
            ["make", "-C", _CPP_DIR], check=True, capture_output=True
        )
    lib = ctypes.CDLL(_LIB_PATH)
    lib.eh_make.restype = ctypes.c_void_p
    lib.eh_make.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_uint64,
    ]
    lib.eh_close.argtypes = [ctypes.c_void_p]
    lib.eh_obs_dim.argtypes = [ctypes.c_void_p]
    lib.eh_obs_dim.restype = ctypes.c_int
    lib.eh_num_actions.argtypes = [ctypes.c_void_p]
    lib.eh_num_actions.restype = ctypes.c_int
    lib.eh_num_envs.argtypes = [ctypes.c_void_p]
    lib.eh_num_envs.restype = ctypes.c_int
    lib.eh_obs_rank.argtypes = [ctypes.c_void_p]
    lib.eh_obs_rank.restype = ctypes.c_int
    lib.eh_obs_shape.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32)]
    lib.eh_reset.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
    lib.eh_step.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.eh_load_plugin.argtypes = [ctypes.c_char_p]
    lib.eh_load_plugin.restype = ctypes.c_int
    _lib = lib
    return lib


def load_plugin(so_path: str) -> None:
    """Register an external game plug-in (.so exposing ``eh_plugin_get``)
    with the pool service; afterwards ``HostEnvPool(name)`` resolves the
    plug-in's self-declared env name. This is the EnvPool-extension
    mechanism: real ALE (or any C/C++ game) attaches at runtime without
    recompiling the framework — see docs/ENVHOST_PLUGIN.md for the ABI."""
    lib = _load_library()
    rc = lib.eh_load_plugin(os.fspath(so_path).encode())
    if rc != 0:
        reason = {
            -1: "dlopen failed",
            -2: "missing eh_plugin_get symbol",
            -3: "plugin init returned nonzero",
            -4: "invalid vtable (name/callbacks/shape)",
        }.get(rc, f"error {rc}")
        raise ValueError(f"failed to load plugin {so_path!r}: {reason}")


_bundled_loaded = False


def ensure_bundled_plugins() -> None:
    """Build + register the bundled plug-in games (cpp/plugins/): Pong-EH
    / PongRam-EH (ALE-Pong-class) and Breakout-EH / BreakoutRam-EH
    (ALE-Breakout-class) — two distinct games on the same plug-in socket,
    each with a pixel (84x84x4) and a RAM-style obs build. Idempotent."""
    global _bundled_loaded
    if _bundled_loaded:
        return
    import fcntl

    os.makedirs(os.path.join(_CPP_DIR, "build"), exist_ok=True)
    with open(os.path.join(_CPP_DIR, "build", ".lock"), "w") as lockf:
        fcntl.flock(lockf, fcntl.LOCK_EX)
        for game, libs in (
            ("pong", ("libehpong.so", "libehpong_ram.so")),
            ("breakout", ("libehbreakout.so", "libehbreakout_ram.so")),
        ):
            game_dir = os.path.join(_CPP_DIR, "plugins", game)
            subprocess.run(
                ["make", "-C", game_dir], check=True, capture_output=True
            )
            for lib in libs:
                load_plugin(os.path.join(game_dir, lib))
    _bundled_loaded = True


class HostEnvPool:
    """Batched C++ env pool with auto-reset, gymnax-flavored numpy API."""

    def __init__(
        self,
        env_name: str = "CartPole-v1",
        num_envs: int = 64,
        num_threads: Optional[int] = None,
        seed: int = 0,
    ):
        lib = _load_library()
        if env_name.endswith("-EH"):
            # bundled plug-in games auto-build + register on first use
            ensure_bundled_plugins()
        num_threads = num_threads or min(num_envs, os.cpu_count() or 1)
        self._lib = lib
        self._handle = lib.eh_make(
            env_name.encode(), num_envs, num_threads, seed
        )
        if not self._handle:
            raise ValueError(f"envhost has no native env named '{env_name}'")
        self.num_envs = num_envs
        self.obs_dim = lib.eh_obs_dim(self._handle)
        self.num_actions = lib.eh_num_actions(self._handle)
        rank = lib.eh_obs_rank(self._handle)
        dims = (ctypes.c_int32 * rank)()
        lib.eh_obs_shape(self._handle, dims)
        # logical (unflattened) obs shape, e.g. (10, 10, 4) for grid games
        self.obs_shape = tuple(int(d) for d in dims)

    def reset(self) -> np.ndarray:
        obs = np.empty((self.num_envs, self.obs_dim), np.float32)
        self._lib.eh_reset(
            self._handle, obs.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        return obs

    def step(
        self, actions: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        actions = np.ascontiguousarray(actions, np.int32)
        obs = np.empty((self.num_envs, self.obs_dim), np.float32)
        rewards = np.empty((self.num_envs,), np.float32)
        dones = np.empty((self.num_envs,), np.uint8)
        self._lib.eh_step(
            self._handle,
            actions.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            obs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            rewards.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            dones.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return obs, rewards, dones.astype(bool)

    def close(self):
        if self._handle:
            self._lib.eh_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def make_callback_env(pool: HostEnvPool):
    """(reset_fn, step_fn) usable inside jitted code via io_callback.

    step_fn(token, actions) -> (token, obs, reward, done): the token is a
    dummy scalar threaded through the scan carry to order the callbacks,
    mirroring the reference's EnvPool handle threading
    (atari_wrapper.py:119-124).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import io_callback

    obs_shape = jax.ShapeDtypeStruct((pool.num_envs, pool.obs_dim), jnp.float32)
    rew_shape = jax.ShapeDtypeStruct((pool.num_envs,), jnp.float32)
    done_shape = jax.ShapeDtypeStruct((pool.num_envs,), jnp.bool_)

    def reset_fn():
        obs = io_callback(lambda: pool.reset(), obs_shape, ordered=True)
        return jnp.asarray(0, jnp.int32), obs

    def step_fn(token, actions):
        def _host_step(actions):
            obs, rew, done = pool.step(np.asarray(actions))
            return obs, rew, done

        obs, rew, done = io_callback(
            _host_step, (obs_shape, rew_shape, done_shape), actions,
            ordered=True,
        )
        return token + 1, obs, rew, done

    return reset_fn, step_fn
