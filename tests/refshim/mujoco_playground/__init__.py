"""mujoco_playground-API shim backed by the in-tree continuous envs, so
the unmodified reference AC script (pqn_mujoco_playground.py:15-22 via
utils/brax_wrappers.py:11-13) runs in-image.

`registry.load` + `wrap_for_brax_training` produce a brax-style BATCHED
env (reset over a key vector, key-less step carrying a State struct) over
an in-tree env with a native [-1, 1] action box. Protocol note: brax-style
envs carry reset randomness in state and take no per-step key, while the
in-tree stack passes per-step keys — the two match exactly until an
episode boundary, so the executed AC parity test runs inside the first
episode (see tests/test_parity_reference.py)."""

from . import registry  # noqa: F401
from . import _src  # noqa: F401
