"""gymnax.environments surface the reference's brax_wrappers imports
(utils/brax_wrappers.py:8): the `environment` module (type annotations
only) and `spaces` (Box/Discrete), aliased to the in-tree spaces."""

from . import environment, spaces  # noqa: F401
