"""brax import surface for the reference's brax_wrappers
(utils/brax_wrappers.py:9-10). Only the names are needed: the playground
path under test never instantiates the brax wrappers."""

from . import envs  # noqa: F401
