"""The purerl wrapper surface the reference imports
(pqn_gymnax.py:20: ``from gymnax.wrappers.purerl import
FlattenObservationWrapper, LogWrapper``), backed by the in-tree wrappers
whose semantics replicate gymnax's (envs/wrappers.py)."""

from purejaxql_tpu.envs.base import Wrapper as GymnaxWrapper  # noqa: F401
from purejaxql_tpu.envs.wrappers import (  # noqa: F401
    FlattenObservation as FlattenObservationWrapper,
    Log as LogWrapper,
)
