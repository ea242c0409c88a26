"""Annotation-only stand-ins (the reference wrappers use these purely as
type names)."""

from purejaxql_tpu.envs.base import Environment  # noqa: F401


class EnvParams:  # annotation-only
    pass


class EnvState:  # annotation-only
    pass
