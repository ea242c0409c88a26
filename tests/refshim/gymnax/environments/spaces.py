"""Space classes: re-export the in-tree implementations (same Box/Discrete
surface gymnax exposes)."""

from purejaxql_tpu.envs.spaces import Box, Discrete, Space  # noqa: F401
