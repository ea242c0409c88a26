from purejaxql_tpu.envs import spaces
from purejaxql_tpu.envs.base import Environment, EnvParams, EnvState, Wrapper
from purejaxql_tpu.envs.registry import make, registered_envs
from purejaxql_tpu.envs import wrappers
