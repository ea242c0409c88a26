from purejaxql_tpu.envs.minatar.breakout import MinBreakout
from purejaxql_tpu.envs.minatar.asterix import MinAsterix
from purejaxql_tpu.envs.minatar.space_invaders import MinSpaceInvaders
from purejaxql_tpu.envs.minatar.freeway import MinFreeway
from purejaxql_tpu.envs.minatar.seaquest import MinSeaquest
