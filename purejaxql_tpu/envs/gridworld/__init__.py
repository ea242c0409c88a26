from purejaxql_tpu.envs.gridworld.forager import Forager, ACHIEVEMENTS, NUM_ACHIEVEMENTS
