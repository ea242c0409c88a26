#!/usr/bin/env bash
# Batch experiment runner: train every in-tree config across env families
# (the reference's scripts/train_playground_all.sh role, minus docker —
# everything here runs in-process on the local chip).
#
#   scripts/train_all.sh [quick|full] [extra overrides...]
#
# quick: heavily shortened runs for smoke-validating every family.
set -euo pipefail

MODE="${1:-quick}"
shift || true
EXTRA=("$@")

cd "$(dirname "$0")/.."
# default the compile cache only when UNSET ("-" not ":-"): an explicitly
# EMPTY value opts out — XLA:CPU AOT cache entries don't reliably survive
# the read-back on some hosts, so CPU smoke runs pass JAX_COMPILATION_CACHE_DIR=
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR-$PWD/.jax_cache}"
[ -z "$JAX_COMPILATION_CACHE_DIR" ] && unset JAX_COMPILATION_CACHE_DIR

if [ "$MODE" = "quick" ]; then
  COMMON=(TOTAL_TIMESTEPS=65536 TOTAL_TIMESTEPS_DECAY=65536 TEST_DURING_TRAINING=False)
else
  COMMON=()
fi

run() {
  echo "=== $* ==="
  python -m purejaxql_tpu.cli "$@" "${COMMON[@]}" "${EXTRA[@]}"
}

run +alg=pqn_cartpole
run +alg=pqn_cartpole ENV_NAME=Acrobot-v1
run +alg=pqn_minatar ENV_NAME=Breakout-MinAtar
run +alg=pqn_minatar ENV_NAME=Asterix-MinAtar
run +alg=pqn_minatar ENV_NAME=SpaceInvaders-MinAtar
run +alg=pqn_minatar ENV_NAME=Freeway-MinAtar
run +alg=pqn_minatar ENV_NAME=Seaquest-MinAtar
run +alg=pqn_craftax NUM_ENVS=256
run +alg=pqn_rnn_cartpole
run +alg=pqn_rnn_memory_chain
run +alg=pqn_rnn_craftax NUM_ENVS=256
run +alg=pqn_vdn_spread
run +alg=pqn_vdn_smax
run +alg=pqn_vdn_kitchen
run +alg=pqn_vdn_hanabi
run +alg=pqn_pendulum
run +alg=pqn_reacher
run +alg=pqn_dm_suite
run +alg=pqn_dm_suite ENV_NAME=MountainCarContinuous-v0
run +alg=pqn_dm_suite ENV_NAME=BallInCup-v0
run +alg=pqn_locomotion
run +alg=pqn_locomotion ENV_NAME=Walker-v0
run +alg=pqn_manipulation

echo "all configs trained."
