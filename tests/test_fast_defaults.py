"""resolve_fast_paths: the TPU default-performance policy.

On a TPU backend a composed reference config auto-enables every
learning-verified fast path it is eligible for (so migrated configs beat
the reference engine by default); PARITY=strict restores the bit-exact
program, explicit flags always win, and non-TPU backends are untouched
(core/config.py:resolve_fast_paths). Reference config surface:
/root/reference/purejaxql/config/alg/*.yaml.
"""

from purejaxql_tpu.core.config import compose, resolve_fast_paths


def _tpu(alg, overrides=()):
    cfg = compose(alg=alg, overrides=list(overrides))
    return resolve_fast_paths(cfg, backend="tpu")


def test_cpu_backend_is_untouched():
    cfg = compose(alg="pqn_cartpole")
    out = resolve_fast_paths(cfg, backend="cpu")
    assert "FUSED_ROLLOUT" not in out and "FAST_BPTT" not in out
    # compose() under the test conftest (cpu backend) is also a no-op
    assert "FUSED_ROLLOUT" not in cfg


def test_cartpole_default_gets_fused_rollout():
    cfg = _tpu("pqn_cartpole")
    assert cfg["FUSED_ROLLOUT"] is True
    assert cfg["EVAL_EARLY_EXIT"] is True
    assert "FAST_TARGETS" not in cfg  # Q_LAMBDA=True config


def test_minatar_default_gets_fused_rollout():
    for game in (
        "Breakout-MinAtar", "Asterix-MinAtar", "SpaceInvaders-MinAtar",
        "Freeway-MinAtar", "Seaquest-MinAtar",
    ):
        cfg = _tpu("pqn_minatar", [f"ENV_NAME={game}"])
        assert cfg["FUSED_ROLLOUT"] is True, game


def test_craftax_default_gets_bank_and_fast_targets():
    cfg = _tpu("pqn_craftax")
    assert "FUSED_ROLLOUT" not in cfg  # optimistic resets: not fused-eligible
    assert cfg["FAST_TARGETS"] is True  # Q_LAMBDA=False + layer_norm
    assert cfg["SKIP_NOOP_PERMUTE"] is True  # NUM_MINIBATCHES=1
    assert cfg["RESET_BANK"] == 256


def test_rnn_families_get_fast_bptt_not_pallas():
    for alg in ("pqn_rnn_cartpole", "pqn_rnn_craftax", "pqn_vdn_spread"):
        cfg = _tpu(alg)
        assert cfg["FAST_BPTT"] is True, alg
        # PALLAS_BPTT stays opt-in (tunneled-runtime warmup pathology)
        assert "PALLAS_BPTT" not in cfg, alg
    assert _tpu("pqn_rnn_craftax")["RESET_BANK"] == 256


def test_pendulum_ac_gets_fused_rollout():
    cfg = _tpu("pqn_pendulum")
    assert cfg["FUSED_ROLLOUT"] is True


def test_parity_strict_disables_everything():
    for alg in (
        "pqn_cartpole", "pqn_minatar", "pqn_craftax",
        "pqn_rnn_cartpole", "pqn_rnn_craftax", "pqn_vdn_spread",
        "pqn_pendulum",
    ):
        cfg = _tpu(alg, ["PARITY=strict"])
        for flag in (
            "FUSED_ROLLOUT", "FAST_TARGETS", "SKIP_NOOP_PERMUTE",
            "RESET_BANK", "FAST_BPTT", "EVAL_EARLY_EXIT",
        ):
            assert flag not in cfg, (alg, flag)


def test_explicit_flags_always_win():
    cfg = _tpu("pqn_cartpole", ["FUSED_ROLLOUT=False"])
    assert cfg["FUSED_ROLLOUT"] is False
    cfg = _tpu("pqn_craftax", ["RESET_BANK=64", "FAST_TARGETS=False"])
    assert cfg["RESET_BANK"] == 64 and cfg["FAST_TARGETS"] is False
    cfg = _tpu("pqn_rnn_cartpole", ["FAST_BPTT=False"])
    assert cfg["FAST_BPTT"] is False


def test_multi_seed_blocks_fused_rollout():
    cfg = _tpu("pqn_cartpole", ["NUM_SEEDS=8"])
    assert "FUSED_ROLLOUT" not in cfg


def test_ineligible_shapes_stay_unfused():
    # batch_norm trunk: no fused kernel
    cfg = _tpu("pqn_cartpole", ["NORM_TYPE=batch_norm"])
    assert "FUSED_ROLLOUT" not in cfg
    # 3-layer cartpole MLP: kernel is 2-layer only
    cfg = _tpu("pqn_cartpole", ["NUM_LAYERS=3"])
    assert "FUSED_ROLLOUT" not in cfg
    # dueling RNN head: FAST_BPTT unsupported
    cfg = _tpu("pqn_rnn_cartpole", ["DUELING=True"])
    assert "FAST_BPTT" not in cfg
