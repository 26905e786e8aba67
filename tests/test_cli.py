"""CLI parsing tests (reference flag surface, speecht-cli:37-159)."""

import pytest

from speecht_tpu.cli import CLI


def parse(*args):
    return CLI(list(args)).parsed


def test_no_command():
    assert parse().command is None


def test_base_defaults():
    p = parse("train")
    assert p.feature_type == "power"
    assert p.batch_size == 64
    assert p.run_name == "noname"
    assert p.data_dir == "data"
    assert p.train_dir == "train"
    assert p.log_dir == "log"


def test_run_type_derivation():
    assert parse("train").run_type == "train"
    assert parse("evaluate", "--dev").run_type == "dev"
    assert parse("evaluate").run_type == "test"  # default dataset
    assert parse("record").run_type == "record"
    assert parse("preprocess").run_type == "other"
    assert parse("search").run_type == "other"
    assert parse("export").run_type == "other"


def test_run_train_dir():
    p = parse("train", "--run-name", "abc", "--train-dir", "/tmp/t")
    assert p.run_train_dir == "/tmp/t/abc"


def test_feature_type_flags():
    assert parse("train", "--mfcc").feature_type == "mfcc"
    assert parse("train", "--power").feature_type == "power"


def test_train_defaults_match_reference():
    p = parse("train")
    assert p.learning_rate == 1e-4
    assert p.learning_rate_decay_factor == 0
    assert p.momentum == 0.9
    assert p.max_gradient_norm == 5.0
    assert p.limit_training_set == 0
    assert p.steps_per_checkpoint == 1000
    assert not p.reset_learning_rate


def test_lm_defaults_match_reference():
    p = parse("evaluate", "--language-model", "lm_dir")
    assert p.lm.language_model == "lm_dir"
    assert p.lm.lm_weight == 0.8
    assert p.lm.word_count_weight == 0.0
    assert p.lm.valid_word_count_weight == 2.3
    assert p.lm.beam_width == 100


def test_search_defaults():
    p = parse("search")
    assert p.population_size == 10
    assert p.noise_std == 0.5
    assert not p.use_ui


def test_evaluate_no_save():
    assert parse("evaluate").should_save
    assert not parse("evaluate", "--no-save").should_save


def test_preprocess_only_flags():
    p = parse("preprocess", "--train-only")
    assert p.train_only and not p.test_only and not p.dev_only


def test_tpu_native_flags():
    p = parse(
        "train", "--data-parallel", "4", "--model-parallel", "2",
        "--compute-dtype", "float32", "--bucket-step", "128",
        "--max-steps", "10", "--profile-steps", "3:6",
    )
    assert p.data_parallel == 4
    assert p.model_parallel == 2
    assert p.compute_dtype == "float32"
    assert p.bucket_step == 128
    assert p.max_steps == 10
    assert p.profile_steps == "3:6"


def test_record_streaming_flag():
    assert parse("record", "--streaming").streaming
    assert not parse("record").streaming


def test_record_audio_source_flag():
    assert parse("record").audio_source is None
    assert parse("record", "--audio-source", "a.flac").audio_source == [
        "a.flac"
    ]
    assert parse(
        "record", "--audio-source", "a.flac", "b.flac"
    ).audio_source == ["a.flac", "b.flac"]


class TestDistributedInit:
    def test_noop_without_coordinator_env(self, monkeypatch):
        from speecht_tpu import runtime

        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        assert runtime.init_distributed() is False

    def test_cli_joins_coordinator(self, monkeypatch, tmp_path):
        """`speecht-cli <cmd>` must call jax.distributed.initialize when
        launched under the standard multi-process env (weak spot: the init
        path must not be dead code)."""
        import types

        import jax

        from speecht_tpu.cli import CLI

        calls = {}

        def fake_initialize(coordinator_address, num_processes, process_id):
            calls.update(
                addr=coordinator_address, n=num_processes, pid=process_id
            )

        monkeypatch.setattr(jax.distributed, "initialize", fake_initialize)
        monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
        monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
        monkeypatch.setenv("JAX_PROCESS_ID", "2")

        cli = CLI(
            [
                "evaluate", "--test",
                "--data-dir", str(tmp_path / "data"),
                "--train-dir", str(tmp_path / "train"),
                "--log-dir", str(tmp_path / "log"),
            ]
        )
        monkeypatch.setattr(
            CLI,
            "command_executor",
            property(
                lambda self: types.SimpleNamespace(run=lambda: "ran")
            ),
        )
        assert cli.run() == "ran"
        assert calls == {"addr": "10.0.0.1:1234", "n": 4, "pid": 2}
