"""End-to-end CLI slice: preprocess -> train -> evaluate -> export.

The TPU-world equivalent of running the reference's full command surface on
a tiny corpus: the bundled LibriSpeech fixture becomes a 1-utterance
train/dev/test corpus, then every executor runs through the real CLI with a
small step budget. Exercises the whole stack — native FLAC decode, feature
cache, prefetch loader, jitted train step, checkpointing, greedy decode,
metrics, weight export.
"""

import os
import shutil

import jax
import numpy as np
import pytest

from speecht_tpu import corpus as corpus_mod
from speecht_tpu.cli import CLI

FIXTURE_DIR = "/root/reference/speecht/tests/data"
FIXTURE_ID = "1089-134686-0037"

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE_DIR), reason="fixture unavailable"
)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    data = root / "data"
    for split in ("train", "dev", "test"):
        d = data / split
        d.mkdir(parents=True)
        shutil.copy(
            os.path.join(FIXTURE_DIR, "train", FIXTURE_ID + ".flac"), d
        )
        shutil.copy(
            os.path.join(FIXTURE_DIR, "train", "1089-134686.trans.txt"), d
        )
    # pre-mark every corpus set as extracted so no download is attempted
    for set_type, set_name in corpus_mod.DATA_SETS:
        (data / set_type / set_name).mkdir(parents=True, exist_ok=True)
    # build the feature cache up front so every test is independently
    # runnable (test_preprocess re-runs it, which also covers idempotence)
    run_cli(root, "preprocess", "--num-workers", "1")
    return root


def run_cli(workdir, *args):
    common = [
        "--data-dir", str(workdir / "data"),
        "--train-dir", str(workdir / "train"),
        "--log-dir", str(workdir / "log"),
        "--run-name", "e2e",
        "--batch-size", "1",
    ]
    # subcommand first, then common defaults, then per-test overrides
    return CLI([args[0]] + common + list(args[1:])).run()


def test_preprocess(workdir):
    run_cli(workdir, "preprocess", "--num-workers", "1")
    cache = workdir / "data" / "preprocessed-power"
    for split in ("train", "dev", "test"):
        files = list((cache / split).glob("*.npz"))
        assert len(files) == 1, split
    data = np.load(cache / "train" / (FIXTURE_ID + ".npz"))
    assert data["audio_fragments"].shape == (1 + 114881 // 160, 128)


@pytest.mark.parametrize("feature_flag", ["--power", "--mfcc"])
def test_preprocess_device_matches_host_cache(workdir, tmp_path,
                                              feature_flag):
    """`preprocess --device` (batched TPU DSP) writes a cache numerically
    equivalent to the host DSP path, same layout (VERDICT r2 #3 / the
    north star's device front-end for bulk preprocessing)."""
    dev_root = tmp_path / "devpre"
    shutil.copytree(workdir / "data", dev_root / "data")
    # wipe any cache copied from the host run
    for sub in (dev_root / "data").glob("preprocessed*"):
        shutil.rmtree(sub)
    run_cli(dev_root, "preprocess", "--device", feature_flag)
    run_cli(workdir, "preprocess", "--num-workers", "1", feature_flag)
    cache_name = (
        "preprocessed-power" if feature_flag == "--power" else "preprocessed"
    )
    for split in ("train", "dev", "test"):
        host_files = sorted(
            (workdir / "data" / cache_name / split).glob("*.npz")
        )
        dev_files = sorted(
            (dev_root / "data" / cache_name / split).glob("*.npz")
        )
        assert [f.name for f in dev_files] == [f.name for f in host_files]
        for hf, df in zip(host_files, dev_files):
            h = np.load(hf)
            d = np.load(df)
            assert d["audio_fragments"].shape == h["audio_fragments"].shape
            assert d["audio_fragments"].dtype == np.float32
            # two-level bound: the bulk must sit inside the host/device
            # DSP parity tolerance; a sub-percent tail of near-silent
            # bins may wander a little further (int16 audio wire noise
            # interacting with the top_db floor; reader.py wire notes)
            diff = np.abs(
                d["audio_fragments"] - h["audio_fragments"]
            )
            tol = 2e-2 + 1e-2 * np.abs(h["audio_fragments"])
            frac_out = float(np.mean(diff > tol))
            assert frac_out < 0.005, frac_out
            assert float(diff.max()) < 0.15, float(diff.max())
            np.testing.assert_array_equal(h["transcript"], d["transcript"])


def test_train_two_steps(workdir):
    state = run_cli(
        workdir,
        "train",
        "--max-steps", "2",
        "--steps-per-checkpoint", "1",
        "--learning-rate", "1e-4",
        "--verbose-summaries",
    )
    assert int(state.step) == 2
    # checkpoint written
    from speecht_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(workdir / "train" / "e2e"))
    assert mgr.latest_step() == 2
    mgr.close()
    # training summaries written, incl. verbose images + activation
    # histograms (reference speech_model.py:49-51,158-178 parity)
    logs = list((workdir / "log" / "e2e_train").glob("events.out.tfevents.*"))
    assert logs
    import tensorflow as tf
    from tensorflow.core.util import event_pb2

    tags = {"image": set(), "histo": set(), "scalar": set()}
    for raw in tf.data.TFRecordDataset(str(logs[0])):
        e = event_pb2.Event()
        e.ParseFromString(raw.numpy())
        for v in e.summary.value:
            if v.HasField("image"):
                tags["image"].add(v.tag)
            elif v.HasField("histo"):
                tags["histo"].add(v.tag)
            elif v.HasField("simple_value"):
                tags["scalar"].add(v.tag)
    assert {"loss", "learning_rate", "grad_norm", "step_time"} <= tags["scalar"]
    assert "logits" in tags["image"]
    assert any(t.endswith("kernel") for t in tags["image"])  # filter images
    assert any(t.startswith("activations/") for t in tags["histo"])
    assert any(t.endswith("bias") for t in tags["histo"])


def test_train_resumes_from_checkpoint(workdir):
    state = run_cli(
        workdir,
        "train",
        "--max-steps", "1",
        "--steps-per-checkpoint", "1",
    )
    assert int(state.step) == 3  # resumed from step 2


def test_evaluate(workdir, capsys):
    stats = run_cli(workdir, "evaluate", "--test", "--step-count", "1")
    assert stats.decodings_counter == 1
    out = capsys.readouterr().out
    assert "expected: " in out
    assert "Global statistics" in out
    # the expected transcript is the fixture's text
    assert "in the silence their dark fire kindled the dusk into a tawny glow" in out
    # 4-decimal stats twin: tools/{hard_search_drill,librispeech_scale_soak}
    # parse this exact format — the 2-decimal parity summary can't resolve
    # deltas near the hard-corpus error floor
    import re

    assert re.search(r"^precise: LER \d\.\d{4} WER \d\.\d{4}$", out, re.M), out


def _write_lm(workdir):
    lm_dir = workdir / "lm"
    if not lm_dir.exists():
        lm_dir.mkdir()
        from tests.test_beam import ARPA

        (lm_dir / "model.arpa").write_text(ARPA)
        (lm_dir / "vocabulary").write_text(
            "in\nthe\nsilence\ntheir\ndark\nfire\nkindled\ndusk\ninto\na\n"
            "tawny\nglow\n"
        )
    return lm_dir


def test_evaluate_with_language_model(workdir, capsys):
    lm_dir = _write_lm(workdir)
    stats = run_cli(
        workdir,
        "evaluate", "--test", "--step-count", "1", "--no-save",
        "--language-model", str(lm_dir), "--beam-width", "8",
    )
    assert stats.decodings_counter == 1
    out = capsys.readouterr().out
    assert "Global statistics" in out


def test_evaluate_with_device_beam(workdir, capsys):
    """--device-beam runs the LM-fused beam on the accelerator itself and
    must decode exactly like the host C++ beam on this fixture."""
    lm_dir = _write_lm(workdir)

    def decoded(out):
        return [l for l in out.splitlines() if l.startswith("decoded:")]

    stats_host = run_cli(
        workdir,
        "evaluate", "--test", "--step-count", "1", "--no-save",
        "--language-model", str(lm_dir), "--beam-width", "8",
    )
    host_out = capsys.readouterr().out
    stats_dev = run_cli(
        workdir,
        "evaluate", "--test", "--step-count", "1", "--no-save",
        "--language-model", str(lm_dir), "--beam-width", "8",
        "--device-beam",
    )
    dev_out = capsys.readouterr().out
    assert stats_dev.decodings_counter == 1
    assert decoded(dev_out) == decoded(host_out)
    assert stats_dev.letter_error_rate == stats_host.letter_error_rate


def test_evaluate_device_beam_rescore(workdir, capsys):
    """--device-beam --rescore N: acoustic n-best on device, host LM
    rescoring; must run through the CLI and count its decodings."""
    lm_dir = _write_lm(workdir)
    stats = run_cli(
        workdir,
        "evaluate", "--test", "--step-count", "1", "--no-save",
        "--language-model", str(lm_dir), "--beam-width", "8",
        "--device-beam", "--rescore", "4",
    )
    assert stats.decodings_counter == 1
    capsys.readouterr()


def test_device_beam_accepts_binary_only_bundle(workdir, capsys):
    """A binary-only LM directory (the released bundle layout) feeds the
    fused device beam directly — DeviceLM.from_binary builds the HBM
    tables from the PROBING binary's raw hash tables; the decode must
    equal the ARPA-fed device beam's."""
    from speecht_tpu import native

    arpa_dir = _write_lm(workdir)
    bundle = workdir / "lm-binary-only"
    bundle.mkdir(exist_ok=True)
    native.lm_write_binary(
        str(arpa_dir / "model.arpa"), str(bundle / "kenlm-model.binary")
    )
    run_cli(
        workdir,
        "evaluate", "--test", "--step-count", "1", "--no-save",
        "--language-model", str(bundle), "--device-beam",
        "--beam-width", "16",
    )
    out_binary = capsys.readouterr().out
    run_cli(
        workdir,
        "evaluate", "--test", "--step-count", "1", "--no-save",
        "--language-model", str(arpa_dir), "--device-beam",
        "--beam-width", "16",
    )
    out_arpa = capsys.readouterr().out

    def decoded_lines(text):
        return [
            line for line in text.splitlines() if line.startswith("decoded:")
        ]

    assert decoded_lines(out_binary) == decoded_lines(out_arpa)
    assert decoded_lines(out_binary)


def test_evaluate_with_kenlm_binary_bundle(workdir, capsys):
    # released-bundle layout: kenlm-model.binary + vocabulary (reference
    # speecht-cli:84-88); the binary is read natively and must decode
    # identically to the ARPA source
    from speecht_tpu import native

    arpa_dir = _write_lm(workdir)
    bundle = workdir / "lm-binary"
    bundle.mkdir(exist_ok=True)
    native.lm_write_binary(
        str(arpa_dir / "model.arpa"), str(bundle / "kenlm-model.binary")
    )
    (bundle / "vocabulary").write_text(
        (arpa_dir / "vocabulary").read_text()
    )

    stats_arpa = run_cli(
        workdir,
        "evaluate", "--test", "--step-count", "1", "--no-save",
        "--language-model", str(arpa_dir), "--beam-width", "8",
    )
    arpa_out = capsys.readouterr().out
    stats_bin = run_cli(
        workdir,
        "evaluate", "--test", "--step-count", "1", "--no-save",
        "--language-model", str(bundle), "--beam-width", "8",
    )
    bin_out = capsys.readouterr().out
    assert stats_bin.decodings_counter == 1
    assert stats_bin.letter_error_rate == stats_arpa.letter_error_rate

    def decoded(out):
        return [l for l in out.splitlines() if l.startswith("decoded:")]

    assert decoded(bin_out) == decoded(arpa_out)


def test_evaluate_from_audio_with_language_model(workdir, capsys):
    lm_dir = _write_lm(workdir)
    stats = run_cli(
        workdir,
        "evaluate", "--test", "--step-count", "1", "--no-save",
        "--from-audio",
        "--language-model", str(lm_dir), "--beam-width", "8",
    )
    assert stats.decodings_counter == 1
    capsys.readouterr()


def test_parameter_search(workdir, capsys):
    lm_dir = _write_lm(workdir)
    from speecht_tpu.cli import CLI

    cli = CLI(
        [
            "search",
            "--language-model", str(lm_dir),
            "--noise-std", "0.5",
            "--population-size", "3",
            "--step-count", "1",
            "--beam-width", "8",
            "--data-dir", str(workdir / "data"),
            "--train-dir", str(workdir / "train"),
            "--log-dir", str(workdir / "log"),
            "--run-name", "e2e",
            "--batch-size", "1",
        ]
    )
    cli._ensure_directories()
    executor = cli.command_executor
    candidates = executor.run(max_iterations=3)
    assert len(candidates) >= 1
    assert all(c.score is not None for c in candidates)
    # population sorted ascending by score
    scores = [c.score for c in candidates]
    assert scores == sorted(scores)
    out = capsys.readouterr().out
    assert "Candidate" in out
    # 4-decimal candidate twin: tools/hard_search_drill.py parses this
    # exact format (near an error floor the 2-decimal parity candidate
    # lines collapse distinct scores onto one value)
    import re

    assert re.search(
        r"^candidate-precise: score -?\d+\.\d{4} lm_weight -?\d+\.\d{4} "
        r"wc_weight -?\d+\.\d{4} valid_wc_weight -?\d+\.\d{4} "
        r"LER \d\.\d{4} WER \d\.\d{4}$",
        out,
        re.M,
    ), out


def test_parameter_search_ui(workdir, monkeypatch):
    """`search --ui` executes the curses draw loop (VERDICT r3 weak #5).

    curses.wrapper is replaced by a direct call with a recording screen
    (no tty in CI); the _report stdscr branch — clear/addstr/refresh per
    iteration — runs for real, so a TypeError or bad coordinates in the
    draw code fails here instead of shipping."""
    lm_dir = _write_lm(workdir)
    from speecht_tpu.cli import CLI

    class FakeScreen:
        def __init__(self):
            self.cleared = 0
            self.refreshed = 0
            self.lines = []

        def clear(self):
            self.cleared += 1

        def addstr(self, y, x, s):
            assert isinstance(y, int) and isinstance(x, int)
            assert y >= 0 and x >= 0
            self.lines.append((y, x, str(s)))

        def refresh(self):
            self.refreshed += 1

    screen = FakeScreen()
    import curses

    monkeypatch.setattr(curses, "wrapper", lambda fn: fn(screen))

    cli = CLI(
        [
            "search", "--ui",
            "--language-model", str(lm_dir),
            "--noise-std", "0.5",
            "--population-size", "3",
            "--step-count", "1",
            "--beam-width", "8",
            "--data-dir", str(workdir / "data"),
            "--train-dir", str(workdir / "train"),
            "--log-dir", str(workdir / "log"),
            "--run-name", "e2e",
            "--batch-size", "1",
        ]
    )
    cli._ensure_directories()
    candidates = cli.command_executor.run(max_iterations=2)
    assert len(candidates) >= 1
    # initial candidate + 2 iterations, each redrawing the population
    assert screen.cleared == 3 and screen.refreshed == 3
    headers = [s for (y, x, s) in screen.lines if y == 0]
    assert any("Current population after" in h for h in headers)
    # every candidate row lands below the header line
    assert all(y >= 2 for (y, x, s) in screen.lines if "Candidate" in s)


def test_parameter_search_device_beam(workdir, capsys):
    """search --device-beam: candidates re-run the on-chip beam over
    device-resident cached emissions."""
    lm_dir = _write_lm(workdir)
    from speecht_tpu.cli import CLI

    cli = CLI(
        [
            "search",
            "--language-model", str(lm_dir),
            "--device-beam",
            "--noise-std", "0.5",
            "--population-size", "3",
            "--step-count", "1",
            "--beam-width", "8",
            "--data-dir", str(workdir / "data"),
            "--train-dir", str(workdir / "train"),
            "--log-dir", str(workdir / "log"),
            "--run-name", "e2e",
            "--batch-size", "1",
        ]
    )
    cli._ensure_directories()
    candidates = cli.command_executor.run(max_iterations=2)
    assert len(candidates) >= 1
    assert all(c.score is not None for c in candidates)
    capsys.readouterr()


def test_evaluate_from_audio_device_beam(workdir, capsys):
    """--from-audio --device-beam: raw audio -> on-device front end ->
    forward -> blank collapse -> on-device LM beam, one chip round trip."""
    lm_dir = _write_lm(workdir)
    stats = run_cli(
        workdir,
        "evaluate", "--test", "--step-count", "1", "--no-save",
        "--from-audio",
        "--language-model", str(lm_dir), "--beam-width", "8",
        "--device-beam",
    )
    assert stats.decodings_counter == 1
    capsys.readouterr()


def test_evaluate_from_audio_matches_cached(workdir, capsys):
    # on-device front end must produce the same decode as the cached path
    stats_cached = run_cli(
        workdir, "evaluate", "--test", "--step-count", "1", "--no-save"
    )
    cached_out = capsys.readouterr().out
    stats_audio = run_cli(
        workdir, "evaluate", "--test", "--step-count", "1", "--no-save",
        "--from-audio",
    )
    audio_out = capsys.readouterr().out
    assert stats_audio.decodings_counter == 1

    def decoded_line(out):
        return next(
            line for line in out.splitlines() if line.startswith("decoded:")
        )

    assert decoded_line(audio_out) == decoded_line(cached_out)


def test_evaluate_from_audio_partial_batch_loss_finite(workdir, capsys):
    """Padded rows of a partial batch produce nan FEATURES (0/0 in the
    masked normalize); the loss average must where-mask them out instead
    of nan-poisoning the batch statistic (regression: pre-round-3
    `evaluate --from-audio` printed `loss nan` at any batch size larger
    than the corpus remainder)."""
    stats = run_cli(
        workdir, "evaluate", "--test", "--step-count", "1", "--no-save",
        "--from-audio", "--batch-size", "4",
    )
    out = capsys.readouterr().out
    assert stats.decodings_counter == 1
    loss_line = next(
        l for l in out.splitlines() if "validation average loss" in l
    )
    assert "nan" not in loss_line


def test_max_input_frames_skips_long_utterances(workdir, capsys, caplog):
    # the fixture utterance is 719 frames; a 100-frame cap must skip it
    # with a warning (reference preprocessing.py:272-276 max_size semantics)
    import logging

    with caplog.at_level(logging.WARNING):
        stats = run_cli(
            workdir,
            "evaluate", "--test", "--step-count", "1", "--no-save",
            "--max-input-frames", "100",
        )
    capsys.readouterr()
    assert stats.decodings_counter == 0
    assert any("too long" in r.message for r in caplog.records)

    # a generous cap lets it through
    stats = run_cli(
        workdir,
        "evaluate", "--test", "--step-count", "1", "--no-save",
        "--max-input-frames", "2000",
    )
    capsys.readouterr()
    assert stats.decodings_counter == 1


def test_train_seq_parallel_matches_dense(workdir, capsys):
    # one SP training step through the CLI must produce the same updated
    # parameters as a dense step (same init seed, same single utterance)
    import jax
    import numpy as np

    from speecht_tpu.train.checkpoint import CheckpointManager

    for name, extra in (
        ("e2e-spd", []),
        ("e2e-sp2", ["--seq-parallel", "2"]),
    ):
        run_cli(
            workdir,
            "train",
            "--run-name", name,
            "--max-steps", "1",
            "--steps-per-checkpoint", "1",
            *extra,
        )
    capsys.readouterr()

    def params_of(name):
        from speecht_tpu.config import TrainConfig
        from speecht_tpu.execution import build_model, init_state

        model = build_model(128, TrainConfig())
        state, _ = init_state(model, TrainConfig())
        mgr = CheckpointManager(str(workdir / "train" / name))
        state = mgr.restore(state)
        mgr.close()
        return state.params

    dense, sp = params_of("e2e-spd"), params_of("e2e-sp2")
    for a, b in zip(
        jax.tree_util.tree_leaves(dense), jax.tree_util.tree_leaves(sp)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        )


def test_evaluate_seq_parallel_matches_dense(workdir, capsys):
    # long-utterance SP evaluate through the CLI: 2-way time shard must
    # reproduce the dense greedy decode exactly
    stats_dense = run_cli(
        workdir, "evaluate", "--test", "--step-count", "1", "--no-save"
    )
    dense_out = capsys.readouterr().out
    stats_sp = run_cli(
        workdir, "evaluate", "--test", "--step-count", "1", "--no-save",
        "--seq-parallel", "2",
    )
    sp_out = capsys.readouterr().out
    assert stats_sp.decodings_counter == 1
    assert stats_sp.letter_error_rate == stats_dense.letter_error_rate

    def decoded_line(out):
        return next(
            line for line in out.splitlines() if line.startswith("decoded:")
        )

    assert decoded_line(sp_out) == decoded_line(dense_out)


def test_reference_weights_gate_command(workdir, capsys):
    # rehearse the best_run parity gate (docs/parity_gate.md) with a
    # synthesized checkpoint in the released layout; the command is the
    # exact gate command, only the weights are stand-ins (zero egress)
    import sys

    sys.path.insert(0, "tools")
    from tools.make_best_run_fixture import make_fixture

    best_run = workdir / "train" / "best_run"
    best_run.mkdir(parents=True, exist_ok=True)
    make_fixture(str(best_run), input_size=128)

    stats = run_cli(
        workdir,
        "evaluate", "--test", "--no-save",
        "--reference-weights", str(best_run),
    )
    out = capsys.readouterr().out
    assert stats.decodings_counter == 1
    assert "Global statistics" in out
    assert "LER" in out and "WER" in out


def test_mfcc_pipeline(workdir, capsys):
    # the 39-dim mfcc path end to end: preprocess -> train 1 step -> evaluate
    run_cli(workdir, "preprocess", "--num-workers", "1", "--mfcc")
    cache = workdir / "data" / "preprocessed"  # no -power suffix for mfcc
    files = list((cache / "train").glob("*.npz"))
    assert len(files) == 1
    data = np.load(files[0])
    assert data["audio_fragments"].shape[1] == 39

    state = run_cli(
        workdir, "train", "--mfcc",
        "--max-steps", "1", "--steps-per-checkpoint", "1",
        "--run-name", "e2e-mfcc",
    )
    assert int(state.step) == 1
    stats = run_cli(
        workdir, "evaluate", "--mfcc", "--test", "--step-count", "1",
        "--no-save", "--run-name", "e2e-mfcc",
    )
    assert stats.decodings_counter == 1
    capsys.readouterr()


def test_model_size_flags(workdir, capsys):
    # a scaled-down network trains and evaluates through the CLI; the
    # exported kernel shapes reflect the flags
    size = [
        "--base-channels", "32",
        "--wide-channels", "64",
        "--num-body-layers", "2",
    ]
    state = run_cli(
        workdir,
        "train", "--run-name", "e2e-small",
        "--max-steps", "1", "--steps-per-checkpoint", "1", *size,
    )
    assert int(state.step) == 1
    k8 = jax.tree_util.tree_leaves(
        {"k": state.params["conv_3"]["kernel"]}
    )[0]
    assert k8.shape == (32, 32, 64)  # wide layer at the scaled width
    stats = run_cli(
        workdir,
        "evaluate", "--test", "--step-count", "1", "--no-save",
        "--run-name", "e2e-small", *size,
    )
    capsys.readouterr()
    assert stats.decodings_counter == 1



def test_export(workdir):
    written = run_cli(
        workdir,
        "export",
        "--weights", str(workdir / "weights"),
        "--input-size", "128",
    )
    assert len(written) == 22  # 11 conv layers x (kernel, bias)
    kernel0 = np.load(workdir / "weights" / "conv_0" / "kernel.npy")
    assert kernel0.shape == (48, 128, 250)


def test_export_stablehlo_serving_artifact(workdir):
    """`export --stablehlo` ships a runnable self-contained program."""
    import glob

    from speecht_tpu import serving

    out = workdir / "serving"
    run_cli(
        workdir,
        "export",
        "--stablehlo", str(out),
        "--export-platforms", "cpu",
        "--input-size", "128",
    )
    exported, manifest = serving.load_stablehlo(str(out))
    assert manifest["input_size"] == 128
    assert manifest["feature_type"] == "power"
    # drive it with the real cached fixture features (shape-polymorphic:
    # this batch/frame combo was never named at export time)
    npz = sorted(
        glob.glob(
            str(workdir / "data" / "preprocessed-power" / "**" / "*.npz"),
            recursive=True,
        )
    )
    feats = np.load(npz[0])["audio_fragments"].astype(np.float32)
    frames = len(feats) - (len(feats) % 2)  # artifact wants even frames
    batch = feats[None, :frames]
    lens = np.array([frames], np.int32)
    ids, id_lens, logits = exported.call(batch, lens)
    assert np.asarray(logits).shape == (1, frames // 2, 29)
    # a 2-step model may greedily decode to all-blank (n == 0); the
    # contract under test is shapes/ranges/padding, not quality
    n = int(np.asarray(id_lens)[0])
    row = np.asarray(ids)[0]
    assert 0 <= n <= frames // 2
    assert np.all((row[:n] >= 0) & (row[:n] < 28))
    assert np.all(row[n:] == -1)


def test_export_stablehlo_from_audio(workdir):
    """`export --stablehlo --from-audio --wire-sr 16000`: the artifact
    ingests raw int16 audio at the corpus native rate and carries the
    fused on-device resample + feature DSP."""
    from speecht_tpu import native, serving

    out = workdir / "serving_audio"
    run_cli(
        workdir,
        "export",
        "--stablehlo", str(out),
        "--from-audio",
        "--wire-sr", "16000",
        "--export-platforms", "cpu",
        "--input-size", "128",
    )
    exported, manifest = serving.load_stablehlo(str(out))
    assert manifest["from_audio"] is True and manifest["wire_sr"] == 16000
    gran = manifest["audio_granularity_samples"]
    flac = str(workdir / "data" / "train" / (FIXTURE_ID + ".flac"))
    audio, sr = native.load_audio(flac, sr=None)
    assert int(sr) == 16000
    pcm = np.clip(np.rint(audio * 32768.0), -32768, 32767).astype(np.int16)
    S = -(-len(pcm) // gran) * gran
    batch = np.zeros((1, S), np.int16)
    batch[0, : len(pcm)] = pcm
    ids, id_lens, logits = exported.call(
        batch, np.array([len(pcm)], np.int32)
    )
    assert np.asarray(logits).ndim == 3 and np.asarray(logits).shape[2] == 29
    n = int(np.asarray(id_lens)[0])
    assert 0 <= n <= np.asarray(ids).shape[1]


def test_sigterm_saves_checkpoint(workdir):
    """Preemption drill: SIGTERM mid-training must crash-save the latest
    step (cloud schedulers send SIGTERM before evicting a worker)."""
    import signal
    import subprocess
    import sys
    import time as time_mod

    script = f"""
import sys
sys.path.insert(0, {repr(os.getcwd())})
from speecht_tpu import runtime
runtime.honor_platform_env()
from speecht_tpu.cli import main
main([
    "train", "--run-name", "e2e-term", "--batch-size", "1",
    "--steps-per-checkpoint", "1000",
    "--data-dir", {repr(str(workdir / 'data'))},
    "--train-dir", {repr(str(workdir / 'train'))},
    "--log-dir", {repr(str(workdir / 'log'))},
])
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-c", script],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        env=env,
    )
    # wait until the loop has actually started (a fixed sleep flakes when
    # the single host core is contended and 20 s isn't enough to even
    # finish imports): "Begin training" prints right before the SIGTERM
    # handler installs, then a short grace covers handler + first step.
    deadline = time_mod.time() + 240
    run_dir = workdir / "train" / "e2e-term"
    head = []
    for line in proc.stdout:
        head.append(line)
        if "Begin training" in line:
            break
        assert time_mod.time() < deadline, "".join(head)[-2000:]
    else:
        raise AssertionError(
            "child exited before training began:\n" + "".join(head)[-2000:]
        )
    time_mod.sleep(5)
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=deadline - time_mod.time())
    out = "".join(head) + out
    assert "Interrupted -- saving checkpoint before exit" in out, out[-2000:]
    assert proc.returncode == 0, out[-2000:]

    from speecht_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(run_dir))
    saved = mgr.latest_step()
    mgr.close()
    assert saved is not None and saved >= 1, saved


def test_train_and_evaluate_data_parallel(workdir, capsys):
    """batch 8 on the 8-device CPU mesh: the full CLI train/evaluate path
    under real data parallelism (loader -> shard_batch -> acc step)."""
    assert len(jax.devices()) == 8
    state = run_cli(
        workdir,
        "train", "--run-name", "e2e-dp",
        "--batch-size", "8",
        "--max-steps", "2",
        "--steps-per-checkpoint", "1",
    )
    assert int(state.step) == 2
    # the single fixture utterance repeats across the batch via the
    # infinite generator; params must come back finite and sharded-safe
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)

    stats = run_cli(
        workdir,
        "evaluate", "--test", "--step-count", "1", "--no-save",
        "--run-name", "e2e-dp", "--batch-size", "8",
    )
    capsys.readouterr()
    # only 1 real utterance exists; the rest of the batch is padding
    assert stats.decodings_counter == 1


def test_train_grad_accum(workdir, capsys):
    """`train --grad-accum 2` through the CLI: 4 micro-batches = 2
    optimizer applies; the device step counter advances per APPLY while
    the run's micro-batch counter drives --max-steps."""
    state = run_cli(
        workdir,
        "train",
        "--max-steps", "4",
        "--steps-per-checkpoint", "2",
        "--grad-accum", "2",
        "--run-name", "e2e_ga",
    )
    out = capsys.readouterr().out
    assert "gradient accumulation: 2 micro-batches per update" in out
    assert "effective batch 2" in out
    assert int(state.step) == 2  # optimizer applies, not micro-batches
    assert "global step 4" in out  # loop counts micro-batches


def test_train_grad_accum_resume_step_units(workdir, capsys):
    """Resuming a --grad-accum run continues the micro-batch counter.

    state.step counts optimizer applies (half the micro-batches at G=2);
    checkpoint labels and the printed "global step" lines are in
    micro-batch units — the unit --max-steps uses — so a restart must
    scale the restored apply count back up instead of silently halving
    the visible step counter (the round-4 soak hit exactly this)."""
    from speecht_tpu.train.checkpoint import CheckpointManager

    run_cli(
        workdir,
        "train",
        "--max-steps", "4",
        "--steps-per-checkpoint", "2",
        "--grad-accum", "2",
        "--run-name", "e2e_ga_resume",
    )
    capsys.readouterr()
    ckpt_dir = str(workdir / "train" / "e2e_ga_resume")
    mgr = CheckpointManager(ckpt_dir)
    assert mgr.latest_step() == 4  # micro-batch label, not 2 applies
    mgr.close()

    state = run_cli(
        workdir,
        "train",
        "--max-steps", "2",
        "--steps-per-checkpoint", "2",
        "--grad-accum", "2",
        "--run-name", "e2e_ga_resume",
    )
    out = capsys.readouterr().out
    assert "Restored model at step 4" in out
    assert "global step 6" in out  # 4 resumed + 2 micro-batches this run
    assert int(state.step) == 3  # 3 optimizer applies total
    mgr = CheckpointManager(ckpt_dir)
    assert mgr.latest_step() == 6
    mgr.close()


def test_train_resume_with_different_grad_accum(workdir, capsys):
    """The step counter survives a --grad-accum change across a resume.

    The checkpoint label (micro-batch units) is authoritative; deriving
    the resumed counter as state.step * G would read 6 applies * 4 = 24
    here instead of 6 — phantom progress in the unit --max-steps, the
    printed lines, and subsequent labels share."""
    from speecht_tpu.train.checkpoint import CheckpointManager

    run_cli(
        workdir,
        "train",
        "--max-steps", "6",
        "--steps-per-checkpoint", "3",
        "--run-name", "e2e_ga_switch",  # no accumulation: label == applies
    )
    capsys.readouterr()
    ckpt_dir = str(workdir / "train" / "e2e_ga_switch")
    mgr = CheckpointManager(ckpt_dir)
    assert mgr.latest_step() == 6
    mgr.close()

    state = run_cli(
        workdir,
        "train",
        "--max-steps", "4",
        "--steps-per-checkpoint", "2",
        "--grad-accum", "4",  # resumed with a DIFFERENT accumulation
        "--run-name", "e2e_ga_switch",
    )
    out = capsys.readouterr().out
    assert "Restored model at step 6" in out  # label, not 6 applies * 4
    assert "global step 10" in out  # 6 resumed + 4 micro-batches this run
    assert int(state.step) == 7  # 6 prior applies + 4/4 this run
    mgr = CheckpointManager(ckpt_dir)
    assert mgr.latest_step() == 10
    mgr.close()
