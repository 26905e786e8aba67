"""Command-line interface: 6 subcommands over the shared executor core.

Capability parity with the reference CLI (reference: speecht-cli:24-222):
subcommands ``preprocess`` / ``train`` / ``evaluate`` / ``record`` /
``search`` / ``export`` sharing a base parser (--mfcc/--power, --batch-size,
--run-name, --data-dir, --train-dir, --log-dir — speecht-cli:37-54), the
same per-command flags and defaults, derived ``run_type`` and
``run_train_dir`` (speecht-cli:141-159), directory creation
(speecht-cli:209-216), and lazy executor dispatch (speecht-cli:191-200).

TPU-native additions: ``--data-parallel`` / ``--model-parallel`` mesh flags,
``--compute-dtype``, ``--bucket-step``, ``--max-steps``, ``--num-workers``.
"""

from __future__ import annotations

import argparse
import os
import sys

from speecht_tpu import config as cfg


class CLI:
    def __init__(self, argv=None):
        self.argv = argv
        self.parser = argparse.ArgumentParser(prog="speecht-cli")
        self.subparsers = self.parser.add_subparsers(
            help="sub-command help", dest="command"
        )
        self.base_parser = self._create_base_parser()
        self._add_training_parser()
        self._add_evaluation_parser()
        self._add_recording_parser()
        self._add_parameter_search_parser()
        self._add_preprocess_parser()
        self._add_export_parser()
        self._parsed = None

    def _create_base_parser(self) -> argparse.ArgumentParser:
        p = argparse.ArgumentParser(add_help=False)
        p.add_argument(
            "--mfcc", dest="feature_type", action="store_const", const="mfcc",
            help="Use mfccs as input.",
        )
        p.add_argument(
            "--power", dest="feature_type", action="store_const",
            const="power", help="Use a power spectrogram as input.",
        )
        p.add_argument("--batch-size", dest="batch_size", type=int, default=64)
        p.add_argument("--run-name", dest="run_name", type=str, default="noname")
        p.add_argument("--data-dir", dest="data_dir", type=str, default="data")
        p.add_argument("--train-dir", dest="train_dir", type=str, default="train")
        p.add_argument("--log-dir", dest="log_dir", type=str, default="log")
        # TPU-native flags
        p.add_argument(
            "--data-parallel", dest="data_parallel", type=int, default=0,
            help="Devices on the data mesh axis (0 = all remaining).",
        )
        p.add_argument(
            "--model-parallel", dest="model_parallel", type=int, default=1,
            help="Devices on the model (tensor-parallel) mesh axis.",
        )
        p.add_argument(
            "--compute-dtype", dest="compute_dtype", type=str,
            default="bfloat16", choices=["bfloat16", "float32"],
        )
        p.add_argument(
            "--bucket-step", dest="bucket_step", type=int, default=256,
            help="Pad batch time length up to a multiple of this.",
        )
        p.add_argument(
            "--transfer-dtype", dest="transfer_dtype", type=str,
            default="bfloat16", choices=["bfloat16", "float32"],
            help="Dtype for the host->device feature transfer.",
        )
        # model-size flags (defaults = the reference's exact Wav2Letter,
        # speech_model.py:275-295; change for scaling studies — checkpoints
        # only load with matching sizes)
        p.add_argument(
            "--base-channels", dest="base_channels", type=int, default=250,
        )
        p.add_argument(
            "--wide-channels", dest="wide_channels", type=int, default=2000,
        )
        p.add_argument(
            "--num-body-layers", dest="num_body_layers", type=int, default=7,
        )
        p.add_argument(
            "--group-by-length", dest="group_by_length",
            action="store_true",
            help="Batch similar-length utterances together (less padding "
            "waste than random batching).",
        )
        p.add_argument(
            "--max-input-frames", dest="max_input_frames", type=int,
            default=0,
            help="Skip cached utterances longer than this many feature "
            "frames (0 = unlimited). Skipped files print a warning "
            "(reference preprocessing.py:272-276 max_size semantics).",
        )
        p.set_defaults(feature_type="power")
        return p

    def _add_language_model_arguments(self, parser):
        parser.add_argument(
            "--language-model", dest="language_model", type=str,
            help="Use beam search with the given language model directory "
            "(containing an ARPA model and `vocabulary`).",
        )
        parser.add_argument("--lm-weight", dest="lm_weight", type=float, default=0.8)
        parser.add_argument(
            "--word-count-weight", dest="word_count_weight", type=float, default=0.0
        )
        parser.add_argument(
            "--valid-word-count-weight", dest="valid_word_count_weight",
            type=float, default=2.3,
        )
        parser.add_argument(
            "--beam-width", dest="beam_width", type=int, default=100
        )
        parser.add_argument(
            "--blank-threshold", dest="blank_threshold", type=float,
            default=0.999,
            help="Drop frames whose blank probability exceeds this on "
            "device before the host beam (1.0 disables collapse).",
        )
        parser.add_argument(
            "--device-beam", dest="device_beam", action="store_true",
            help="Run the LM-fused beam search on the TPU itself "
            "(batch-parallel) instead of the host C++ beam; the "
            "language-model directory may hold the ARPA source or a KenLM "
            "PROBING binary. Note: with an LM and pruning, near-tied "
            "hypotheses can resolve differently than the host beam (f32 "
            "device vs f64 host tie-breaking); divergences are "
            "score-bounded (see ops/beam_device.py). First use compiles "
            "one program per batch shape bucket (minutes on a cold cache; "
            "tools/warm_beam_cache.py precompiles).",
        )
        parser.add_argument(
            "--device-lm-hbm-gb", dest="device_lm_hbm_gb", type=float,
            default=8.0,
            help="With --device-beam: HBM budget for the LM tables; a "
            "larger LM falls back to the host beam with a message.",
        )
        parser.add_argument(
            "--rescore", dest="rescore_n", type=int, default=0,
            help="With --device-beam: pure-acoustic device beam keeps N "
            "hypotheses, the host LM rescores and picks the best — faster "
            "than fused search and compatible with KenLM binary LMs. "
            "0 = fused search (default).",
        )

    def _add_training_parser(self):
        p = self.subparsers.add_parser(
            "train", help="Train the wav2letter weights.",
            parents=[self.base_parser],
            formatter_class=argparse.RawDescriptionHelpFormatter,
            epilog=(
                "long runs in segments:\n"
                "  train exits cleanly after --max-steps and a relaunch "
                "with the same\n"
                "  --train-dir/--run-name resumes from the latest "
                "checkpoint, so a\n"
                "  multi-hour train can (and on hosts whose TPU client "
                "leaks host RAM\n"
                "  per transfer, e.g. dev tunnels, SHOULD) run as an "
                "outer loop of\n"
                "  bounded processes:\n"
                "    until converged; do speecht-cli train --max-steps "
                "1000 ...; done\n"
                "  Checkpoint labels, printed step lines, and --max-steps "
                "share one\n"
                "  unit, so each relaunch continues exactly where the "
                "last exited.\n"
                "  tools/librispeech_scale_soak.py automates this "
                "pattern."
            ),
        )
        p.add_argument("--learning-rate", dest="learning_rate", type=float, default=1e-4)
        p.add_argument(
            "--reset-learning-rate", dest="reset_learning_rate",
            action="store_true",
        )
        p.add_argument(
            "--learning-rate-decay-factor", dest="learning_rate_decay_factor",
            type=float, default=0,
        )
        p.add_argument("--momentum", dest="momentum", type=float, default=0.9)
        p.add_argument(
            "--max-gradient-norm", dest="max_gradient_norm", type=float, default=5.0
        )
        p.add_argument(
            "--limit-training-set", dest="limit_training_set", type=int, default=0
        )
        p.add_argument(
            "--steps-per-checkpoint", dest="steps_per_checkpoint", type=int,
            default=1000,
        )
        p.add_argument(
            "--max-steps", dest="max_steps", type=int, default=None,
            help="Exit cleanly (checkpoint saved) after this many steps "
            "counted from this launch; default: run forever. Relaunching "
            "resumes from the checkpoint — see the epilog for the "
            "bounded-process loop recommended on leaky dev-tunnel hosts.",
        )
        p.add_argument(
            "--spec-augment", dest="spec_augment", action="store_true",
            help="On-device SpecAugment (2 frequency + 2 time masks per "
            "utterance, fresh per step) during training.",
        )
        p.add_argument(
            "--spec-augment-freq-width", dest="spec_augment_freq_width",
            type=int, default=None,
            help="Max frequency-mask width in feature bins (default: 15 "
            "of the 128 mel bins for power features, 4 of the 39 "
            "coefficients for mfcc).",
        )
        p.add_argument(
            "--spec-augment-time-frac", dest="spec_augment_time_frac",
            type=float, default=0.05,
            help="Max time-mask width as a fraction of the utterance's "
            "valid frames.",
        )
        p.add_argument(
            "--grad-accum", dest="grad_accum", type=int, default=1,
            help="Micro-batches accumulated per optimizer update "
            "(effective batch = batch-size x N with one micro-batch's "
            "activation memory; a restore restarts any partial "
            "accumulation).",
        )
        p.add_argument(
            "--profile-steps", dest="profile_steps", type=str, default=None,
            help="Capture a jax.profiler trace over steps START:STOP, "
            "counted from this launch (run-relative, like --max-steps).",
        )
        p.add_argument(
            "--verbose-summaries", dest="verbose_summaries",
            action="store_true",
            help="Also emit logits/filter/bias images and activation "
            "histograms every checkpoint step (reference "
            "speech_model.py:49-51,158-178).",
        )
        p.add_argument(
            "--seq-parallel", dest="seq_parallel", type=int, default=0,
            help="Shard the time axis of the conv stack over this many "
            "devices (halo-exchange sequence parallelism) — train on "
            "utterances too long for one chip.",
        )

    def _add_evaluation_parser(self):
        p = self.subparsers.add_parser(
            "evaluate", help="Evaluate the development or test set.",
            parents=[self.base_parser],
        )
        p.add_argument("--dev", dest="dataset", action="store_const", const="dev")
        p.add_argument("--test", dest="dataset", action="store_const", const="test")
        p.add_argument(
            "--no-save", dest="should_save", action="store_false",
            help="Do not save evaluation summaries.",
        )
        p.add_argument("--step-count", dest="step_count", type=int, default=0)
        p.add_argument(
            "--from-audio", dest="from_audio", action="store_true",
            help="Skip the feature cache: decode flacs and run the whole "
            "front end (framing/FFT/mel/normalize) on device.",
        )
        p.add_argument(
            "--reference-weights", dest="reference_weights", type=str,
            default=None,
            help="Evaluate weights exported by the reference implementation "
            "(directory of convolution_layer_*/filters.npy files) instead "
            "of a checkpoint.",
        )
        p.add_argument(
            "--seq-parallel", dest="seq_parallel", type=int, default=0,
            help="Shard the time axis of the conv stack over this many "
            "devices (halo-exchange sequence parallelism) — for "
            "utterances too long for one chip.",
        )
        self._add_language_model_arguments(p)
        p.set_defaults(dataset="test", should_save=True)

    def _add_recording_parser(self):
        p = self.subparsers.add_parser(
            "record",
            help="Record using your microphone and inspect the transcription.",
            parents=[self.base_parser],
        )
        p.add_argument("--input-size", dest="input_size", type=int, default=128)
        p.add_argument(
            "--streaming", dest="streaming", action="store_true",
            help="Low-latency incremental transcription while recording.",
        )
        p.add_argument(
            "--feature-rate", dest="feature_rate", type=int, default=22050,
            help="Resample captured audio to this rate before the feature "
            "front end (22050 = the preprocess cache rate the checkpoint "
            "was trained on; 16000 reproduces the reference's raw-mic "
            "behavior, which feature-mismatches cache-trained weights).",
        )
        p.add_argument(
            "--audio-source", dest="audio_source", type=str, nargs="+",
            default=None, metavar="FILE",
            help="Transcribe these audio files (flac, or float32 .npy at "
            "16 kHz) through the record pipeline instead of a microphone; "
            "one-shot mode treats each file as one gated utterance and "
            "exits after the last, --streaming feeds them as a live "
            "chunk stream.",
        )
        self._add_language_model_arguments(p)

    def _add_parameter_search_parser(self):
        p = self.subparsers.add_parser(
            "search",
            help="Search for language model hyperparameters using local search.",
            parents=[self.base_parser],
        )
        p.add_argument(
            "--population-size", dest="population_size", type=int, default=10
        )
        p.add_argument("--noise-std", dest="noise_std", type=float, default=0.5)
        p.add_argument(
            "--generations", dest="generations", type=int, default=0,
            help="Stop after this many mutation/score iterations "
            "(0 = run until interrupted, the reference behavior).",
        )
        p.add_argument("--ui", dest="use_ui", action="store_true")
        p.add_argument("--step-count", dest="step_count", type=int, default=1)
        self._add_language_model_arguments(p)

    def _add_preprocess_parser(self):
        p = self.subparsers.add_parser(
            "preprocess", help="Preprocess and cache all audio.",
            parents=[self.base_parser],
        )
        p.add_argument("--train-only", dest="train_only", action="store_true")
        p.add_argument("--test-only", dest="test_only", action="store_true")
        p.add_argument("--dev-only", dest="dev_only", action="store_true")
        p.add_argument("--num-workers", dest="num_workers", type=int, default=0)
        p.add_argument(
            "--device", dest="device_preprocess", action="store_true",
            help="Run the DSP (framing/FFT/mel/normalize, MFCC deltas) as "
            "batched TPU programs instead of the per-file host DSP; the "
            "npz cache layout is identical.",
        )

    def _add_export_parser(self):
        p = self.subparsers.add_parser(
            "export", help="Export network details", parents=[self.base_parser]
        )
        p.add_argument("--weights", dest="export_weights_dir", type=str)
        p.add_argument("--input-size", dest="input_size", type=int, default=128)
        p.add_argument(
            "--stablehlo", dest="export_stablehlo_dir", type=str,
            help="Also export the full inference program (conv stack + "
            "greedy CTC decode, weights baked in) as a self-contained "
            "serialized-StableHLO serving artifact; any XLA host can run "
            "it with jax alone (see speecht_tpu/serving.py).",
        )
        p.add_argument(
            "--export-batch-size", dest="export_batch_size", type=int,
            default=0,
            help="Fix the artifact's batch dim (0 = shape-polymorphic).",
        )
        p.add_argument(
            "--export-frames", dest="export_frames", type=int, default=0,
            help="Fix the artifact's frame dim, must be even "
            "(0 = shape-polymorphic over even frame counts).",
        )
        p.add_argument(
            "--export-platforms", dest="export_platforms", type=str,
            default="tpu,cpu",
            help="Comma-separated lowering targets baked into the "
            "StableHLO artifact.",
        )
        p.add_argument(
            "--from-audio", dest="from_audio", action="store_true",
            help="With --stablehlo: export the END-TO-END program — int16 "
            "raw audio in, the whole on-device front end (optional "
            "polyphase resample + feature DSP) fused ahead of the conv "
            "stack and greedy decode.",
        )
        p.add_argument(
            "--wire-sr", dest="export_wire_sr", type=int, default=0,
            help="With --stablehlo --from-audio: sample rate the audio "
            "input arrives at; the artifact resamples to 22050 on device "
            "(0 = audio already at 22050).",
        )

    @property
    def parsed(self):
        if self._parsed is None:
            parsed = self.parser.parse_args(self.argv)
            if parsed.command:
                if parsed.command == "train":
                    parsed.run_type = "train"
                elif parsed.command == "evaluate":
                    parsed.run_type = parsed.dataset
                elif parsed.command == "record":
                    parsed.run_type = "record"
                else:
                    parsed.run_type = "other"
                parsed.run_train_dir = parsed.train_dir + "/" + parsed.run_name
                if hasattr(parsed, "language_model"):
                    parsed.lm = cfg.LanguageModelConfig(
                        language_model=parsed.language_model,
                        lm_weight=parsed.lm_weight,
                        word_count_weight=parsed.word_count_weight,
                        valid_word_count_weight=parsed.valid_word_count_weight,
                        beam_width=parsed.beam_width,
                        blank_threshold=parsed.blank_threshold,
                        device_beam=getattr(parsed, "device_beam", False),
                        device_lm_hbm_gb=getattr(
                            parsed, "device_lm_hbm_gb", 8.0
                        ),
                        rescore_n=getattr(parsed, "rescore_n", 0),
                    )
            self._parsed = parsed
        return self._parsed

    @property
    def command_executor(self):
        flags = self.parsed
        command = flags.command
        # lazy imports (parity with speecht-cli:161-189): heavy deps load
        # only for the command that needs them
        if command == "train":
            from speecht_tpu.training import Training

            return Training(flags)
        if command == "evaluate":
            from speecht_tpu.evaluation import Evaluation

            return Evaluation(flags)
        if command == "record":
            from speecht_tpu.recording import Recording

            return Recording(flags)
        if command == "search":
            from speecht_tpu.parameter_search import (
                LanguageModelParameterSearch,
            )

            return LanguageModelParameterSearch(flags)
        if command == "preprocess":
            from speecht_tpu.preprocessing import Preprocessing

            return Preprocessing(flags)
        if command == "export":
            from speecht_tpu.exporting import Exporting

            return Exporting(flags)
        raise ValueError(f"Unknown command {command}")

    def _ensure_directories(self):
        for d in (
            self.parsed.train_dir,
            self.parsed.data_dir,
            self.parsed.log_dir,
            self.parsed.run_train_dir,
        ):
            os.makedirs(d, exist_ok=True)

    def run(self):
        if not self.parsed.command:
            self.parser.print_help()
            return None
        if self.parsed.command != "preprocess":
            # persistent XLA compilation cache (cold remote compiles of the
            # full train step take minutes)
            from speecht_tpu import runtime

            runtime.enable_compilation_cache()
            # multi-host: join the coordinator when launched under the
            # standard JAX distributed env (JAX_COORDINATOR_ADDRESS etc.);
            # jax.devices() then spans all hosts and the ('data','model')
            # mesh shards across them with collectives over ICI/DCN
            if runtime.init_distributed():
                import jax

                print(
                    f"distributed: process {jax.process_index()} of "
                    f"{jax.process_count()}, {len(jax.devices())} devices"
                )
        self._ensure_directories()
        return self.command_executor.run()


def main(argv=None):
    try:
        CLI(argv).run()
    except (RuntimeError, FileNotFoundError) as e:
        # user-actionable failures (missing/corrupt checkpoint, bad
        # corpus/LM paths) print one clear line instead of a stack
        # trace; unexpected exception types stay loud. Library callers
        # use CLI(argv).run() directly and keep the raised exception.
        print(f"error: {e}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
