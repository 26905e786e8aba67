"""Typed configuration for all speechT-TPU subcommands.

Capability parity with the reference flag system (reference: speecht-cli:37-139
— argparse base parser + per-subcommand flags). Here flags live in frozen-ish
dataclasses so executors, jitted train steps and tests share one typed config
object; the CLI (speecht_tpu/cli.py) parses argv into these.

Additions over the reference (TPU-native surface):
- mesh / parallelism flags (``data_parallel``, ``model_parallel``) — the
  reference is single-GPU (SURVEY.md §2c), the rebuild is mesh-first.
- precision flags (``compute_dtype``) — bfloat16 matmuls on the MXU.
- bucketing flags for static-shape jit batching.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field


@dataclass
class BaseConfig:
    """Flags shared by every subcommand (reference speecht-cli:37-54)."""

    feature_type: str = "power"  # 'power' (128 mel) or 'mfcc' (13+Δ+ΔΔ = 39)
    batch_size: int = 64
    run_name: str = "noname"
    data_dir: str = "data"
    train_dir: str = "train"
    log_dir: str = "log"

    # Derived (reference speecht-cli:141-159)
    command: str = ""
    run_type: str = "other"

    # TPU-native additions
    data_parallel: int = 0  # 0 = use all devices on the data axis
    model_parallel: int = 1  # channel-TP over the 2000-wide layers
    # model-size knobs (defaults = the reference network exactly)
    base_channels: int = 250
    wide_channels: int = 2000
    num_body_layers: int = 7
    compute_dtype: str = "bfloat16"  # conv compute dtype (params stay f32)
    max_input_frames: int = 0  # 0 = unlimited; else skip longer utterances
    bucket_step: int = 256  # pad time to multiples of this (jit shape reuse)

    @property
    def run_train_dir(self) -> str:
        return f"{self.train_dir}/{self.run_name}"

    @property
    def input_size_for_features(self) -> int:
        return 39 if self.feature_type == "mfcc" else 128


@dataclass
class LanguageModelConfig:
    """Beam-search LM flags (reference speecht-cli:84-101).

    The three weights are *runtime inputs* to decoding, never baked into a
    compiled graph — required by parameter search (reference
    speecht/parameter_search.py:80-85).
    """

    language_model: str | None = None  # dir with arpa/vocabulary files
    lm_weight: float = 0.8
    word_count_weight: float = 0.0
    valid_word_count_weight: float = 2.3
    beam_width: int = 100
    # device-side blank-collapse threshold (arXiv:2210.17017). Fixed during
    # `search` (the candidate space covers only the reference's three
    # shallow-fusion weights, parameter_search.py:55-62); tune manually.
    blank_threshold: float = 0.999
    # run the beam search itself on the TPU (ops/beam_device.py) instead of
    # the host C++ beam; the LM directory may hold the ARPA source or a
    # KenLM PROBING binary
    device_beam: bool = False
    # HBM budget for the device LM tables; exceeding it falls back to the
    # host beam with a message (the model + beam state must still fit)
    device_lm_hbm_gb: float = 8.0
    # with --device-beam: two-stage decode — pure-acoustic on-device beam
    # keeping this many hypotheses, then host LM rescoring picks the best.
    # Faster than fused search (no per-frame LM table probes) and works
    # with KenLM binary LMs (the host scorer rescores). 0 = fused search.
    rescore_n: int = 0


@dataclass
class TrainConfig(BaseConfig):
    """`train` flags (reference speecht-cli:66-82)."""

    learning_rate: float = 1e-4
    reset_learning_rate: bool = False
    learning_rate_decay_factor: float = 0.0
    momentum: float = 0.9
    max_gradient_norm: float = 5.0
    limit_training_set: int = 0
    steps_per_checkpoint: int = 1000
    epsilon: float = 1e-3  # Adam epsilon (reference speech_model.py:77)
    verbose_summaries: bool = False  # logits/filter/bias images + act hists
    seq_parallel: int = 0  # time-shard the conv stack over N devices
    run_type: str = "train"


@dataclass
class EvalConfig(BaseConfig):
    """`evaluate` flags (reference speecht-cli:103-114)."""

    dataset: str = "test"  # 'dev' or 'test'
    should_save: bool = True
    step_count: int = 0
    seq_parallel: int = 0  # time-shard the conv stack over N devices
    lm: LanguageModelConfig = field(default_factory=LanguageModelConfig)


@dataclass
class RecordConfig(BaseConfig):
    """`record` flags (reference speecht-cli:116-122)."""

    input_size: int = 128
    lm: LanguageModelConfig = field(default_factory=LanguageModelConfig)
    run_type: str = "record"


@dataclass
class SearchConfig(BaseConfig):
    """`search` flags (reference speecht-cli:133-143)."""

    population_size: int = 10
    noise_std: float = 0.5
    use_ui: bool = False
    lm: LanguageModelConfig = field(default_factory=LanguageModelConfig)


@dataclass
class PreprocessConfig(BaseConfig):
    """`preprocess` flags (reference speecht-cli:124-131)."""

    train_only: bool = False
    test_only: bool = False
    dev_only: bool = False
    num_workers: int = 0  # 0 = cpu_count


@dataclass
class ExportConfig(BaseConfig):
    """`export` flags (reference speecht-cli:56-63)."""

    export_weights_dir: str | None = None
    input_size: int = 128


def replace(cfg, **kw):
    """dataclasses.replace passthrough (convenience for tests)."""
    return dataclasses.replace(cfg, **kw)
