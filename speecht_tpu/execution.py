"""Workload executor scaffolding shared by train / evaluate / search.

Capability parity with the reference executor base (reference:
speecht/execution.py:26-63): corpus reader construction, the input-size
probe (shape[1] of the first cached sample), the batch loader wired to an
abstract per-workload sample generator, model construction + restore.

TPU-native differences: the FIFOQueue/Coordinator plumbing
(execution.py:54-58) is replaced by the PrefetchLoader; the model is a pure
flax module + TrainState rather than a graph with a Saver; the mesh is
created here once and activated for the run.
"""

from __future__ import annotations

import abc
from typing import Iterator

import flax.linen as nn
import jax
import jax.numpy as jnp

from speecht_tpu.data.pipeline import PrefetchLoader
from speecht_tpu.data.reader import SpeechCorpusReader
from speecht_tpu.models.wav2letter import Wav2Letter, Wav2LetterConfig
from speecht_tpu.parallel import mesh as pmesh
from speecht_tpu.train.checkpoint import CheckpointManager
from speecht_tpu.train.state import create_train_state, make_optimizer
from speecht_tpu import vocabulary


def build_model(input_size: int, flags) -> Wav2Letter:
    """Wav2Letter with reference dimensions (speech_model.py:270-295) by
    default; --base-channels/--wide-channels/--num-body-layers scale it."""
    cfg = Wav2LetterConfig(
        input_size=input_size,
        num_classes=vocabulary.NUM_CLASSES,
        base_channels=getattr(flags, "base_channels", 250),
        wide_channels=getattr(flags, "wide_channels", 2000),
        num_body_layers=getattr(flags, "num_body_layers", 7),
        compute_dtype=getattr(flags, "compute_dtype", "bfloat16"),
    )
    return Wav2Letter(cfg)


def init_state(model: Wav2Letter, flags, rng_seed: int = 0):
    """Fresh TrainState with reference optimizer settings."""
    rng = jax.random.PRNGKey(rng_seed)
    params = model.init(
        rng,
        jnp.zeros((1, 64, model.config.input_size), jnp.float32),
    )["params"]
    params = nn.meta.unbox(params)
    tx = make_optimizer(
        max_gradient_norm=getattr(flags, "max_gradient_norm", 5.0),
        epsilon=getattr(flags, "epsilon", 1e-3),
    )
    lr = getattr(flags, "learning_rate", 1e-4)
    return create_train_state(params, tx, lr), tx


class DatasetExecutor(abc.ABC):
    """Base for executors that stream the cached corpus through the model."""

    def __init__(self, flags):
        self.flags = flags
        self.reader = SpeechCorpusReader(flags.data_dir)

        print("Determine input size from first sample")
        self.input_size = self.determine_input_size()

        self.mesh = self.create_mesh()
        self.model = build_model(self.input_size, flags)

    @property
    def shard_kwargs(self) -> dict:
        """Per-process corpus shard (multi-host): each process reads a
        disjoint slice and feeds only its own chips (mesh.shard_batch
        assembles the global array)."""
        n = jax.process_count()
        if n <= 1:
            return {}
        return {"shard_index": jax.process_index(), "shard_count": n}

    def local_batch_size(self) -> int:
        """--batch-size is GLOBAL; each process builds its share."""
        n = jax.process_count()
        if self.flags.batch_size % n:
            raise ValueError(
                f"--batch-size {self.flags.batch_size} must divide across "
                f"{n} processes"
            )
        return self.flags.batch_size // n

    def create_mesh(self):
        try:
            return pmesh.auto_mesh(
                batch_size=self.flags.batch_size,
                data_parallel=getattr(self.flags, "data_parallel", 0),
                model_parallel=getattr(self.flags, "model_parallel", 1),
            )
        except RuntimeError:
            # no usable device backend: run unsharded. A ValueError is a
            # user config error (--data-parallel/--model-parallel that
            # cannot tile the devices) and must propagate, not silently
            # drop the requested parallelism.
            return None

    def determine_input_size(self) -> int:
        sample = next(
            self.reader.load_samples(
                self.dataset_name(),
                limit_count=1,
                feature_type=self.flags.feature_type,
            )
        )
        return int(sample[0].shape[1])

    def dataset_name(self) -> str:
        return "train"

    @abc.abstractmethod
    def create_sample_generator(self, limit_count: int) -> Iterator:
        raise NotImplementedError

    @abc.abstractmethod
    def get_loader_limit_count(self) -> int:
        raise NotImplementedError

    def get_max_steps(self):
        return None

    def create_loader(self) -> PrefetchLoader:
        return PrefetchLoader(
            lambda: self.create_sample_generator(
                self.get_loader_limit_count()
            ),
            batch_size=self.local_batch_size(),
            time_bucket=getattr(self.flags, "bucket_step", 256),
            max_steps=self.get_max_steps(),
            group_by_length=getattr(self.flags, "group_by_length", False),
            transfer_dtype=getattr(
                self.flags, "transfer_dtype", "bfloat16"
            ),
        )

    def checkpoint_manager(self) -> CheckpointManager:
        return CheckpointManager(self.flags.run_train_dir)

    @abc.abstractmethod
    def run(self):
        raise NotImplementedError
