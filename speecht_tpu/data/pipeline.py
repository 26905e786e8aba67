"""Host->device input pipeline: bucketed padded batches + async prefetch.

Capability parity with the reference input loaders (reference:
speecht/speech_input.py):

- ``BaseInputLoader._get_inputs_feed_item`` pads each batch to its max time
  (speech_input.py:27-45); here padding additionally rounds the time axis up
  to a bucket boundary so jit sees a small, finite set of shapes instead of
  one compilation per batch.
- labels become dense int32 [B, L] + length vectors instead of
  ``tf.SparseTensorValue`` (speech_input.py:47-69) — TPU-friendly static
  shapes, no host sparse encode/decode.
- ``InputBatchLoader``'s FIFOQueue + enqueue threads (speech_input.py:
  142-218) become a bounded queue fed by a daemon thread plus device
  prefetch (double buffering): while the TPU runs step N, batch N+1 is
  already being transferred.
- ``SingleInputLoader`` (speech_input.py:79-127) maps to
  :func:`single_batch` — a batch-of-one builder used by record/export.

``max_steps`` stops iteration after that many batches (the reference closes
the queue, speech_input.py:205-207).
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from typing import Callable, Iterator

import jax
import ml_dtypes
import numpy as np

from speecht_tpu import vocabulary
from speecht_tpu.parallel import mesh as pmesh


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Batch:
    """One dense padded batch (host numpy or device arrays); a jax pytree."""

    features: np.ndarray  # [B, T, F] float32
    seq_lengths: np.ndarray  # [B] int32 (valid input frames)
    labels: np.ndarray  # [B, L] int32 padded with PAD_ID
    label_lengths: np.ndarray  # [B] int32

    @property
    def batch_size(self) -> int:
        return self.features.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AudioBatch:
    """Raw-audio batch for the on-device feature pipeline; a jax pytree."""

    audio: np.ndarray  # [B, Smax] float32 zero-padded samples
    num_samples: np.ndarray  # [B] int32
    labels: np.ndarray  # [B, L] int32 padded with PAD_ID
    label_lengths: np.ndarray  # [B] int32


def round_up(n: int, multiple: int) -> int:
    return -(-n // multiple) * multiple if multiple > 1 else n


def build_audio_batch(
    samples: list[tuple[np.ndarray, np.ndarray]],
    sample_bucket: int = 160 * 256,
    label_bucket: int | None = None,
    pad_to_batch: int = 0,
) -> AudioBatch:
    """Assemble (raw_audio, transcript) pairs into a padded AudioBatch.

    Sample counts pad up to ``sample_bucket`` (defaults to the feature hop
    x the feature-frame bucket, keeping jit shapes aligned with the cached
    pipeline's time buckets).
    """
    n = len(samples)
    num_samples = np.array([len(s[0]) for s in samples], dtype=np.int32)
    label_lengths = np.array([len(s[1]) for s in samples], dtype=np.int32)
    S = round_up(int(num_samples.max()), sample_bucket)
    if label_bucket is None:
        # tie to the implied frame bucket (hop 160), as in build_batch
        L = max(S // 160 // 4, round_up(int(label_lengths.max()), 32), 32)
    else:
        L = round_up(max(int(label_lengths.max()), 1), label_bucket)
    # multi-host: all processes must pad this step's batch identically
    S, L = pmesh.sync_bucket_dims(S, L)
    B = max(n, pad_to_batch)

    audio = np.zeros((B, S), dtype=np.float32)
    labels = np.full((B, L), vocabulary.PAD_ID, dtype=np.int32)
    for i, (wav, transcript) in enumerate(samples):
        audio[i, : len(wav)] = wav
        labels[i, : len(transcript)] = np.asarray(transcript, dtype=np.int32)
    if B > n:
        num_samples = np.pad(num_samples, (0, B - n))
        label_lengths = np.pad(label_lengths, (0, B - n))
    return AudioBatch(audio, num_samples, labels, label_lengths)


def build_batch(
    samples: list[tuple[np.ndarray, np.ndarray]],
    time_bucket: int = 256,
    label_bucket: int | None = None,
    pad_to_batch: int = 0,
) -> Batch:
    """Assemble (features [T,F], transcript) pairs into a padded Batch.

    Time is padded to the batch max rounded up to ``time_bucket`` (jit shape
    reuse). The label width defaults to a *function of the time bucket*
    (T/4 — the CTC feasibility bound: S = 2L+1 must fit in T/2 logit
    frames), so the number of distinct compiled shapes equals the number of
    time buckets instead of their cross product with label buckets — with
    variable-length speech, independent label bucketing causes a
    compile-per-combination storm. Pass ``label_bucket`` to override.

    ``pad_to_batch`` appends all-zero rows (seq_length 0 keeps them out of
    the loss) so partial final batches keep the compiled batch size.
    """
    n = len(samples)
    input_size = samples[0][0].shape[1]
    seq_lengths = np.array([s[0].shape[0] for s in samples], dtype=np.int32)
    label_lengths = np.array([len(s[1]) for s in samples], dtype=np.int32)

    T = round_up(int(seq_lengths.max()), time_bucket)
    if label_bucket is None:
        L = max(T // 4, round_up(int(label_lengths.max()), 32), 32)
    else:
        L = round_up(max(int(label_lengths.max()), 1), label_bucket)
    # multi-host: all processes must pad this step's batch identically
    T, L = pmesh.sync_bucket_dims(T, L)
    B = max(n, pad_to_batch)

    features = np.zeros((B, T, input_size), dtype=np.float32)
    labels = np.full((B, L), vocabulary.PAD_ID, dtype=np.int32)
    for i, (feat, transcript) in enumerate(samples):
        features[i, : feat.shape[0]] = feat
        labels[i, : len(transcript)] = np.asarray(transcript, dtype=np.int32)

    if B > n:
        seq_lengths = np.pad(seq_lengths, (0, B - n))
        label_lengths = np.pad(label_lengths, (0, B - n))

    return Batch(features, seq_lengths, labels, label_lengths)


def single_batch(features: np.ndarray, time_bucket: int = 128) -> Batch:
    """Batch-of-one without labels (record/export path).

    Time still rounds up to a bucket so consecutive recordings reuse
    compiled programs instead of recompiling per utterance length.
    """
    return build_batch([(features, np.zeros(0, dtype=np.int32))],
                       time_bucket=time_bucket, label_bucket=1)


def batch_iterator(
    sample_generator: Iterator,
    batch_size: int,
    time_bucket: int = 256,
    label_bucket: int | None = None,
    max_steps: int | None = None,
    drop_remainder: bool = False,
    batch_builder: Callable = None,
    group_by_length: bool = False,
) -> Iterator[Batch]:
    """Group a sample generator into padded batches.

    ``batch_builder`` defaults to :func:`build_batch` (cached features);
    pass :func:`build_audio_batch` for raw-audio pipelines.

    ``group_by_length`` accumulates samples into per-length-bucket bins and
    emits a batch when a bin fills: utterances of similar length batch
    together, cutting the padding waste of random batching (the reference
    pads each random batch to its max, speech_input.py:37-45). Shuffle
    order still comes from the (already shuffled) generator; only grouping
    changes.
    """
    builder = batch_builder or build_batch
    steps = 0

    if group_by_length and jax.process_count() > 1:
        raise ValueError(
            "--group-by-length is not supported in multi-process runs: "
            "each process's bin-fill order (and so its batch count and "
            "shape sequence) depends on its own corpus shard, which "
            "breaks the lockstep the cross-process collectives require"
        )

    if not group_by_length:
        bucket: list = []
        for sample in sample_generator:
            bucket.append(sample)
            if len(bucket) == batch_size:
                yield builder(bucket, time_bucket, label_bucket)
                bucket = []
                steps += 1
                if max_steps is not None and steps >= max_steps:
                    return
        if bucket and not drop_remainder:
            yield builder(
                bucket, time_bucket, label_bucket, pad_to_batch=batch_size
            )
        return

    bins: dict[int, list] = {}
    for sample in sample_generator:
        length = len(sample[0])
        key = round_up(max(length, 1), time_bucket)
        bins.setdefault(key, []).append(sample)
        if len(bins[key]) == batch_size:
            yield builder(bins.pop(key), time_bucket, label_bucket)
            steps += 1
            if max_steps is not None and steps >= max_steps:
                return
    # drain leftovers longest-first so partial batches stay homogeneous
    for key in sorted(bins, reverse=True):
        leftovers = bins[key]
        while leftovers:
            chunk, leftovers = (
                leftovers[:batch_size],
                leftovers[batch_size:],
            )
            if drop_remainder and len(chunk) < batch_size:
                continue
            yield builder(
                chunk, time_bucket, label_bucket, pad_to_batch=batch_size
            )
            steps += 1
            if max_steps is not None and steps >= max_steps:
                return


def audio_to_int16(audio: np.ndarray) -> np.ndarray:
    """THE int16 audio-wire quantization (every producer must use it).

    Lossless for FLAC's 16-bit PCM source (v/32768 float round-trips to
    v exactly); a bf16 audio wire's -48 dB noise floor measurably
    corrupts low-energy mel bins (see reader.store_samples_device). The
    device front end (features_tpu.make_front_end) undoes the x32768
    scaling at trace time based on the array dtype.
    """
    return np.clip(np.rint(audio * 32768.0), -32768, 32767).astype(
        np.int16
    )


def _cast_payload(batch, dtype):
    """Cast the dense float payload (features/audio) for transfer.

    Features compact to the requested float dtype. Raw audio compacts to
    **int16** instead (same 2 bytes as bf16 — :func:`audio_to_int16`).
    """
    if isinstance(batch, Batch):
        return dataclasses.replace(
            batch, features=batch.features.astype(dtype)
        )
    if isinstance(batch, AudioBatch):
        return dataclasses.replace(
            batch, audio=audio_to_int16(batch.audio)
        )
    return batch


class PrefetchLoader:
    """Background-thread batch producer with device prefetch.

    Replaces the reference's FIFOQueue + coordinator threads
    (speech_input.py:142-218): a daemon thread builds host batches into a
    bounded queue; iteration transfers the *next* batch to device before
    yielding the current one, overlapping H2D DMA with TPU compute.
    """

    _SENTINEL = object()

    def __init__(
        self,
        generator_factory: Callable[[], Iterator],
        batch_size: int,
        time_bucket: int = 256,
        label_bucket: int | None = None,
        max_steps: int | None = None,
        queue_capacity: int = 8,
        device_put: bool = True,
        batch_builder: Callable = None,
        group_by_length: bool = False,
        transfer_dtype: str = "bfloat16",
    ):
        """``transfer_dtype`` casts the dense feature/audio payload before
        the host->device transfer. bfloat16 halves wire bytes and matches
        the conv stack's compute dtype; pass "float32" for bit-exact input
        parity with the offline cache."""
        self._factory = generator_factory
        self._batch_size = batch_size
        self._time_bucket = time_bucket
        self._label_bucket = label_bucket
        self._max_steps = max_steps
        self._batch_builder = batch_builder
        self._group_by_length = group_by_length
        self._transfer_dtype = transfer_dtype
        self._queue: queue.Queue = queue.Queue(maxsize=queue_capacity)
        self._device_put = device_put
        self._thread: threading.Thread | None = None
        self._error: BaseException | None = None
        self._stop = threading.Event()
        self._finished = False
        # stall accounting: a stall is the consumer finding the queue
        # empty and blocking on the producer — the input pipeline (host
        # batch build + H2D) failing to keep ahead of device compute.
        # Cumulative over the loader's lifetime; the training loop reports
        # per-interval deltas.
        self.stall_count = 0
        self.stall_seconds = 0.0
        self.batches_yielded = 0
        # the wait for the very first batch after a worker (re)start is
        # unavoidable warmup (the producer thread has not had a chance to
        # run yet), not the pipeline falling behind — exclude it
        self._warmup_pending = True

    def _worker(self, out_queue: queue.Queue, stop_event: threading.Event):
        # the queue/event are captured per worker run: a restarted loader
        # swaps in fresh ones, and a lingering old worker must not feed
        # the new iteration's queue
        try:
            for batch in batch_iterator(
                self._factory(),
                self._batch_size,
                self._time_bucket,
                self._label_bucket,
                self._max_steps,
                batch_builder=self._batch_builder,
                group_by_length=self._group_by_length,
            ):
                if stop_event.is_set():
                    return
                if self._device_put:
                    # transfer on the worker thread: H2D overlaps the
                    # consumer's device compute (device_put can block for
                    # the copy; doing it here keeps the step loop hot)
                    if self._transfer_dtype == "bfloat16":
                        batch = _cast_payload(batch, ml_dtypes.bfloat16)
                    batch = pmesh.shard_batch(batch, mesh=self._mesh)
                out_queue.put(batch)
        except BaseException as e:  # propagate into the consumer
            self._error = e
        finally:
            out_queue.put(self._SENTINEL)

    def start(self) -> "PrefetchLoader":
        # capture the active mesh: the worker thread has its own
        # thread-local mesh context
        self._mesh = pmesh.get_mesh()
        self._warmup_pending = True
        self._thread = threading.Thread(
            target=self._worker,
            args=(self._queue, self._stop),
            daemon=True,
        )
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        # drain so the worker unblocks
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass

    def __iter__(self):
        if self._thread is None:
            self.start()
        elif self._finished or self._stop.is_set():
            # the previous pass consumed (or stop() abandoned) the
            # stream; restart from the generator factory instead of
            # blocking forever on a queue nothing will ever feed
            self._queue = queue.Queue(maxsize=self._queue.maxsize)
            self._stop = threading.Event()
            self._error = None
            self._finished = False
            self.start()
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                t0 = time.perf_counter()
                item = self._queue.get()
                waited = time.perf_counter() - t0
                # ignore sub-ms wakeups and the first-batch warmup wait;
                # count real producer-behind waits
                if (
                    waited > 0.002
                    and item is not self._SENTINEL
                    and not self._warmup_pending
                ):
                    self.stall_count += 1
                    self.stall_seconds += waited
            self._warmup_pending = False
            if item is self._SENTINEL:
                self._finished = True
                if self._error is not None:
                    raise self._error
                return
            self.batches_yielded += 1
            yield item
