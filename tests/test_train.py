"""Train step / state / checkpoint / metrics tests.

Covers the reference's training semantics (reference training.py +
speech_model.py:53-82): loss decreases when overfitting a tiny batch, the
plateau lr decay mutates state without recompilation, checkpoints round-trip
including the learning rate, and DP over an 8-device CPU mesh produces the
same loss as single-device execution.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speecht_tpu import vocabulary
from speecht_tpu.data.pipeline import Batch, build_batch
from speecht_tpu.models.wav2letter import Wav2Letter, Wav2LetterConfig
from speecht_tpu.parallel import mesh as pmesh
from speecht_tpu.train import step as tstep
from speecht_tpu.train.state import create_train_state, make_optimizer

TINY = Wav2LetterConfig(
    input_size=8,
    base_channels=16,
    wide_channels=32,
    num_body_layers=2,
    compute_dtype="float32",
)


def tiny_batch(rng, B=4, T=32, L=4):
    feats = rng.randn(B, T, TINY.input_size).astype(np.float32)
    labels = rng.randint(0, 5, size=(B, L)).astype(np.int32)
    return Batch(
        features=feats,
        seq_lengths=np.full(B, T, np.int32),
        labels=labels,
        label_lengths=np.full(B, L, np.int32),
    )


class Harness:
    """Shared compiled steps + per-test fresh states (train_step donates)."""

    def __init__(self):
        self.model = Wav2Letter(TINY)
        rng = jax.random.PRNGKey(0)
        params = self.model.init(
            rng, jnp.zeros((1, 32, TINY.input_size), jnp.float32)
        )["params"]
        import flax.linen as nn

        self._params = nn.meta.unbox(params)
        self.tx = make_optimizer(max_gradient_norm=5.0, epsilon=1e-3)
        self.train_step = tstep.make_train_step(self.model, self.tx)
        self.loss_fn = tstep.make_loss_fn(self.model)

    def fresh_state(self):
        params = jax.tree_util.tree_map(jnp.array, self._params)
        return create_train_state(params, self.tx, learning_rate=3e-3)


@pytest.fixture(scope="module")
def harness():
    return Harness()


@pytest.fixture
def model_and_state(harness):
    return harness, harness.tx, harness.fresh_state()


def test_overfit_tiny_batch(model_and_state):
    h, tx, state = model_and_state
    train_step = h.train_step
    batch = tiny_batch(np.random.RandomState(0))

    first_loss = None
    for i in range(60):
        state, metrics = train_step(state, batch)
        if first_loss is None:
            first_loss = float(metrics["loss"])
    final_loss = float(metrics["loss"])
    assert int(state.step) == 60
    assert final_loss < 0.5 * first_loss, (first_loss, final_loss)


def test_padded_rows_do_not_affect_loss(model_and_state):
    h, tx, state = model_and_state
    loss_fn = h.loss_fn
    rng = np.random.RandomState(1)
    batch = tiny_batch(rng, B=4)
    # same batch with 4 padded rows appended
    padded = Batch(
        features=np.concatenate(
            [batch.features, np.zeros_like(batch.features)]
        ),
        seq_lengths=np.concatenate(
            [batch.seq_lengths, np.zeros(4, np.int32)]
        ),
        labels=np.concatenate(
            [batch.labels, np.full_like(batch.labels, vocabulary.PAD_ID)]
        ),
        label_lengths=np.concatenate(
            [batch.label_lengths, np.zeros(4, np.int32)]
        ),
    )
    l1, _ = loss_fn(state.params, batch)
    l2, _ = loss_fn(state.params, padded)
    assert float(l1) == pytest.approx(float(l2), rel=1e-5)


def test_lr_decay_no_recompile(model_and_state):
    h, tx, state = model_and_state
    train_step = h.train_step
    batch = tiny_batch(np.random.RandomState(2))
    state, _ = train_step(state, batch)
    compiles_before = train_step._cache_size()
    state = tstep.decay_learning_rate(state, 0.5)
    state, metrics = train_step(state, batch)
    assert train_step._cache_size() == compiles_before
    assert float(metrics["learning_rate"]) == pytest.approx(
        3e-3 * 0.5, rel=1e-6
    )


def test_grad_clipping_applied(model_and_state):
    h, tx, state = model_and_state
    train_step = h.train_step
    batch = tiny_batch(np.random.RandomState(3))
    _, metrics = train_step(state, batch)
    assert np.isfinite(float(metrics["grad_norm"]))


def test_accumulating_step_matches_per_step_metrics(harness):
    """make_train_step_acc must fold exactly the per-step loss/grad-norm
    that make_train_step reports, and produce identical parameters."""
    acc_step = tstep.make_train_step_acc(harness.model, harness.tx)
    batches = [tiny_batch(np.random.RandomState(s)) for s in range(3)]

    state_a = harness.fresh_state()
    losses, norms = [], []
    for b in batches:
        state_a, m = harness.train_step(state_a, b)
        losses.append(float(m["loss"]))
        norms.append(float(m["grad_norm"]))

    state_b = harness.fresh_state()
    acc = tstep.init_metrics_acc()
    for b in batches:
        state_b, acc = acc_step(state_b, acc, b)

    assert float(acc["count"]) == 3
    assert float(acc["loss_sum"]) == pytest.approx(sum(losses), rel=1e-5)
    assert float(acc["grad_norm_sum"]) == pytest.approx(
        sum(norms), rel=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(state_a.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state_b.params)[0]),
        rtol=1e-6,
    )


def test_train_loop_applies_plateau_decay(tmp_path):
    """The real _train_loop must decay the lr exactly when a checkpoint's
    accumulated loss exceeds the max of the last three (reference
    training.py:82-84), driven by a deterministic stub step."""
    from types import SimpleNamespace

    from speecht_tpu import training as trmod
    from speecht_tpu.train.metrics_writer import SummaryWriter
    from speecht_tpu.train.state import TrainState

    t = trmod.Training.__new__(trmod.Training)
    t.flags = SimpleNamespace(
        steps_per_checkpoint=1,
        learning_rate_decay_factor=0.5,
        verbose_summaries=False,
    )
    t.mesh = None
    t.create_loader = lambda: iter(range(5))  # 5 dummy batches
    t._latest_state = None

    # checkpoint losses: 10, 10, 10, 12 (> max of last 3 -> decay), 11
    losses = iter([10.0, 10.0, 10.0, 12.0, 11.0])

    def stub_step(state, acc, _batch):
        loss = next(losses)
        acc = {
            "loss_sum": acc["loss_sum"] + loss,
            "grad_norm_sum": acc["grad_norm_sum"] + 1.0,
            "count": acc["count"] + 1.0,
            "updates": acc["updates"] + 1.0,
        }
        return (
            TrainState(
                params=state.params,
                opt_state=state.opt_state,
                step=state.step + 1,
                learning_rate=state.learning_rate,
            ),
            acc,
        )

    state = TrainState(
        params={"w": jnp.zeros(4)},
        opt_state=(),
        step=jnp.zeros((), jnp.int32),
        learning_rate=jnp.float32(1.0),
    )
    saves = []
    ckpt = SimpleNamespace(
        save=lambda s, wait=False, step=None: saves.append(s),
        # _train_loop reads the resume label from the manager (the label
        # is authoritative for the global-step unit); fresh run -> None
        latest_step=lambda: None,
    )
    writer = SummaryWriter(str(tmp_path))
    out = t._train_loop(state, stub_step, writer, ckpt, None)
    writer.close()
    # exactly one decay (the 12-loss checkpoint); 11 > max(10,10,12) fails
    assert float(out.learning_rate) == pytest.approx(0.5)
    assert len(saves) == 5  # a checkpoint per interval


class TestDeviceSummaries:
    def test_device_histogram_matches_numpy(self):
        from speecht_tpu.train import summaries

        x = np.random.RandomState(0).randn(1000).astype(np.float32)
        s = jax.device_get(summaries.device_histogram(jnp.asarray(x)))
        counts, edges = np.histogram(x, bins=30)
        assert s["min"] == pytest.approx(x.min())
        assert s["max"] == pytest.approx(x.max())
        assert s["num"] == 1000
        assert s["sum"] == pytest.approx(x.sum(), rel=1e-5)
        np.testing.assert_allclose(s["bucket_limits"], edges[1:], rtol=1e-5)
        np.testing.assert_array_equal(s["buckets"], counts)

    def test_device_histogram_constant_tensor(self):
        from speecht_tpu.train import summaries

        s = jax.device_get(
            summaries.device_histogram(jnp.zeros((64,), jnp.float32))
        )
        assert s["buckets"].sum() == 64
        assert np.isfinite(s["bucket_limits"]).all()

    def test_raw_histograms_readable_by_tf(self, tmp_path):
        from speecht_tpu.train import summaries
        from speecht_tpu.train.metrics_writer import SummaryWriter

        x = np.random.RandomState(1).randn(512).astype(np.float32)
        stats = jax.device_get(summaries.device_histogram(jnp.asarray(x)))
        w = SummaryWriter(str(tmp_path))
        w.add_raw_histograms(7, {"w": stats})
        w.close()

        import tensorflow as tf
        from tensorflow.core.util import event_pb2

        histo = None
        for raw in tf.data.TFRecordDataset(w.path):
            e = event_pb2.Event()
            e.ParseFromString(raw.numpy())
            for v in e.summary.value:
                if v.tag == "w":
                    histo = v.histo
        assert histo is not None
        assert histo.num == 512
        assert histo.min == pytest.approx(x.min(), rel=1e-5)
        assert histo.sum == pytest.approx(x.sum(), rel=1e-4)
        assert sum(histo.bucket) == 512

    def test_param_and_activation_summarizers(self, harness):
        from speecht_tpu.train import summaries

        state = harness.fresh_state()
        hists, images = jax.device_get(
            summaries.make_param_summarizer(with_images=True)(state.params)
        )
        assert any(tag.endswith("kernel") for tag in hists)
        assert set(images) == set(hists)  # every leaf gets an image
        for img in images.values():
            assert img.ndim == 2
            assert max(img.shape) <= summaries.IMAGE_MAX_HW

        batch = tiny_batch(np.random.RandomState(3))
        ahists, aimages = jax.device_get(
            summaries.make_activation_summarizer(harness.model)(
                state.params, jnp.asarray(batch.features)
            )
        )
        n_layers = len(TINY.layer_specs)
        acts = [t for t in ahists if t.startswith("activations/")]
        assert len(acts) == n_layers
        assert "logits" in ahists and "logits" in aimages
        # logits image is [C, T//2] transposed for display
        assert aimages["logits"].shape[0] == TINY.num_classes


class TestDataParallel:
    def test_dp_matches_single_device(self, model_and_state):
        h, tx, state = model_and_state
        train_step = h.train_step
        batch = tiny_batch(np.random.RandomState(4), B=8)

        # single device
        s1, m1 = train_step(state, jax.device_put(batch))

        # 8-device data parallel (fresh state: train_step donates its input)
        mesh = pmesh.make_mesh()
        assert mesh.shape["data"] == 8
        with pmesh.use_mesh(mesh):
            sharded = pmesh.shard_batch(batch)
            s2, m2 = train_step(h.fresh_state(), sharded)

        assert float(m1["loss"]) == pytest.approx(
            float(m2["loss"]), rel=1e-5
        )
        # updated params agree
        p1 = jax.tree_util.tree_leaves(s1.params)[0]
        p2 = jax.tree_util.tree_leaves(s2.params)[0]
        np.testing.assert_allclose(
            np.asarray(p1), np.asarray(p2), rtol=1e-4, atol=1e-6
        )

    @staticmethod
    def _assert_model_sharded(params, model, n_shards):
        """The wide-layer kernels/biases must actually shard on 'model' —
        a constrain() that silently dropped the axis would fail here.
        Column-parallel (out-sharded) for the 2000-wide layers, row-parallel
        (in-sharded) for the final classifier whose out=num_classes."""
        from jax.sharding import PartitionSpec

        cfg = model.config
        wide_from = 1 + cfg.num_body_layers
        n_layers = len(cfg.layer_specs)
        for i in range(wide_from, n_layers - 1):
            name = f"conv_{i}"
            k = params[name]["kernel"]
            spec = k.sharding.spec
            assert spec == PartitionSpec(None, None, "model"), (name, spec)
            assert not k.sharding.is_fully_replicated
            # shard truly holds 1/n of the channels
            shard = k.addressable_shards[0].data
            assert shard.shape[-1] == k.shape[-1] // n_shards, (
                name,
                shard.shape,
            )
            b_spec = params[name]["bias"].sharding.spec
            assert b_spec == PartitionSpec("model"), (name, b_spec)
        # classifier: row-parallel on the input channels
        name = f"conv_{n_layers - 1}"
        k = params[name]["kernel"]
        # PartitionSpec trims trailing Nones: (None,'model') == dims (kw, in)
        assert k.sharding.spec == PartitionSpec(None, "model"), (
            name,
            k.sharding.spec,
        )
        assert (
            k.addressable_shards[0].data.shape[1] == k.shape[1] // n_shards
        )

    def test_tensor_parallel_matches_single_device(self, model_and_state):
        """dp4 x tp2 train step must produce the same loss AND updated params
        as single-device execution, with the wide layers actually sharded."""
        h, tx, state = model_and_state
        train_step = h.train_step
        batch = tiny_batch(np.random.RandomState(5), B=8)

        s1, m1 = train_step(state, jax.device_put(batch))

        mesh = pmesh.make_mesh(data_parallel=4, model_parallel=2)
        with pmesh.use_mesh(mesh):
            sharded = pmesh.shard_batch(batch)
            s2, m2 = train_step(h.fresh_state(), sharded)

        assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
        for p1, p2 in zip(
            jax.tree_util.tree_leaves(s1.params),
            jax.tree_util.tree_leaves(s2.params),
        ):
            np.testing.assert_allclose(
                np.asarray(p1), np.asarray(p2), rtol=1e-4, atol=1e-6
            )
        self._assert_model_sharded(s2.params, h.model, n_shards=2)

    def test_pure_tensor_parallel_8way(self, model_and_state):
        """model_parallel=8 (no data axis): equivalence + 8-way sharding."""
        h, tx, state = model_and_state
        train_step = h.train_step
        batch = tiny_batch(np.random.RandomState(6), B=4)

        s1, m1 = train_step(state, jax.device_put(batch))

        mesh = pmesh.make_mesh(data_parallel=1, model_parallel=8)
        with pmesh.use_mesh(mesh):
            sharded = pmesh.shard_batch(batch)
            s2, m2 = train_step(h.fresh_state(), sharded)

        assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
        p1 = jax.tree_util.tree_leaves(s1.params)[0]
        p2 = jax.tree_util.tree_leaves(s2.params)[0]
        np.testing.assert_allclose(
            np.asarray(p1), np.asarray(p2), rtol=1e-4, atol=1e-6
        )
        # TINY wide_channels=32 divides 8: all wide layers shard 8-way
        self._assert_model_sharded(s2.params, h.model, n_shards=8)


class TestCheckpoint:
    def test_roundtrip_and_lr_reset(self, model_and_state, tmp_path):
        from speecht_tpu.train.checkpoint import CheckpointManager

        h, tx, state = model_and_state
        train_step = h.train_step
        batch = tiny_batch(np.random.RandomState(6))
        state, _ = train_step(state, batch)
        state = tstep.decay_learning_rate(state, 0.25)

        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(state, wait=True)

        template = jax.tree_util.tree_map(jnp.zeros_like, state)
        restored, was_restored = mgr.restore_or_create(template)
        assert was_restored
        assert int(restored.step) == 1
        assert float(restored.learning_rate) == pytest.approx(3e-3 * 0.25)
        np.testing.assert_allclose(
            np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
            np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
        )

        reset = mgr.restore(template, reset_learning_rate=1e-4)
        assert float(reset.learning_rate) == pytest.approx(1e-4)
        mgr.close()

    def test_missing_checkpoint_raises(self, model_and_state, tmp_path):
        from speecht_tpu.train.checkpoint import CheckpointManager

        _, _, state = model_and_state
        mgr = CheckpointManager(str(tmp_path / "empty"))
        with pytest.raises(FileNotFoundError):
            mgr.restore(state)
        _, was_restored = mgr.restore_or_create(state)
        assert not was_restored


class TestMetricsWriter:
    def test_tensorboard_can_read_events(self, tmp_path):
        from speecht_tpu.train.metrics_writer import SummaryWriter

        w = SummaryWriter(str(tmp_path))
        w.add_scalars(10, {"loss": 1.5, "learning_rate": 1e-4})
        w.add_scalar("loss", 0.75, step=20)
        w.close()

        # verify with TF's own record reader + Event proto
        import tensorflow as tf
        from tensorflow.core.util import event_pb2

        events = []
        for raw in tf.data.TFRecordDataset(w.path):
            e = event_pb2.Event()
            e.ParseFromString(raw.numpy())
            events.append(e)
        assert events[0].file_version == "brain.Event:2"
        scalars = {
            (v.tag, e.step): v.simple_value
            for e in events[1:]
            for v in e.summary.value
        }
        assert scalars[("loss", 10)] == pytest.approx(1.5)
        assert scalars[("learning_rate", 10)] == pytest.approx(1e-4)
        assert scalars[("loss", 20)] == pytest.approx(0.75)

    def test_histograms_and_images_readable(self, tmp_path):
        from speecht_tpu.train.metrics_writer import SummaryWriter

        rng = np.random.RandomState(0)
        w = SummaryWriter(str(tmp_path))
        values = rng.randn(500)
        w.add_histograms(5, {"weights": values})
        img = rng.rand(12, 34)
        w.add_images(5, {"logits": img})
        w.close()

        import tensorflow as tf
        from tensorflow.core.util import event_pb2

        events = []
        for raw in tf.data.TFRecordDataset(w.path):
            e = event_pb2.Event()
            e.ParseFromString(raw.numpy())
            events.append(e)
        histo = next(
            v.histo
            for e in events
            for v in e.summary.value
            if v.tag == "weights"
        )
        assert histo.num == 500
        assert histo.min == pytest.approx(values.min())
        assert histo.sum == pytest.approx(values.sum())
        image = next(
            v.image
            for e in events
            for v in e.summary.value
            if v.tag == "logits"
        )
        assert image.height == 12 and image.width == 34
        decoded = tf.io.decode_png(image.encoded_image_string)
        assert decoded.shape == (12, 34, 1)
        # pixel values monotone in source values
        flat_src = img.ravel()
        flat_px = decoded.numpy().ravel()
        assert flat_px[flat_src.argmax()] == 255
        assert flat_px[flat_src.argmin()] == 0


class TestPipeline:
    def test_build_batch_bucketing(self):
        rng = np.random.RandomState(0)
        samples = [
            (rng.randn(100, 8).astype(np.float32), [1, 2, 3]),
            (rng.randn(300, 8).astype(np.float32), [4, 5]),
        ]
        b = build_batch(samples, time_bucket=256, label_bucket=32)
        assert b.features.shape == (2, 512, 8)
        assert b.labels.shape == (2, 32)
        # default label width ties to the time bucket (T/4)
        b2 = build_batch(samples, time_bucket=256)
        assert b2.labels.shape == (2, 128)
        assert b.seq_lengths.tolist() == [100, 300]
        assert b.label_lengths.tolist() == [3, 2]
        assert b.labels[0, 3] == vocabulary.PAD_ID

    def test_prefetch_loader_exhausts(self):
        from speecht_tpu.data.pipeline import PrefetchLoader

        rng = np.random.RandomState(1)

        def gen():
            for _ in range(10):
                yield rng.randn(50, 8).astype(np.float32), [1, 2]

        loader = PrefetchLoader(
            gen, batch_size=4, time_bucket=64, device_put=False
        )
        batches = list(loader)
        assert len(batches) == 3  # 4 + 4 + padded 2
        assert batches[-1].seq_lengths.tolist() == [50, 50, 0, 0]

    def test_prefetch_loader_max_steps(self):
        from speecht_tpu.data.pipeline import PrefetchLoader

        def gen():
            while True:
                yield np.zeros((10, 8), np.float32), [1]

        loader = PrefetchLoader(
            gen, batch_size=2, max_steps=5, device_put=False
        )
        assert len(list(loader)) == 5

    def test_prefetch_loader_counts_stalls(self):
        # a slow producer forces the consumer to block on the queue; the
        # stall counters are the input-pipeline health signal the training
        # loop reports per checkpoint interval
        import time as _time

        from speecht_tpu.data.pipeline import PrefetchLoader

        def slow_gen():
            for _ in range(6):
                _time.sleep(0.02)
                yield np.zeros((10, 8), np.float32), [1]

        loader = PrefetchLoader(slow_gen, batch_size=2, device_put=False)
        n = len(list(loader))
        assert n == 3
        assert loader.batches_yielded == 3
        assert loader.stall_count >= 1
        assert loader.stall_seconds > 0.0

        # a fast producer with a slow consumer must NOT count stalls;
        # start() the worker explicitly (iter() alone is lazy — the
        # generator body only runs at the first next()) so the queue is
        # genuinely pre-filled before consumption begins
        def fast_gen():
            for _ in range(6):
                yield np.zeros((10, 8), np.float32), [1]

        loader = PrefetchLoader(fast_gen, batch_size=2, device_put=False)
        loader.start()
        _time.sleep(0.1)  # let the producer fill the queue
        for _ in loader:
            _time.sleep(0.01)
        assert loader.stall_count == 0

    def test_prefetch_loader_first_batch_wait_is_warmup(self):
        # the wait for the very first batch is unavoidable (the worker has
        # not run yet) and must not be reported as a pipeline stall
        import time as _time

        from speecht_tpu.data.pipeline import PrefetchLoader

        def warmup_gen():
            _time.sleep(0.05)  # slow first batch only
            for _ in range(6):
                yield np.zeros((10, 8), np.float32), [1]

        loader = PrefetchLoader(warmup_gen, batch_size=2, device_put=False)
        for _ in loader:
            _time.sleep(0.02)  # consumer slower than producer after warmup
        assert loader.batches_yielded == 3
        assert loader.stall_count == 0
        assert loader.stall_seconds == 0.0

    def test_prefetch_loader_propagates_errors(self):
        from speecht_tpu.data.pipeline import PrefetchLoader

        def gen():
            yield np.zeros((10, 8), np.float32), [1]
            yield np.zeros((10, 8), np.float32), [1]
            raise RuntimeError("boom")

        loader = PrefetchLoader(gen, batch_size=2, device_put=False)
        with pytest.raises(RuntimeError, match="boom"):
            list(loader)

    def test_prefetch_loader_reiterates(self):
        # a second pass restarts from the generator factory instead of
        # blocking forever on the drained queue
        from speecht_tpu.data.pipeline import PrefetchLoader

        def gen():
            for _ in range(4):
                yield np.zeros((10, 8), np.float32), [1]

        loader = PrefetchLoader(gen, batch_size=2, device_put=False)
        first = list(loader)
        second = list(loader)
        assert len(first) == len(second) == 2
        assert first[0].features.shape == second[0].features.shape

    def test_group_by_length_rejected_multiprocess(self, monkeypatch):
        # per-process bin-fill order is shard-dependent, which breaks the
        # lockstep the cross-process bucket sync requires
        from speecht_tpu.data import pipeline

        monkeypatch.setattr(pipeline.jax, "process_count", lambda: 2)
        with pytest.raises(ValueError, match="group-by-length"):
            next(
                pipeline.batch_iterator(
                    iter([]), batch_size=2, group_by_length=True
                )
            )


class TestGroupByLength:
    def test_batches_are_length_homogeneous(self):
        from speecht_tpu.data.pipeline import batch_iterator

        rng = np.random.RandomState(0)
        lengths = [50, 260, 60, 270, 40, 280, 70, 290]

        def gen():
            for n in lengths:
                yield rng.randn(n, 8).astype(np.float32), [1, 2]

        batches = list(
            batch_iterator(
                gen(), batch_size=4, time_bucket=256, group_by_length=True
            )
        )
        assert len(batches) == 2
        shapes = sorted(b.features.shape[1] for b in batches)
        assert shapes == [256, 512]
        # all 4 short utterances ended up in the 256-frame batch
        short = next(b for b in batches if b.features.shape[1] == 256)
        assert sorted(short.seq_lengths.tolist()) == [40, 50, 60, 70]

    def test_leftovers_padded_not_dropped(self):
        from speecht_tpu.data.pipeline import batch_iterator

        def gen():
            for n in (10, 300, 20):
                yield np.zeros((n, 8), np.float32), [1]

        batches = list(
            batch_iterator(
                gen(), batch_size=2, time_bucket=256, group_by_length=True
            )
        )
        total = sum((b.seq_lengths > 0).sum() for b in batches)
        assert total == 3

    def test_every_sample_seen_once(self):
        from speecht_tpu.data.pipeline import batch_iterator

        rng = np.random.RandomState(1)

        def gen():
            for i in range(37):
                n = rng.randint(10, 1000)
                yield np.full((n, 8), i, np.float32), [i % 28]

        batches = list(
            batch_iterator(
                gen(), batch_size=8, time_bucket=256, group_by_length=True
            )
        )
        seen = []
        for b in batches:
            for i in range(b.features.shape[0]):
                if b.seq_lengths[i] > 0:
                    seen.append(int(b.features[i, 0, 0]))
        assert sorted(seen) == list(range(37))


def test_infeasible_labels_excluded_from_loss(model_and_state):
    # a label longer than the logit frames can emit must not poison the
    # batch loss or gradients
    h, tx, state = model_and_state
    rng = np.random.RandomState(9)
    batch = tiny_batch(rng, B=2, T=32, L=4)
    bad = Batch(
        features=batch.features,
        seq_lengths=batch.seq_lengths,
        labels=np.concatenate(
            [batch.labels, rng.randint(0, 5, (2, 20)).astype(np.int32)],
            axis=1,
        ),
        label_lengths=np.array([4, 24], np.int32),  # row 1 infeasible (T/2=16)
    )
    l_all, _ = h.loss_fn(state.params, bad)
    only_good = Batch(
        features=batch.features[:1],
        seq_lengths=batch.seq_lengths[:1],
        labels=bad.labels[:1],
        label_lengths=bad.label_lengths[:1],
    )
    l_good, _ = h.loss_fn(state.params, only_good)
    assert float(l_all) == pytest.approx(float(l_good), rel=1e-5)

    g = jax.grad(lambda p: h.loss_fn(p, bad)[0])(state.params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)


def test_grad_accum_matches_big_batch(harness):
    """G micro-batches of B rows must produce the SAME update as one
    batch of G*B rows: the accumulated average gradient equals the
    big-batch gradient when every micro-batch has the same (fully
    feasible) row count, and the clip/Adam/lr chain sees it once."""
    G = 2
    micro = [
        tiny_batch(np.random.RandomState(21)),
        tiny_batch(np.random.RandomState(22)),
    ]
    big = Batch(
        features=np.concatenate([b.features for b in micro]),
        seq_lengths=np.concatenate([b.seq_lengths for b in micro]),
        labels=np.concatenate([b.labels for b in micro]),
        label_lengths=np.concatenate([b.label_lengths for b in micro]),
    )

    accum_step = tstep.make_train_step_acc(
        harness.model, harness.tx, accum_steps=G
    )
    state_a = harness.fresh_state()
    gacc = tstep.init_grad_accum(state_a.params)
    acc = tstep.init_metrics_acc()
    for b in micro:
        state_a, gacc, acc = accum_step(state_a, gacc, acc, b)

    state_b, _m = harness.train_step(harness.fresh_state(), big)

    # one optimizer apply happened, after the second micro-batch
    assert float(acc["updates"]) == 1.0
    assert float(acc["count"]) == 2.0
    assert int(state_a.step) == 1
    assert float(jnp.asarray(gacc["k"])) == 0  # carry reset after apply
    for a, b in zip(
        jax.tree_util.tree_leaves(state_a.params),
        jax.tree_util.tree_leaves(state_b.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )

    # a second round reuses the zeroed carry and applies again
    for b in micro:
        state_a, gacc, acc = accum_step(state_a, gacc, acc, b)
    assert float(acc["updates"]) == 2.0
    assert int(state_a.step) == 2
