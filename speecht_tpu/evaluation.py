"""Evaluation executor.

Capability parity with the reference evaluation loop (reference:
speecht/evaluation.py:68-171): runs the dev/test split (``--dev``/``--test``)
for ``--step-count`` batches (0 = whole split), restores the checkpoint
(missing checkpoint is fatal), computes loss + decodes, prints per-sample
expected/decoded strings with LED/LER/WED/WER, then global statistics; a
summary is written for the first step when saving is enabled
(evaluation.py:126-137).

TPU-native: decode happens on device (greedy argmax-collapse; with
``--language-model`` the beam lattice + host LM, the fully on-device
``--device-beam``, or the two-stage ``--rescore`` mode — ops/beam.py); the
device returns dense padded id rows instead of SparseTensors, so "extract
decoded ids" is a row slice (the reference walks sparse indices,
evaluation.py:160-171).
"""

from __future__ import annotations

import os

import numpy as np

from speecht_tpu import vocabulary
from speecht_tpu.execution import DatasetExecutor, init_state
from speecht_tpu.metrics import EvalStatistics
from speecht_tpu.parallel import mesh as pmesh
from speecht_tpu.train import step as tstep
from speecht_tpu.train.metrics_writer import SummaryWriter
from speecht_tpu.training import perplexity


class Evaluation(DatasetExecutor):
    def dataset_name(self) -> str:
        return self.flags.dataset

    @property
    def from_audio(self) -> bool:
        return bool(getattr(self.flags, "from_audio", False))

    @property
    def seq_parallel(self) -> int:
        return int(getattr(self.flags, "seq_parallel", 0) or 0)

    @property
    def wire_sr(self) -> int:
        """Sample rate raw audio crosses the wire at (``--from-audio``).

        The corpus's native rate when EVERY file shares it (verified by a
        STREAMINFO header scan — a mixed-rate corpus would band-limit the
        off-rate files through a host pre-resample) and the native->22050
        ratio is rational enough for the on-device polyphase resample
        (ops/resample.py) — the host then only decodes (no 1-core
        resample bottleneck) and ships ~27% fewer samples for 16 kHz
        sources; otherwise 22050 (the host resamples, as before round 3).
        Probed once per run.
        """
        if getattr(self, "_wire_sr", None) is None:
            from speecht_tpu.native import DEFAULT_SR
            from speecht_tpu.ops import resample as resample_mod

            native_sr = self.reader.probe_native_rate(self.flags.dataset)
            if (
                native_sr is not None
                and native_sr != DEFAULT_SR
                and resample_mod.is_rational(native_sr, DEFAULT_SR)
            ):
                self._wire_sr = native_sr
                print(
                    f"from-audio: decoding at native {native_sr} Hz; "
                    f"resampling to {DEFAULT_SR} Hz on device"
                )
            else:
                self._wire_sr = DEFAULT_SR
        return self._wire_sr

    def create_mesh(self):
        if self.seq_parallel > 1:
            n = self.seq_parallel
            lm = getattr(self.flags, "lm", None)
            if self.from_audio or (lm is not None and lm.language_model):
                raise ValueError(
                    "--seq-parallel combines only with the cached-feature "
                    "greedy evaluate (not --from-audio/--language-model)"
                )
            from speecht_tpu.parallel.seq_parallel import make_sp_mesh

            return make_sp_mesh(self.flags, n)
        return super().create_mesh()

    def determine_input_size(self) -> int:
        if self.from_audio:
            from speecht_tpu.data.features import feature_size

            return feature_size(self.flags.feature_type)
        return super().determine_input_size()

    def create_sample_generator(self, limit_count: int):
        if self.from_audio:
            return self.reader.load_raw_samples(
                self.flags.dataset,
                loop_infinitely=False,
                limit_count=limit_count,
                sample_rate=self.wire_sr,
                **self.shard_kwargs,
            )
        return self.reader.load_samples(
            self.flags.dataset,
            loop_infinitely=False,
            limit_count=limit_count,
            feature_type=self.flags.feature_type,
            max_size=getattr(self.flags, "max_input_frames", 0) or False,
            **self.shard_kwargs,
        )

    def create_loader(self):
        if not self.from_audio:
            return super().create_loader()
        from speecht_tpu.data.pipeline import (
            PrefetchLoader,
            build_audio_batch,
        )
        from speecht_tpu.native import DEFAULT_SR
        from speecht_tpu.ops import resample as resample_mod

        # sample bucket in WIRE-rate space: a multiple of the polyphase
        # hop (batch_resample needs S % M == 0) that resamples to at
        # least the feature-frame bucket
        sample_bucket = resample_mod.input_bucket(
            160 * getattr(self.flags, "bucket_step", 256),
            self.wire_sr,
            DEFAULT_SR,
        )
        return PrefetchLoader(
            lambda: self.create_sample_generator(
                self.get_loader_limit_count()
            ),
            batch_size=self.local_batch_size(),
            time_bucket=sample_bucket,
            max_steps=self.get_max_steps(),
            batch_builder=build_audio_batch,
            transfer_dtype=getattr(
                self.flags, "transfer_dtype", "bfloat16"
            ),
        )

    def get_loader_limit_count(self) -> int:
        # GLOBAL file budget: the reader truncates the file list BEFORE
        # sharding it across processes (data/reader.py load_samples), so
        # the limit must cover step_count full global batches — each
        # process then keeps step_count * local_batch files of it
        return self.flags.step_count * self.flags.batch_size

    def get_max_steps(self):
        return self.flags.step_count or None

    def make_decoder(self):
        """Returns (params, batch) -> (loss, decoded_rows, decoded_lengths).

        With ``--language-model`` the decoder is also kept on ``self._beam``
        so the run loop can use its pipelined ``eval_batches`` (device
        forward of batch N+1 overlaps the host beam of batch N).
        """
        self._beam = None
        lm_flags = getattr(self.flags, "lm", None)
        if lm_flags is not None and lm_flags.language_model:
            from speecht_tpu.ops.beam import BeamSearchDecoder

            self._beam = BeamSearchDecoder(
                self.model,
                lm_flags,
                feature_type=(
                    self.flags.feature_type if self.from_audio else None
                ),
                wire_sr=self.wire_sr if self.from_audio else None,
            )
            return self._beam.eval_step
        if self.from_audio:
            return self._make_audio_eval_step()
        if self.seq_parallel > 1:
            from speecht_tpu.parallel.seq_parallel import (
                make_sp_eval_step,
                sp_data_axis,
            )

            return make_sp_eval_step(
                self.model, self.mesh, data_axis=sp_data_axis(self.mesh)
            )
        return tstep.make_eval_step(self.model)

    def _result_iterator(self, eval_step, params, loader):
        """Yields (batch, loss, decoded, lengths), pipelined.

        Beam path: the decoder overlaps device and host work itself. Jitted
        greedy path: dispatch batch N+1's (async) step before handing batch
        N's lazy results to the caller, so the host-side metric tracking of
        batch N runs concurrently with batch N+1's device compute instead of
        serializing on a per-batch readback.
        """
        if self._beam is not None:
            yield from self._beam.eval_batches(params, loader)
            return
        pending = None
        for batch in loader:
            out = eval_step(params, batch)
            if pending is not None:
                yield pending
            pending = (batch, *out)
        if pending is not None:
            yield pending

    def _make_audio_eval_step(self):
        """Fully on-device evaluate: raw audio -> features -> logits -> decode.

        The whole front end (int16 wire decode, polyphase resample from the
        corpus native rate, framing, rFFT, mel projection, normalization —
        features_tpu.make_front_end) fuses into the same XLA program as the
        conv stack and greedy decode; the host only decodes flacs and ships
        padded native-rate audio.
        """
        import jax
        import jax.numpy as jnp

        from speecht_tpu.data import features_tpu as FT
        from speecht_tpu.models.wav2letter import output_length
        from speecht_tpu.ops import ctc_pallas, decode

        feature_fn = FT.make_front_end(
            self.flags.feature_type, wire_sr=self.wire_sr
        )
        model = self.model

        @jax.jit
        def eval_step(params, batch):
            feats, frame_lengths = feature_fn(batch.audio, batch.num_samples)
            logits = model.apply({"params": params}, feats)
            logit_lengths = output_length(frame_lengths)
            losses = ctc_pallas.ctc_loss(
                logits, logit_lengths, batch.labels, batch.label_lengths
            )
            # mask with where, not multiply: padded all-zero rows produce
            # nan FEATURES (0/0 in the masked normalize), so their losses
            # are nan and nan * 0 = nan would poison the batch average
            real = (batch.num_samples > 0) & (losses < 1e29)
            avg_loss = jnp.sum(jnp.where(real, losses, 0.0)) / jnp.maximum(
                jnp.sum(real.astype(jnp.float32)), 1.0
            )
            decoded, dec_lengths, _ = decode.greedy_decode(
                logits, logit_lengths
            )
            # blank out padded rows so tracking skips them
            dec_lengths = jnp.where(batch.num_samples > 0, dec_lengths, 0)
            return avg_loss, decoded, dec_lengths

        return eval_step

    def run(self) -> EvalStatistics:
        flags = self.flags
        state, _tx = init_state(self.model, flags)
        ckpt = self.checkpoint_manager()
        ref_weights = getattr(flags, "reference_weights", None)
        if ref_weights:
            # parity gating against the reference's exported best_run
            # weights (speecht_tpu/compat.py)
            from speecht_tpu import compat

            state = state.replace(
                params=compat.import_reference_weights(
                    state.params, ref_weights
                )
            )
        else:
            state = ckpt.restore(state)  # fatal when missing (parity)
        # multi-process: the restored state is process-local; jit over a
        # mesh spanning processes needs global arrays (identity otherwise)
        state = pmesh.replicate(state, self.mesh)

        import jax

        eval_step = self.make_decoder()
        writer = None
        # process 0 only: one event file per run (training.py does the same)
        if getattr(flags, "should_save", False) and jax.process_index() == 0:
            writer = SummaryWriter(
                os.path.join(
                    flags.log_dir, f"{flags.run_name}_{flags.run_type}"
                )
            )

        stats = EvalStatistics()
        print("Begin evaluation")
        with pmesh.use_mesh(self.mesh):
            loader = self.create_loader()
            results = self._result_iterator(eval_step, state.params, loader)
            for step, (batch, avg_loss, decoded, dec_lengths) in enumerate(
                results
            ):
                self._track_batch(
                    stats, batch, decoded, dec_lengths, verbose=True
                )
                print(
                    "validation average loss {:.2f} perplexity {:.2f}".format(
                        float(avg_loss), perplexity(float(avg_loss))
                    )
                )
                if writer is not None and step == 0:
                    writer.add_scalars(
                        int(state.step), {"eval_loss": float(avg_loss)}
                    )

        self.print_global_statistics(stats)
        if writer is not None:
            writer.close()
        ckpt.close()
        return stats

    @staticmethod
    def _track_batch(
        stats: EvalStatistics,
        batch,
        decoded,
        dec_lengths,
        verbose: bool = False,
    ):
        # host_global: multi-host arrays span non-addressable devices
        # and jit outputs may come back data-sharded or replicated —
        # every process fetches the full global rows (lockstep
        # all-gather) and tracks identical statistics, so no
        # cross-process reduction is needed afterwards
        decoded = pmesh.host_global(decoded)
        dec_lengths = pmesh.host_global(dec_lengths)
        labels = pmesh.host_global(batch.labels)
        label_lengths = pmesh.host_global(batch.label_lengths)
        # Batch carries seq_lengths (feature frames); AudioBatch carries
        # num_samples — either marks padded rows with 0
        if hasattr(batch, "seq_lengths"):
            seq_lengths = pmesh.host_global(batch.seq_lengths)
        else:
            seq_lengths = pmesh.host_global(batch.num_samples)

        for i in range(decoded.shape[0]):
            if seq_lengths[i] == 0:  # padded row of a partial batch
                continue
            expected_str = vocabulary.ids_to_sentence(
                labels[i, : label_lengths[i]]
            )
            decoded_str = vocabulary.ids_to_sentence(
                decoded[i, : dec_lengths[i]]
            )
            stats.track_decoding(decoded_str, expected_str)
            if verbose:
                print(f"expected: {expected_str}")
                print(f"decoded: {decoded_str}")
                print(
                    "LED: {} LER: {:.2f} WED: {} WER: {:.2f}".format(
                        stats.letter_edit_distance,
                        stats.letter_error_rate,
                        stats.word_edit_distance,
                        stats.word_error_rate,
                    )
                )

    @staticmethod
    def print_global_statistics(stats: EvalStatistics):
        print("Global statistics")
        print(stats.summary())
        # 4-decimal twin for scripted consumers: at an error floor the
        # LM-fusion delta can be smaller than the reference-parity
        # 2-decimal summary resolves (the soak/search drills parse this)
        print(
            "precise: LER {:.4f} WER {:.4f}".format(
                stats.global_letter_error_rate,
                stats.global_word_error_rate,
            )
        )
