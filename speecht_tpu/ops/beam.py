"""Beam-search CTC decoding: device lattice prep + three decode backends.

Capability parity with the reference's LM decoding path (reference:
speecht/speech_model.py:101-111 — forked ctc_beam_search_decoder with
KenLM directory, the three shallow-fusion weights as runtime placeholders,
beam_width=100, top_paths=1). The device part is always the same
(jit: forward -> log-softmax -> blank collapse per arXiv:2210.17017,
shrinking T 3-5x before decode); what runs the search differs:

  default:         host C++ prefix beam with n-gram shallow fusion and the
                   vocabulary trie (native/beam_search.cpp), threaded over
                   the batch; device forward of batch N+1 overlaps it.
  --device-beam:   the same LM-fused search ON the TPU, batch-parallel,
                   emissions never leave the chip (ops/beam_device.py;
                   needs the ARPA source — binary n-gram keys are one-way).
  --rescore N:     with --device-beam: pure-acoustic device beam keeps the
                   n-best, ONE native call per hypothesis rescoring picks
                   the winner — reads KenLM binaries, exposes n-best.

The three weights are plain call arguments — never baked into compiled
code — so `speecht-cli search` can mutate them per evaluation (reference
parameter_search.py:80-85 placeholder semantics).
"""

from __future__ import annotations

import concurrent.futures
import os
import time

import jax
import numpy as np

from speecht_tpu import native, vocabulary
from speecht_tpu.models.wav2letter import output_length
from speecht_tpu.ops import decode as decode_ops
from speecht_tpu.parallel import mesh as pmesh
from speecht_tpu.train import step as tstep


def find_lm_files(directory: str) -> tuple[str, str | None]:
    """Locate (model, vocabulary) in an LM directory.

    Accepts the reference's released bundle layout (speecht-cli:84-88:
    `kenlm-model.binary` + `vocabulary` + `trie`) — the KenLM PROBING
    binary is read natively (native/kenlm_binary.cpp) — as well as ARPA
    source layouts (``*.arpa`` / ``*.arpa.txt``). Binaries are preferred
    when both are present; the optional ``vocabulary`` file feeds the
    valid-word trie (the reference's separate `trie` file is an internal
    artifact of the forked TF decoder and is not needed here).
    """
    names = sorted(os.listdir(directory))
    model = None
    for name in names:  # prefer the released binary bundle
        if name.endswith(".binary") or name == "kenlm-model.bin":
            model = os.path.join(directory, name)
            break
    if model is None:
        model = find_arpa_file(directory)
    if model is None:
        raise FileNotFoundError(
            f"no .binary or .arpa language model found in {directory}"
        )
    vocab = os.path.join(directory, "vocabulary")
    return model, (vocab if os.path.exists(vocab) else None)


def find_arpa_file(directory: str) -> str | None:
    """The ARPA source in an LM directory, if any."""
    for name in sorted(os.listdir(directory)):
        if name.endswith(".arpa") or name.endswith(".arpa.txt"):
            return os.path.join(directory, name)
    return None


class BeamSearchDecoder:
    """Batch beam-search decoder with optional n-gram LM shallow fusion."""

    def __init__(self, model, lm_config, blank_threshold: float | None = None,
                 num_threads: int | None = None,
                 feature_type: str | None = None,
                 device_beam: bool | None = None,
                 wire_sr: int | None = None):
        """``feature_type`` switches the device part to the raw-audio front
        end (AudioBatch inputs, features computed on device); ``wire_sr``
        is the sample rate that audio arrives at (the corpus native rate
        when the caller decodes without host resampling — the device then
        resamples to 22050 fused with the features).

        ``blank_threshold`` defaults to the lm_config's (``--blank-threshold``
        CLI flag, 0.999): frames whose blank probability exceeds it are
        dropped on device before the beam (arXiv:2210.17017).

        ``device_beam`` (default: the lm_config's ``--device-beam`` flag)
        runs the beam itself on the TPU (`ops/beam_device.py`) instead of
        the host C++ beam — batch-parallel, no host-core bottleneck. The
        LM directory may hold either the ARPA source or a KenLM PROBING
        binary (the released bundle layout works unmodified)."""
        self.model = model
        self.lm_config = lm_config
        if blank_threshold is None:
            blank_threshold = getattr(lm_config, "blank_threshold", 0.999)
        self.blank_threshold = blank_threshold
        if device_beam is None:
            device_beam = bool(getattr(lm_config, "device_beam", False))
        self.device_beam = device_beam
        self.rescore_n = int(getattr(lm_config, "rescore_n", 0) or 0)
        self._seen_buckets: set[tuple[int, int]] = set()
        if self.rescore_n and not device_beam:
            raise ValueError("--rescore requires --device-beam")
        self.lm = None
        self._beam_fn = None
        if device_beam and self.rescore_n:
            # two-stage decode: pure-acoustic device beam keeps the n-best,
            # the host LM rescores (works with ARPA AND KenLM binaries —
            # no device tables needed)
            from speecht_tpu.ops import beam_device

            if lm_config.language_model:
                arpa, vocab = find_lm_files(lm_config.language_model)
                self.lm = native.NGramLM(arpa, vocab)
            self._beam_fn = beam_device.make_device_beam_search(
                lm_config.beam_width, lm=None, n_best=self.rescore_n
            )
        elif device_beam:
            from speecht_tpu.ops import beam_device

            device_lm = None
            if lm_config.language_model:
                # the released bundle layout works unmodified: PROBING
                # binaries feed the device tables through the native
                # raw-table dump (DeviceLM.from_binary); ARPA sources are
                # parsed directly. Binaries preferred (native parse is
                # much faster than the Python ARPA reader at LM scale).
                model_path, vocab = find_lm_files(lm_config.language_model)
                budget_gb = float(
                    getattr(lm_config, "device_lm_hbm_gb", 8.0)
                )
                # cheap pre-check: device tables measured ~2.6x a PROBING
                # binary (542 MB tables from a 211 MB binary,
                # docs/kernels.md) / ~1.2x an ARPA text. Skips even
                # *parsing* an LM that cannot fit.
                fsize = os.path.getsize(model_path)
                factor = 2.6 if native.lm_is_binary(model_path) else 1.2
                est_gb = fsize * factor / (1 << 30)
                fallback = (
                    "falling back to the host beam (use --rescore N "
                    "for a device-accelerated path with large LMs)"
                )
                if est_gb > budget_gb:
                    print(
                        f"device LM tables would need ~{est_gb:.1f} GiB "
                        f"HBM (> --device-lm-hbm-gb {budget_gb:.1f}); "
                        + fallback
                    )
                    device_beam = self.device_beam = False
                else:
                    # the exact check runs inside DeviceLM BEFORE any
                    # device upload (beam_device._upload_tables), so an
                    # LM the estimate missed degrades gracefully instead
                    # of OOMing the chip mid-build
                    budget_bytes = int(budget_gb * (1 << 30))
                    try:
                        # packed tables persist on disk keyed by LM/vocab
                        # content — the build (minutes at 10M-n-gram
                        # scale) is paid once per LM, not per process
                        device_lm = beam_device.DeviceLM.cached(
                            model_path, vocab,
                            hbm_budget_bytes=budget_bytes,
                        )
                    except beam_device.DeviceLMBudgetError as e:
                        print(
                            f"device LM tables need "
                            f"{e.bytes_needed / (1 << 30):.1f} GiB HBM "
                            f"(> --device-lm-hbm-gb {budget_gb:.1f}); "
                            + fallback
                        )
                        device_lm = None
                        device_beam = self.device_beam = False
            if device_beam:
                self._beam_fn = beam_device.make_device_beam_search(
                    lm_config.beam_width, lm=device_lm
                )
        if not device_beam and not self.rescore_n and (
            lm_config.language_model
        ):
            model_path, vocab = find_lm_files(lm_config.language_model)
            self.lm = native.NGramLM(model_path, vocab)
        self._loss_fn = tstep.make_loss_fn(model)
        self._pool = None
        if not device_beam or self.rescore_n:
            # host beam / host rescoring parallelize per utterance
            self._pool = concurrent.futures.ThreadPoolExecutor(
                max_workers=num_threads or min(32, (os.cpu_count() or 8))
            )

        if feature_type is None:

            @jax.jit
            def device_part(params, batch):
                avg_loss, logits = self._loss_fn(params, batch)
                logit_lengths = output_length(batch.seq_lengths)
                logp, new_lengths = decode_ops.blank_collapse(
                    logits, logit_lengths, self.blank_threshold
                )
                return avg_loss, logp, new_lengths

        else:
            import jax.numpy as jnp

            from speecht_tpu.data import features_tpu as FT
            from speecht_tpu.ops import ctc_pallas

            # undoes the int16 wire and fuses the native-rate -> 22050
            # polyphase resample when ``wire_sr`` says the host shipped
            # native-rate audio (evaluation.wire_sr)
            feature_fn = FT.make_front_end(feature_type, wire_sr=wire_sr)

            @jax.jit
            def device_part(params, batch):
                feats, frame_lengths = feature_fn(
                    batch.audio, batch.num_samples
                )
                logits = model.apply({"params": params}, feats)
                logit_lengths = output_length(frame_lengths)
                losses = ctc_pallas.ctc_loss(
                    logits, logit_lengths, batch.labels, batch.label_lengths
                )
                # where-mask: padded rows' features are nan (0/0 in the
                # masked normalize), so nan * 0 would poison the average
                real = (batch.num_samples > 0) & (losses < 1e29)
                avg_loss = jnp.sum(
                    jnp.where(real, losses, 0.0)
                ) / jnp.maximum(jnp.sum(real.astype(jnp.float32)), 1.0)
                logit_lengths = jnp.where(
                    batch.num_samples > 0, logit_lengths, 0
                )
                logp, new_lengths = decode_ops.blank_collapse(
                    logits, logit_lengths, self.blank_threshold
                )
                return avg_loss, logp, new_lengths

        self._device_part = device_part

    def _announce_bucket(self, B: int, t_bucket: int):
        """First-use compile announcement for a (batch, frames) bucket.

        A fresh bucket means a (possibly minutes-long on a cold cache) XLA
        compile — say so instead of hanging silently. Returns a callback
        to invoke after the first synced result; it prints the ready time
        on a bucket's first use and is a no-op afterwards.
        """
        if (B, t_bucket) in self._seen_buckets:
            return lambda: None
        self._seen_buckets.add((B, t_bucket))
        print(
            f"device beam: bucket B{B}xT{t_bucket} first use -- "
            "compiling (minutes on a cold cache; "
            "tools/warm_beam_cache.py precompiles the ladder)",
            flush=True,
        )
        t_start = time.perf_counter()

        def ready():
            print(
                f"device beam: bucket B{B}xT{t_bucket} ready in "
                f"{time.perf_counter() - t_start:.1f}s",
                flush=True,
            )

        return ready

    def decode_emissions(
        self,
        logp: np.ndarray,
        lengths: np.ndarray,
        lm_weight: float | None = None,
        word_count_weight: float | None = None,
        valid_word_count_weight: float | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Host beam over [B, T, C] log-probs -> (ids [B, T], lengths [B])."""
        cfg = self.lm_config
        lm_w = cfg.lm_weight if lm_weight is None else lm_weight
        wc_w = (
            cfg.word_count_weight
            if word_count_weight is None
            else word_count_weight
        )
        vwc_w = (
            cfg.valid_word_count_weight
            if valid_word_count_weight is None
            else valid_word_count_weight
        )

        B, T, _C = logp.shape
        if self.device_beam:
            # slice the scan to a 32-multiple of the batch's max collapsed
            # length: the jitted search retraces once per bucket (cached),
            # and short batches stop paying for the full logit width
            t_max = int(np.max(lengths)) if B else 0
            t_bucket = min(T, max(32, -(-t_max // 32) * 32))
            # multi-host: lengths are process-local rows, but the jitted
            # search is one SPMD program — all processes must trace the
            # same bucket (identity single-process)
            t_bucket = int(pmesh.sync_bucket_dims(t_bucket)[0])
            announce_ready = self._announce_bucket(B, t_bucket)
            if self.rescore_n:
                # stage 1: pure-acoustic n-best (all fusion weights zero)
                ids, lens, scores = self._beam_fn(
                    logp[:, :t_bucket], lengths, 0.0, 0.0, 0.0
                )
                # host_global == np.asarray single-process; multi-host
                # it all-gathers the full rows (sync: run complete)
                ids = pmesh.host_global(ids)
                announce_ready()
                return self._rescore(
                    ids,
                    pmesh.host_global(lens),
                    pmesh.host_global(scores),
                    lm_w,
                    wc_w,
                    vwc_w,
                )
            ids, out_lengths = self._beam_fn(
                logp[:, :t_bucket], lengths, lm_w, wc_w, vwc_w
            )
            ids = pmesh.host_global(ids)  # sync: compile + run complete
            announce_ready()
            return ids, pmesh.host_global(out_lengths)

        out = np.full((B, T), vocabulary.PAD_ID, dtype=np.int32)
        out_lengths = np.zeros(B, dtype=np.int32)

        def one(i):
            ids = native.ctc_beam_search(
                logp[i, : lengths[i]],
                beam_width=cfg.beam_width,
                lm=self.lm,
                lm_weight=lm_w,
                word_count_weight=wc_w,
                valid_word_count_weight=vwc_w,
                blank_id=vocabulary.BLANK_ID,
            )
            return i, ids

        for i, ids in self._pool.map(one, range(B)):
            out[i, : len(ids)] = ids
            out_lengths[i] = len(ids)
        # multi-host: each process beamed its own shard's rows (the beam
        # work divides across hosts); reassemble the global batch so the
        # caller's tracking sees every row (identity single-process)
        return (
            pmesh.allgather_host_rows(out),
            pmesh.allgather_host_rows(out_lengths),
        )

    def _rescore(self, ids, lens, scores, lm_w, wc_w, vwc_w):
        """Stage 2 of ``--rescore``: add the fusion bonus to each n-best
        hypothesis on the host and keep the best per row.

        The bonus mirrors the fused beam exactly — per completed word
        (every word is "completed" in a final hypothesis, incl. the last):
        lm_weight * ln10 * log10 P(w | <s> + last-4-word window) +
        word_count_weight + valid_word_count_weight * [in vocabulary].
        """
        B, N, T = ids.shape
        out = np.full((B, T), vocabulary.PAD_ID, np.int32)
        out_lens = np.zeros(B, np.int32)
        ln10 = float(np.log(10.0))

        def bonus(hyp_ids, hyp_len):
            s = vocabulary.ids_to_sentence(hyp_ids[:hyp_len])
            if self.lm is not None:
                # one native call scores the whole hypothesis with the
                # beam's history semantics (st_lm_score_sentence)
                lm_sum, n_words, n_valid = self.lm.score_sentence(s)
                return (
                    lm_w * ln10 * lm_sum
                    + wc_w * n_words
                    + vwc_w * n_valid
                )
            return wc_w * len([w for w in s.split(" ") if w])

        def one(b):
            totals = [
                scores[b, n] + bonus(ids[b, n], int(lens[b, n]))
                if scores[b, n] > -1e29
                else -np.inf
                for n in range(N)
            ]
            return b, int(np.argmax(totals))

        for b, best in self._pool.map(one, range(B)):
            n = int(lens[b, best])
            out[b, :n] = ids[b, best, :n]
            out_lens[b] = n
        return out, out_lens

    def eval_step(self, params, batch, **weight_overrides):
        """(loss, decoded_ids, decoded_lengths) — drop-in for make_eval_step."""
        avg_loss, logp, lengths = self._device_part(params, batch)
        if not self.device_beam:
            # each process host-beams its own shard rows
            logp = pmesh.local_rows(logp)
            lengths = pmesh.local_rows(lengths)
        else:
            # the jitted device beam consumes the GLOBAL logp, so the
            # length vector must cover the global batch too
            lengths = pmesh.host_global(lengths)
        decoded, dec_lengths = self.decode_emissions(
            logp, lengths, **weight_overrides
        )
        return avg_loss, decoded, dec_lengths

    def eval_batches(self, params, batches, **weight_overrides):
        """Pipelined evaluation: yields (batch, loss, decoded, lengths).

        The device forward+collapse of batch N+1 is dispatched (async under
        jit) *before* the host beam of batch N runs, so the TPU computes the
        next batch while the host threads beam the current one — instead of
        the serial fetch-then-beam of :meth:`eval_step`, which leaves the
        device idle for the whole host beam.
        """
        pending = None
        for batch in batches:
            device_out = self._device_part(params, batch)  # async dispatch
            if pending is not None:
                yield self._finish_batch(pending, weight_overrides)
            pending = (batch, device_out)
        if pending is not None:
            yield self._finish_batch(pending, weight_overrides)

    def _finish_batch(self, pending, weight_overrides):
        batch, (avg_loss, logp, lengths) = pending
        # device mode keeps the emissions on the chip: only the [B] length
        # vector crosses to pick the scan bucket, then the beam runs on the
        # device-resident slice
        if not self.device_beam:
            # blocks until the forward is done; each process beams its rows
            logp = pmesh.local_rows(logp)
            lengths = pmesh.local_rows(lengths)
        else:
            lengths = pmesh.host_global(lengths)
        decoded, dec_lengths = self.decode_emissions(
            logp, lengths, **weight_overrides
        )
        return batch, avg_loss, decoded, dec_lengths
