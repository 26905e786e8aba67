"""Training executor.

Capability parity with the reference training loop (reference:
speecht/training.py:26-98):

- infinite shuffled generator over the cached train split with
  ``--limit-training-set`` (training.py:28-32)
- restore_or_create from the run's train dir with optional lr reset
  (training.py:37-42)
- per-``steps_per_checkpoint``: print global step / lr / avg step-time /
  avg loss / perplexity (exp(loss) capped at 300 — training.py:73-75),
  write summaries, **plateau lr decay** (decay when the running loss exceeds
  the max of the last 3 checkpoint losses — training.py:82-84), save a
  checkpoint.

TPU-native: one jitted donated train step whose loss/grad-norm fold into a
device-resident accumulator, so the hot loop is dispatch-only — the host
reads nothing back between checkpoints (matching the reference's hot loop,
one ``sess.run`` with in-graph dequeue, training.py:57-90). Device prefetch
overlaps H2D with compute; checkpointing is orbax (async-capable); summary
histograms/images are reduced on device (train/summaries.py) and only the
tiny stats cross the tunnel; scalars go to the TensorBoard-compatible event
writer under ``log/<run>_<type>``. ``--verbose-summaries`` adds the
reference's logits/filter/bias images and activation histograms
(speech_model.py:49-51,:158-178).
"""

from __future__ import annotations

import os
import time

import numpy as np

from speecht_tpu.execution import DatasetExecutor, init_state
from speecht_tpu.parallel import mesh as pmesh
from speecht_tpu.train import step as tstep
from speecht_tpu.train import summaries as tsummaries
from speecht_tpu.train.metrics_writer import SummaryWriter


def perplexity(loss: float) -> float:
    return float(np.exp(loss)) if loss < 300 else float("inf")


def should_decay_learning_rate(
    previous_losses: list, current_loss: float, decay_factor: float
) -> bool:
    """Plateau rule: decay when no improvement over the last 3 checkpoints
    (reference training.py:82-84)."""
    return (
        decay_factor > 0
        and len(previous_losses) > 2
        and current_loss > max(previous_losses[-3:])
    )


class Training(DatasetExecutor):
    @property
    def seq_parallel(self) -> int:
        return int(getattr(self.flags, "seq_parallel", 0) or 0)

    @property
    def grad_accum(self) -> int:
        """Micro-batches per optimizer update (``--grad-accum``).

        Effective batch = batch_size * grad_accum while HBM holds only
        one micro-batch's activations — the way to the B256-class MFU
        sweet spot when long buckets (or SP) make B256 itself not fit.
        """
        return int(getattr(self.flags, "grad_accum", 1) or 1)

    def create_mesh(self):
        if self.seq_parallel > 1:
            from speecht_tpu.parallel.seq_parallel import make_sp_mesh

            return make_sp_mesh(self.flags, self.seq_parallel)
        return super().create_mesh()

    def create_sample_generator(self, limit_count: int):
        return self.reader.load_samples(
            "train",
            loop_infinitely=True,
            limit_count=limit_count,
            feature_type=self.flags.feature_type,
            # --max-input-frames: skip-with-warning for too-long utterances
            # (reference preprocessing.py:272-276 max_size semantics)
            max_size=getattr(self.flags, "max_input_frames", 0) or False,
            **self.shard_kwargs,
        )

    def get_loader_limit_count(self) -> int:
        return self.flags.limit_training_set

    def get_max_steps(self):
        return getattr(self.flags, "max_steps", None)

    def run(self):
        flags = self.flags
        state, tx = init_state(self.model, flags)
        ckpt = self.checkpoint_manager()
        state, restored = ckpt.restore_or_create(
            state,
            reset_learning_rate=(
                flags.learning_rate if flags.reset_learning_rate else None
            ),
        )
        if restored:
            # report in the run-visible unit (micro-batches): the
            # checkpoint label is authoritative — it was written by the
            # loop counter in that unit. Deriving it as applies * G is
            # only exact when this run's --grad-accum matches the run
            # that wrote the checkpoint, so prefer the label.
            label = ckpt.latest_step()
            if label is None:
                label = int(state.step) * self.grad_accum
            print(f"Restored model at step {label}")

        sp_loss_fn = None
        if self.seq_parallel > 1:
            # long-utterance training: time-shard the conv stack (halo
            # exchange) instead of discarding what does not fit one chip
            from speecht_tpu.parallel.seq_parallel import (
                make_sp_loss_fn,
                sp_data_axis,
            )

            sp_loss_fn = make_sp_loss_fn(
                self.model, self.mesh, data_axis=sp_data_axis(self.mesh)
            )
        if self.grad_accum > 1:
            print(
                f"gradient accumulation: {self.grad_accum} micro-batches "
                f"per update (effective batch "
                f"{self.flags.batch_size * self.grad_accum})"
            )
        augment_fn = None
        if getattr(flags, "spec_augment", False):
            # on-device SpecAugment, keyed on the optimizer step: fresh
            # masks per micro-batch, zero host cost, eval unaffected
            from speecht_tpu.ops.augment import make_augment_fn

            fw = getattr(flags, "spec_augment_freq_width", None)
            if fw is None:
                # scale the mask budget to the feature axis: 15/128 mel
                # bins for power, 4/39 coefficients for mfcc (two
                # 15-wide masks would cover 77% of the mfcc axis)
                fw = 4 if flags.feature_type == "mfcc" else 15
            tf_frac = getattr(flags, "spec_augment_time_frac", 0.05)
            augment_fn = make_augment_fn(freq_width=fw, time_frac=tf_frac)
            print(
                f"SpecAugment on: 2 freq masks (width <= {fw}), "
                f"2 time masks (width <= {tf_frac:.2f} x valid frames)"
            )
        train_step = tstep.make_train_step_acc(
            self.model,
            tx,
            loss_fn=sp_loss_fn,
            accum_steps=self.grad_accum,
            augment_fn=augment_fn,
        )
        # multi-process: the fresh/restored state is process-local; jit over
        # a mesh spanning processes needs global arrays. Every process holds
        # identical values (same init seed / same checkpoint), so this is a
        # local replicated device_put. Summaries are written by process 0
        # only (one event file per run, like any multi-host trainer).
        import jax

        state = pmesh.replicate(state, self.mesh)
        if jax.process_index() == 0:
            writer = SummaryWriter(
                os.path.join(
                    flags.log_dir, f"{flags.run_name}_{flags.run_type}"
                )
            )
        else:
            from speecht_tpu.train.metrics_writer import NullSummaryWriter

            writer = NullSummaryWriter()

        # optional jax.profiler trace capture over a step interval
        # (--profile-steps start:stop; SURVEY.md §5 tracing subsystem)
        profile_range = None
        if getattr(flags, "profile_steps", None):
            lo, _, hi = flags.profile_steps.partition(":")
            profile_range = (int(lo), int(hi or int(lo) + 5))

        print("Begin training")
        self._latest_state = state
        self._stop_requested = False

        # Preemption/interrupt safety: SIGINT (ctrl-C) and SIGTERM (cloud
        # schedulers send it before evicting a worker) request a *deferred*
        # stop — the loop finishes the in-flight step and exits at a step
        # boundary. Raising immediately inside the handler could land while
        # the donated state is mid-dispatch, leaving _latest_state pointing
        # at a deleted buffer and losing the crash-save. A second signal
        # forces an immediate KeyboardInterrupt.
        import signal

        def _request_stop(_signum, _frame):
            if self._stop_requested:
                raise KeyboardInterrupt
            self._stop_requested = True
            print(
                "\nstop requested -- finishing the current step", flush=True
            )

        prev_handlers = []
        try:
            for sig in (signal.SIGINT, signal.SIGTERM):
                prev_handlers.append((sig, signal.signal(sig, _request_stop)))
        except ValueError:
            pass  # not the main thread (tests); default handling applies

        try:
            state = self._train_loop(
                state, train_step, writer, ckpt, profile_range
            )
        except KeyboardInterrupt:
            # crash-safe: persist progress before exiting (the reference's
            # recovery story is "rerun train, resume from latest checkpoint"
            # — SURVEY.md §5; an interrupt here loses nothing)
            print("\nInterrupted -- saving checkpoint before exit")
            self._stop_requested = True
            state = self._latest_state
        finally:
            for sig, handler in prev_handlers:
                signal.signal(sig, handler)
            interrupted = getattr(self, "_stop_requested", False)
            import sys as _sys

            crashing = _sys.exc_info()[0] is not None
            if (interrupted or crashing) and jax.process_count() > 1:
                # one evicted (or crashing) worker cannot crash-save a
                # distributed checkpoint alone: the orbax commit is a
                # cross-process barrier, and the signal/exception lands
                # at a different step on each worker, so a solo save
                # would deadlock against peers that are still training
                # (or already gone) — and on the exception path it would
                # hang this worker inside finally instead of letting the
                # error propagate. Recovery = relaunch the job; every
                # periodic checkpoint in the loop was written
                # cooperatively by all processes at the same step label,
                # so the pair restores from the last complete one
                # (drilled in tools/multiprocess_drill.py).
                print(
                    "distributed interrupt/crash: skipping solo "
                    f"crash-save; relaunch resumes from cooperative "
                    f"checkpoint step {ckpt.latest_step()}",
                    flush=True,
                )
            else:
                ckpt.save(
                    self._latest_state,
                    wait=True,
                    step=getattr(self, "_latest_global_step", None),
                )
            ckpt.close()
            writer.close()
        print("Done training -- step limit reached")
        return state

    def _train_loop(self, state, train_step, writer, ckpt, profile_range):
        import jax

        flags = self.flags
        previous_losses: list[float] = []
        spc = flags.steps_per_checkpoint
        profiling = False
        verbose = bool(getattr(flags, "verbose_summaries", False))
        # the global step is tracked host-side so the hot loop never reads
        # state.step back from the device (the device copy stays
        # authoritative for the optimizer-apply count). The loop counter
        # is in micro-batch units — the unit --max-steps, the printed
        # "global step" lines, and checkpoint labels share — so a resume
        # continues from the restored checkpoint's label (written in that
        # unit). Deriving it as applies * grad_accum would silently
        # mis-scale when this run's --grad-accum differs from the run
        # that wrote the checkpoint; the label is authoritative.
        global_step = ckpt.latest_step()
        if global_step is None:  # fresh run: no checkpoint yet
            global_step = int(state.step) * self.grad_accum
        self._latest_global_step = global_step
        # --profile-steps is RUN-relative (like --max-steps): a restored
        # run profiles steps counted from this launch, not from the
        # absolute global step, so "5:10" fires no matter where the
        # checkpoint left off
        start_step = global_step
        acc = pmesh.replicate(tstep.init_metrics_acc(), self.mesh)
        # gradient-accumulation carry (device-resident; zeros_like the
        # already-replicated params so multi-process shapes match). A
        # resume restarts any partial accumulation — the carry is not
        # checkpointed.
        gacc = (
            tstep.init_grad_accum(state.params)
            if self.grad_accum > 1
            else None
        )
        param_summarizer = tsummaries.make_param_summarizer(
            with_images=verbose
        )
        act_summarizer = (
            tsummaries.make_activation_summarizer(self.model)
            if verbose
            else None
        )
        window_start = time.time()
        stall_mark = (0, 0.0)  # (count, seconds) at the last interval

        with pmesh.use_mesh(self.mesh):
            loader = self.create_loader()
            for batch in loader:
                if (
                    profile_range
                    and not profiling
                    and global_step - start_step == profile_range[0]
                ):
                    try:
                        jax.profiler.start_trace(
                            os.path.join(flags.log_dir, "profile")
                        )
                        profiling = "trace"
                    except Exception as e:
                        # some backends (e.g. remote-tunneled chips) cannot
                        # host the profiler service; fall back to per-step
                        # wall-clock timing over the window
                        print(
                            "profiler trace unavailable on this backend "
                            f"({type(e).__name__}); recording wall-clock "
                            "step times instead"
                        )
                        profiling = "wallclock"
                        profile_times: list[float] = []
                if profiling == "wallclock":
                    import numpy as _np

                    _np.asarray(state.learning_rate)  # drain queued steps
                    t0 = time.time()

                # dispatch-only: no host<->device sync in the hot loop
                if gacc is None:
                    state, acc = train_step(state, acc, batch)
                else:
                    state, gacc, acc = train_step(state, gacc, acc, batch)
                self._latest_state = state
                global_step += 1
                self._latest_global_step = global_step

                if getattr(self, "_stop_requested", False):
                    # deferred SIGINT/SIGTERM: exit at a step boundary so
                    # the crash-save sees a live (non-donated) state
                    print(
                        "\nInterrupted -- saving checkpoint before exit",
                        flush=True,
                    )
                    return state

                if profiling == "wallclock":
                    import numpy as _np

                    _np.asarray(acc["count"])  # wait for this step
                    profile_times.append(time.time() - t0)
                if profiling and global_step - start_step >= profile_range[1]:
                    if profiling == "trace":
                        jax.profiler.stop_trace()
                        print(
                            f"Profiler trace written to {flags.log_dir}/profile"
                        )
                    else:
                        ms = [f"{1000 * t:.1f}" for t in profile_times]
                        print(
                            "profiled step wall-times (ms): " + " ".join(ms)
                        )
                    profiling = False
                if global_step % spc == 0:
                    # the one host readback per interval: running metrics
                    # (three scalars) + lr, then the device-reduced summaries
                    m = jax.device_get(acc)
                    acc = pmesh.replicate(
                        tstep.init_metrics_acc(), self.mesh
                    )
                    n = max(float(m["count"]), 1.0)
                    avg_loss = float(m["loss_sum"]) / n
                    # grad norms exist only at optimizer applies (fewer
                    # than micro-batches under --grad-accum)
                    avg_grad_norm = float(m["grad_norm_sum"]) / max(
                        float(m["updates"]), 1.0
                    )
                    lr = float(state.learning_rate)
                    step_time = (time.time() - window_start) / spc
                    # prints the interval-accumulated average loss
                    # (reference training.py:73-75 semantics)
                    print(
                        "global step {:d} learning rate {:.4f} step-time "
                        "{:.2f} average loss {:.2f} perplexity {:.2f}".format(
                            global_step,
                            lr,
                            step_time,
                            avg_loss,
                            perplexity(avg_loss),
                        ),
                        flush=True,
                    )
                    scalars = {
                        "loss": avg_loss,
                        "learning_rate": lr,
                        "grad_norm": avg_grad_norm,
                        "step_time": step_time,
                    }
                    # input-pipeline health: stalls are the consumer
                    # blocking on the prefetch queue this interval
                    if hasattr(loader, "stall_count"):
                        d_n = loader.stall_count - stall_mark[0]
                        d_s = loader.stall_seconds - stall_mark[1]
                        stall_mark = (
                            loader.stall_count, loader.stall_seconds
                        )
                        scalars["prefetch_stalls"] = float(d_n)
                        scalars["prefetch_stall_seconds"] = d_s
                        if d_n:
                            print(
                                f"prefetch stalled {d_n} times "
                                f"({d_s:.2f}s) this interval",
                                flush=True,
                            )
                    writer.add_scalars(global_step, scalars)
                    # per-layer parameter histograms (+ filter/bias images
                    # when verbose), reduced on device: ~20 KB fetched
                    # instead of the ~90 MB parameter tree
                    hists, images = jax.device_get(
                        param_summarizer(state.params)
                    )
                    writer.add_raw_histograms(global_step, hists)
                    if images:
                        writer.add_images(global_step, images)
                    if act_summarizer is not None:
                        ahists, aimages = jax.device_get(
                            act_summarizer(state.params, batch.features)
                        )
                        writer.add_raw_histograms(global_step, ahists)
                        writer.add_images(global_step, aimages)
                    writer.flush()

                    if should_decay_learning_rate(
                        previous_losses, avg_loss,
                        flags.learning_rate_decay_factor,
                    ):
                        state = tstep.decay_learning_rate(
                            state, flags.learning_rate_decay_factor
                        )
                    previous_losses.append(avg_loss)

                    ckpt.save(state, step=global_step)
                    print("Model saved", flush=True)
                    window_start = time.time()

        return state
