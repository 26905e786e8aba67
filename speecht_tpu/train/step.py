"""Jitted train / eval / decode steps.

The TPU-native equivalent of the reference's polymorphic ``SpeechModel.step``
(reference speecht/speech_model.py:197-235), which assembled a dynamic TF
fetch list (loss / update / decode / labels / summary). Under XLA each
combination is its own compiled program, so this module exposes one jitted
function per workload instead:

- :func:`make_train_step`  — forward + CTC loss + clipped Adam update
  (reference speech_model.py:65-82 semantics), donated state.
- :func:`make_eval_step`   — loss + greedy decode, no update
  (evaluation.py:130-137's fetch combination).
- :func:`make_forward_step`— logits only (record/export path).

All steps are mesh-polymorphic: the same compiled code runs on 1 device or a
('data','model') mesh — batches arrive sharded on ``data``, parameter and
activation shardings propagate from the constraints in the model.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from speecht_tpu.models.wav2letter import Wav2Letter, output_length
from speecht_tpu.ops import ctc_pallas, decode
from speecht_tpu.train.state import TrainState


def make_loss_fn(model: Wav2Letter, logits_fn: Callable | None = None) -> Callable:
    """(params, batch) -> (avg CTC loss, logits).

    ``logits_fn`` overrides the dense forward (e.g. the time-sharded
    forward from parallel/seq_parallel.py) while keeping the masking
    semantics — padded and CTC-infeasible rows excluded — in one place.
    """
    if logits_fn is None:
        def logits_fn(params, batch):
            return model.apply({"params": params}, batch.features)

    def loss_fn(params, batch):
        logits = logits_fn(params, batch)
        logit_lengths = output_length(batch.seq_lengths)
        # padded rows (seq_length 0) contribute loss 0; the loss dispatches
        # to the Pallas alpha-beta kernels on TPU, the XLA scan elsewhere
        losses = ctc_pallas.ctc_loss(
            logits, logit_lengths, batch.labels, batch.label_lengths
        )
        real = (batch.seq_lengths > 0).astype(jnp.float32)
        # CTC-infeasible rows (label longer than the frames can emit) carry
        # a sentinel ~1e30 loss and meaningless gradients — exclude them
        # (the reference lets TF's inf loss poison the batch instead)
        feasible = (losses < 1e29).astype(jnp.float32)
        real = real * feasible
        avg_loss = jnp.sum(losses * real) / jnp.maximum(jnp.sum(real), 1.0)
        return avg_loss, logits

    return loss_fn


def _make_grad_fn(model: Wav2Letter, loss_fn=None):
    loss_fn = loss_fn or make_loss_fn(model)

    def grad_fn(params, batch):
        (avg_loss, _logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch)
        return grads, avg_loss

    return grad_fn


def _apply_grads(state: TrainState, grads, tx: optax.GradientTransformation):
    """clip -> Adam -> lr-scaled update on a (possibly accumulated) grad."""
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    # learning rate multiplies *after* clip+Adam so plateau decay
    # (reference training.py:82-84) needs no optimizer rebuild
    updates = jax.tree_util.tree_map(
        lambda u: -state.learning_rate * u, updates
    )
    params = optax.apply_updates(state.params, updates)
    new_state = TrainState(
        params=params,
        opt_state=opt_state,
        step=state.step + 1,
        learning_rate=state.learning_rate,
    )
    return new_state, optax.global_norm(grads)


def _make_update_fn(
    model: Wav2Letter, tx: optax.GradientTransformation, loss_fn=None
):
    grad_fn = _make_grad_fn(model, loss_fn)

    def update(state: TrainState, batch):
        grads, avg_loss = grad_fn(state.params, batch)
        new_state, grad_norm = _apply_grads(state, grads, tx)
        return new_state, avg_loss, grad_norm

    return update


def make_train_step(
    model: Wav2Letter, tx: optax.GradientTransformation
) -> Callable:
    """Returns jitted (state, batch) -> (state, metrics). State is donated."""
    update = _make_update_fn(model, tx)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch):
        new_state, avg_loss, grad_norm = update(state, batch)
        metrics = {
            "loss": avg_loss,
            "grad_norm": grad_norm,
            "learning_rate": state.learning_rate,
        }
        return new_state, metrics

    return train_step


def init_metrics_acc():
    """Device-resident running metrics for the accumulating train step.

    ``count`` counts micro-batches; ``updates`` counts optimizer applies
    (equal unless gradient accumulation is on — grad norms average over
    ``updates``, losses over ``count``).
    """
    return {
        "loss_sum": jnp.zeros((), jnp.float32),
        "grad_norm_sum": jnp.zeros((), jnp.float32),
        "count": jnp.zeros((), jnp.float32),
        "updates": jnp.zeros((), jnp.float32),
    }


def init_grad_accum(params):
    """Zeroed gradient-accumulation carry for ``accum_steps > 1``."""
    return {
        "gsum": jax.tree_util.tree_map(jnp.zeros_like, params),
        "k": jnp.zeros((), jnp.int32),
    }


def make_train_step_acc(
    model: Wav2Letter,
    tx: optax.GradientTransformation,
    loss_fn=None,
    accum_steps: int = 1,
    augment_fn=None,
) -> Callable:
    """Accumulating train step: (state, acc, batch) -> (state, acc).

    With ``accum_steps`` G > 1 the signature becomes
    ``(state, gacc, acc, batch) -> (state, gacc, acc)`` where ``gacc`` is
    :func:`init_grad_accum`'s carry: each micro-batch's gradients fold into
    ``gsum`` and the clip->Adam->lr update applies once per G
    micro-batches on the G-averaged gradient — numerically the big-batch
    update (the clip threshold sees the averaged gradient, exactly as a
    single batch of G x B rows would) while HBM only ever holds one
    micro-batch's activations. Still ONE compiled program: the apply is
    a ``lax.cond`` on the carry counter, so the hot loop stays
    dispatch-only. A checkpoint restore restarts any partial
    accumulation (the carry is not persisted).

    ``augment_fn`` (ops/augment.py ``make_augment_fn``) transforms each
    batch inside the compiled step, keyed on the device-resident
    optimizer step and micro-batch counter — training-time SpecAugment
    with zero host cost; eval paths never see it.

    Loss and grad-norm fold into a donated device-resident accumulator
    (:func:`init_metrics_acc`) instead of being returned per step, so the
    training loop never reads a scalar back from the device between
    checkpoints — the hot loop stays dispatch-only, matching the reference's
    single ``sess.run`` with in-graph dequeue (reference training.py:57-90),
    which also never syncs more than it must. ``loss_fn`` overrides the
    dense CTC loss (e.g. the sequence-parallel loss from
    parallel/seq_parallel.py for ``train --seq-parallel``). The host fetches the
    accumulator once per ``steps_per_checkpoint``.
    """
    if accum_steps <= 1:
        update = _make_update_fn(model, tx, loss_fn)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def train_step(state: TrainState, acc, batch):
            if augment_fn is not None:
                batch = augment_fn(batch, state.step, acc["count"])
            new_state, avg_loss, grad_norm = update(state, batch)
            acc = {
                "loss_sum": acc["loss_sum"] + avg_loss,
                "grad_norm_sum": acc["grad_norm_sum"] + grad_norm,
                "count": acc["count"] + 1.0,
                "updates": acc["updates"] + 1.0,
            }
            return new_state, acc

        return train_step

    grad_fn = _make_grad_fn(model, loss_fn)
    g = float(accum_steps)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step_accum(state: TrainState, gacc, acc, batch):
        if augment_fn is not None:
            batch = augment_fn(batch, state.step, acc["count"])
        grads, avg_loss = grad_fn(state.params, batch)
        gsum = jax.tree_util.tree_map(
            lambda a, b: a + b, gacc["gsum"], grads
        )
        k = gacc["k"] + 1

        def apply(op):
            st, gs = op
            gavg = jax.tree_util.tree_map(lambda x: x / g, gs)
            new_state, grad_norm = _apply_grads(st, gavg, tx)
            return (
                new_state,
                jax.tree_util.tree_map(jnp.zeros_like, gs),
                jnp.zeros((), jnp.int32),
                grad_norm,
                jnp.float32(1.0),
            )

        def skip(op):
            st, gs = op
            return st, gs, k, jnp.float32(0.0), jnp.float32(0.0)

        state, gsum, k, grad_norm, applied = jax.lax.cond(
            k >= accum_steps, apply, skip, (state, gsum)
        )
        acc = {
            "loss_sum": acc["loss_sum"] + avg_loss,
            "grad_norm_sum": acc["grad_norm_sum"] + grad_norm,
            "count": acc["count"] + 1.0,
            "updates": acc["updates"] + applied,
        }
        return state, {"gsum": gsum, "k": k}, acc

    return train_step_accum


def make_eval_step(model: Wav2Letter) -> Callable:
    """Returns jitted (params, batch) -> (loss, decoded, decoded_lengths)."""
    loss_fn = make_loss_fn(model)

    @jax.jit
    def eval_step(params, batch):
        avg_loss, logits = loss_fn(params, batch)
        logit_lengths = output_length(batch.seq_lengths)
        decoded, dec_lengths, _scores = decode.greedy_decode(
            logits, logit_lengths
        )
        return avg_loss, decoded, dec_lengths

    return eval_step


def make_forward_step(model: Wav2Letter) -> Callable:
    """Returns jitted (params, features) -> logits [B, T//2, C]."""

    @jax.jit
    def forward(params, features):
        return model.apply({"params": params}, features)

    return forward


@jax.jit
def _decay(state: TrainState, factor) -> TrainState:
    return state.replace(learning_rate=state.learning_rate * factor)


def decay_learning_rate(state: TrainState, factor: float) -> TrainState:
    """Plateau decay: lr <- lr * factor (reference speech_model.py:65-66).

    Jitted so it also works on multi-process global state, where eager ops
    on non-fully-addressable arrays are rejected.
    """
    return _decay(state, jnp.float32(factor))
