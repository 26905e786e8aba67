"""Train state + optimizer assembly.

Capability parity with the reference training ops (reference:
speecht/speech_model.py:53-82): Adam(lr, epsilon=1e-3) with global-norm
gradient clipping at ``max_gradient_norm`` (default 5.0), a *mutable*
learning rate variable (the plateau decay op at training.py:82-84 multiplies
it in place), and a checkpointed global step.

TPU-first: the state is a flax struct pytree that flows through a jitted,
donated train step; the learning rate lives in the state (a traced scalar)
so decaying it never triggers recompilation.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array  # int32 scalar
    learning_rate: jax.Array  # f32 scalar, mutable via plateau decay


def make_optimizer(
    max_gradient_norm: float = 5.0,
    epsilon: float = 1e-3,
    b1: float = 0.9,
    b2: float = 0.999,
) -> optax.GradientTransformation:
    """clip-by-global-norm -> Adam moments (lr applied in the train step)."""
    return optax.chain(
        optax.clip_by_global_norm(max_gradient_norm),
        optax.scale_by_adam(b1=b1, b2=b2, eps=epsilon),
    )


def create_train_state(
    params, tx: optax.GradientTransformation, learning_rate: float
) -> TrainState:
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        learning_rate=jnp.asarray(learning_rate, jnp.float32),
    )
