"""Functional train state.

Replaces the reference's Accelerate-wrapped mutable trainer state (reference:
`models/base/new_trainer.py:185-198`) with an explicit pytree: params,
optimizer state, step, and RNG key all live in one immutable structure that
flows through jitted `train_step(state, batch) -> (state, metrics)` functions
and is checkpointed wholesale by orbax (deterministic resume for free).
"""

from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    rng: jax.Array
    apply_fn: Callable = flax.struct.field(pytree_node=False)
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


def create_train_state(
    module,
    rng: jax.Array,
    example_inputs,
    tx: optax.GradientTransformation,
) -> TrainState:
    """Initialize params from example inputs and wrap with the optimizer."""
    init_rng, state_rng = jax.random.split(rng)
    if not isinstance(example_inputs, (tuple, list)):
        example_inputs = (example_inputs,)
    variables = module.init(init_rng, *example_inputs)
    params = variables["params"]
    return TrainState(
        step=jax.numpy.zeros((), jax.numpy.int32),
        params=params,
        opt_state=tx.init(params),
        rng=state_rng,
        apply_fn=module.apply,
        tx=tx,
    )
