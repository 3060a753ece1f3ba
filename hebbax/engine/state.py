"""Train state containers.

One pytree holds everything a jitted step mutates (params, batch_stats,
optimizer state, step counter) so steps are pure
``state, batch, key -> state, metrics`` functions with donated input
buffers — the TPU-native replacement for the reference's stateful
``model.train(); loss.backward(); optimizer.step()`` protocol.
"""

from typing import Any

import flax.struct


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: int = 0

    @property
    def variables(self):
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v


def init_state(model, tx, sample_batch, rngs, train_shape_check=True):
    """Initialize model variables + optimizer state from a sample batch."""
    variables = model.init(rngs, sample_batch, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    opt_state = tx.init(params)
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=opt_state, step=0)
