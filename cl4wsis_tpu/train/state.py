"""Train state pytree shared by all phases."""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    # auxiliary trainable modules (phase 1): pseudolabeler/peakgenerator
    aux_params: Any = None
    aux_batch_stats: Any = None

    def apply_gradients(self, tx: optax.GradientTransformation, grads: Any
                        ) -> "TrainState":
        updates, new_opt = tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)
