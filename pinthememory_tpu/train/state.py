"""Training state pytree.

The reference's mutable training state (module params, BN running stats, the
raw ``m_items`` tensor, torch-SGD momentum buffers, scheduler step) becomes
one explicit pytree carried through jitted steps, which is also exactly the
checkpoint payload (reference payload: utils/misc.py:206-216).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from pinthememory_tpu.core.config import Config
from pinthememory_tpu.train.optim import make_optimizer


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    m_items: jnp.ndarray | None
    opt_state: Any
    step: jnp.ndarray

    def variables(self) -> dict:
        return {"params": self.params, "batch_stats": self.batch_stats}


def create_train_state(cfg: Config, variables: dict, m_items) -> tuple[TrainState, optax.GradientTransformation]:
    tx = make_optimizer(cfg.optim)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        m_items=m_items,
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    return state, tx
