"""TrainState: the complete, functional training state.

Replaces the reference's scattered mutable objects (model, optimizer,
GradScaler, EMA shadow dict, scheduler counter — `train_advanced_v4.py:
422-432`) with one immutable pytree: params (f32), optimizer state, EMA
params (`EMA`, `train_advanced_v4.py:62-94`), BatchNorm statistics
(EfficientNet), SWA accumulators (`previous/V3-efb2/...:445-507`), and the
step counter. Checkpointing the whole thing gives true resume — which the
reference sketched but never wired (`V3.1/utils.py:63-93`, no call site).

No GradScaler exists: bf16 compute with f32 params/optimizer does not need
loss scaling on TPU.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray                    # optimizer steps completed
    params: Any
    opt_state: Any
    ema_params: Any                      # None when EMA off
    batch_stats: Any                     # None for BN-free models
    swa_params: Any                      # running SWA average (None when off)
    swa_count: jnp.ndarray               # number of SWA snapshots averaged

    def eval_params(self, use_ema: bool = True):
        """Parameters to validate/checkpoint with: EMA shadow when enabled
        (reference validates under `ema.apply_shadow`,
        `train_advanced_v4.py:449-453`)."""
        if use_ema and self.ema_params is not None:
            return self.ema_params
        return self.params


def create_train_state(
    variables: dict,
    tx: optax.GradientTransformation,
    use_ema: bool = True,
    use_swa: bool = False,
) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if use_ema else None,
        batch_stats=variables.get("batch_stats"),
        swa_params=jax.tree.map(jnp.zeros_like, params) if use_swa else None,
        swa_count=jnp.zeros((), jnp.int32),
    )


def ema_update(ema_params: Any, params: Any, decay: float) -> Any:
    """shadow = (1-d)*param + d*shadow (`train_advanced_v4.py:75-80`)."""
    return jax.tree.map(
        lambda s, p: decay * s + (1.0 - decay) * p, ema_params, params
    )


def swa_update(state: TrainState) -> TrainState:
    """Incorporate current params into the SWA running average
    (torch AveragedModel semantics: arithmetic mean over snapshots)."""
    n = state.swa_count
    new_swa = jax.tree.map(
        lambda a, p: (a * n + p) / (n + 1), state.swa_params, state.params
    )
    return state.replace(swa_params=new_swa, swa_count=n + 1)
