"""Round-4 advisor-finding regression tests.

1. ``set_learning_rate`` must reach the injected LR inside
   ``optax.multi_transform``'s ``inner_states`` dict (plateau schedule +
   ``freeze_stages>0``, reference `V3.1/train_advanced_v3.2.py:399-403`
   freeze semantics combined with `previous/V1-effb0/train.py` plateau).
2. ``get_learning_rate`` reads the injected leaf back (used to reseed
   fold-parallel plateau schedulers on resume from pre-sidecar checkpoints).
3. ``progressive_scales`` must end at 1.0 so late train epochs match the
   eval resolution (reference `config.py:12`).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from image_classification_tpu.core.config import Config
from image_classification_tpu.train.optim import (
    build_optimizer,
    get_learning_rate,
    set_learning_rate,
)


def _tiny_params():
    return {
        "backbone": {
            "stem_conv": {"kernel": jnp.ones((2, 2))},
            "stage1_block0": {"kernel": jnp.ones((2, 2))},
        }
    }


@pytest.mark.parametrize("freeze_stages", [0, 1])
def test_plateau_lr_injection_reaches_frozen_chain(freeze_stages):
    cfg = Config(schedule="plateau", freeze_stages=freeze_stages, lr=1e-3)
    tx = build_optimizer(cfg, cfg.lr)
    params = _tiny_params()
    opt_state = tx.init(params)

    assert float(np.asarray(get_learning_rate(opt_state))) == pytest.approx(1e-3)

    new_state = set_learning_rate(opt_state, 1e-5)
    lr = get_learning_rate(new_state)
    assert lr is not None, "injected LR leaf not found after set_learning_rate"
    assert float(np.asarray(lr)) == pytest.approx(1e-5)

    # The rewritten LR must actually scale the update: frozen-or-not, the
    # trainable subtree's step size follows the injected value.
    import jax

    grads = jax.tree.map(jnp.ones_like, params)
    updates_hi, _ = tx.update(grads, opt_state, params)
    updates_lo, _ = tx.update(grads, new_state, params)
    leaf_hi = np.asarray(updates_hi["backbone"]["stage1_block0"]["kernel"])
    leaf_lo = np.asarray(updates_lo["backbone"]["stage1_block0"]["kernel"])
    if freeze_stages == 0:
        # stage1 is trainable in both cases
        assert np.max(np.abs(leaf_lo)) < np.max(np.abs(leaf_hi))
    else:
        # stage1 frozen -> zero updates; but stem... stem always frozen.
        assert np.allclose(
            np.asarray(updates_lo["backbone"]["stem_conv"]["kernel"]), 0.0
        )


def test_get_learning_rate_stacked_leaf():
    cfg = Config(schedule="plateau", freeze_stages=1, lr=1e-3)
    tx = build_optimizer(cfg, cfg.lr)
    import jax

    stacked = jax.vmap(tx.init)(
        jax.tree.map(lambda a: jnp.stack([a, a]), _tiny_params())
    )
    leaf = get_learning_rate(stacked)
    assert leaf is not None and np.asarray(leaf).shape == (2,)


def test_progressive_scales_must_end_full_size():
    with pytest.raises(ValueError, match="progressive_scales"):
        Config(
            progressive_resizing=True, progressive_scales=(0.5, 0.75)
        ).validate()
    with pytest.raises(ValueError, match="progressive_scales"):
        Config(progressive_resizing=True, progressive_scales=()).validate()
    Config(
        progressive_resizing=True, progressive_scales=(0.7, 0.85, 1.0)
    ).validate()
    # Disabled flag: no constraint.
    Config(progressive_resizing=False, progressive_scales=(0.5,)).validate()
