import jax.numpy as jnp
import numpy as np
import optax
import pytest

from image_classification_tpu.core.config import Config
from image_classification_tpu.train.train_state import create_train_state
from image_classification_tpu.utils import checkpoint as ckpt


@pytest.fixture
def state():
    params = {"dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros((4,))}}
    tx = optax.adamw(1e-3)
    return create_train_state({"params": params}, tx, use_ema=True)


def test_save_load_best(tmp_path, state):
    path = ckpt.save_best(str(tmp_path), 1, state.params, None, 0.87)
    template = {"params": state.params}
    tree, meta = ckpt.load_best(str(tmp_path), 1, template)
    np.testing.assert_array_equal(
        np.asarray(tree["params"]["dense"]["kernel"]), np.ones((4, 4))
    )
    assert meta["val_acc"] == pytest.approx(0.87)
    assert meta["fold"] == 1


def test_save_load_train_state_roundtrip(tmp_path, state):
    cfg = Config()
    state2 = state.replace(step=state.step + 5)
    host = {"best_val_acc": 0.77, "patience_counter": 2,
            "plateau": {"lr": 1e-5, "best": 0.77, "bad_epochs": 1}}
    ckpt.save_train_state(str(tmp_path), 2, state2, epoch=3, cfg=cfg,
                          host_state=host)
    restored = ckpt.load_train_state(str(tmp_path), 2, state)
    assert restored is not None
    rstate, next_epoch, rhost = restored
    assert next_epoch == 4
    assert int(rstate.step) == 5
    assert rhost == host
    np.testing.assert_array_equal(
        np.asarray(rstate.ema_params["dense"]["kernel"]),
        np.asarray(state.ema_params["dense"]["kernel"]),
    )


def test_save_tree_keeps_previous_on_crash(tmp_path, state, monkeypatch):
    """A crash mid-save must not destroy the last good checkpoint."""
    cfg = Config()
    ckpt.save_train_state(str(tmp_path), 1, state, epoch=0, cfg=cfg)

    # simulate dying inside the orbax write of the SECOND save
    real_save = ckpt._ckptr
    class Boom(RuntimeError):
        pass

    def exploding_ckptr():
        class C:
            def save(self, path, tree):
                raise Boom()
        return C()

    monkeypatch.setattr(ckpt, "_ckptr", exploding_ckptr)
    with pytest.raises(Boom):
        ckpt.save_train_state(str(tmp_path), 1, state, epoch=1, cfg=cfg)
    monkeypatch.setattr(ckpt, "_ckptr", real_save)

    restored = ckpt.load_train_state(str(tmp_path), 1, state)
    assert restored is not None
    _, next_epoch, _ = restored
    assert next_epoch == 1  # the epoch-0 checkpoint survived


def test_load_missing_returns_none(tmp_path, state):
    assert ckpt.load_train_state(str(tmp_path), 9, state) is None


def test_overwrite_best(tmp_path, state):
    ckpt.save_best(str(tmp_path), 1, state.params, None, 0.5)
    new_params = {"dense": {"kernel": jnp.full((4, 4), 2.0), "bias": jnp.ones((4,))}}
    ckpt.save_best(str(tmp_path), 1, new_params, None, 0.9)
    tree, meta = ckpt.load_best(str(tmp_path), 1, {"params": state.params})
    assert meta["val_acc"] == pytest.approx(0.9)
    np.testing.assert_array_equal(
        np.asarray(tree["params"]["dense"]["kernel"]), 2.0
    )


def test_select_best_fold(tmp_path, state):
    from image_classification_tpu.utils.checkpoint import select_best_fold

    ckpt.save_best(str(tmp_path), 1, state.params, None, 0.80)
    ckpt.save_best(str(tmp_path), 2, state.params, None, 0.91)
    ckpt.save_best(str(tmp_path), 3, state.params, None, 0.85)
    fold, acc = select_best_fold(str(tmp_path), [1, 2, 3])
    assert fold == 2 and acc == pytest.approx(0.91)


def test_async_writer_roundtrip(tmp_path, state):
    cfg = Config()
    writer = ckpt.AsyncCheckpointWriter()
    snap = ckpt.snapshot_device_tree(state)
    writer.submit(
        ckpt.save_train_state, str(tmp_path), 1, snap, 3, cfg,
        host_state={"best_val_acc": 0.5},
    )
    writer.join()
    restored, next_epoch, host = ckpt.load_train_state(str(tmp_path), 1, state)
    assert next_epoch == 4
    assert host["best_val_acc"] == pytest.approx(0.5)
    np.testing.assert_array_equal(
        np.asarray(restored.params["dense"]["kernel"]), np.ones((4, 4))
    )


def test_async_writer_serializes_and_raises(tmp_path):
    writer = ckpt.AsyncCheckpointWriter()
    order = []
    writer.submit(order.append, 1)
    writer.submit(order.append, 2)  # joins job 1 first
    writer.join()
    assert order == [1, 2]

    def boom():
        raise RuntimeError("disk full")

    writer.submit(boom)
    with pytest.raises(RuntimeError, match="disk full"):
        writer.join()
    writer.join()  # error is consumed; writer is reusable


def test_snapshot_survives_donation(state):
    """The snapshot must stay readable after the original buffers are
    donated (the reason snapshots exist)."""
    import jax

    snap = ckpt.snapshot_device_tree(state)

    @jax.jit
    def bump(p):
        return jax.tree.map(lambda a: a + 1, p)

    bumped = jax.jit(bump, donate_argnums=0)(state.params)
    del bumped
    np.testing.assert_array_equal(
        np.asarray(snap.params["dense"]["kernel"]), np.ones((4, 4))
    )
