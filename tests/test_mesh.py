import jax
import numpy as np
import pytest

from image_classification_tpu.parallel import (
    DATA_AXIS,
    MODEL_AXIS,
    MeshSpec,
    batch_sharding,
    build_mesh,
    shard_batch,
)


def test_mesh_all_data():
    mesh = build_mesh(MeshSpec(data=-1, model=1))
    assert mesh.shape[DATA_AXIS] == 8
    assert mesh.shape[MODEL_AXIS] == 1


def test_mesh_dp_tp():
    mesh = build_mesh(MeshSpec(data=4, model=2))
    assert mesh.shape[DATA_AXIS] == 4
    assert mesh.shape[MODEL_AXIS] == 2


def test_mesh_bad_shape():
    with pytest.raises(ValueError):
        build_mesh(MeshSpec(data=3, model=2))


def test_shard_batch_places_data(eight_device_mesh):
    x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    gx = shard_batch(eight_device_mesh, x)
    assert gx.sharding == batch_sharding(eight_device_mesh)
    np.testing.assert_array_equal(np.asarray(gx), x)
    # each device holds 2 rows
    shard_shapes = {s.data.shape for s in gx.addressable_shards}
    assert shard_shapes == {(2, 4)}


def test_jit_reduces_over_mesh(eight_device_mesh):
    x = np.ones((16, 4), dtype=np.float32)
    gx = shard_batch(eight_device_mesh, x)
    total = jax.jit(lambda a: a.sum())(gx)
    assert float(total) == 64.0


def test_metrics():
    import jax.numpy as jnp

    from image_classification_tpu.utils import (
        accuracy_top1,
        confusion_matrix,
        macro_f1,
        per_class_f1,
    )

    logits = jnp.array([[2.0, 0.0], [0.0, 3.0], [1.0, 0.0], [0.0, 1.0]])
    labels = jnp.array([0, 1, 1, 1])
    assert float(accuracy_top1(logits, labels)) == 0.75
    cm = confusion_matrix(jnp.argmax(logits, -1), labels, 2)
    np.testing.assert_array_equal(np.asarray(cm), [[1, 0], [1, 2]])
    f1 = per_class_f1(cm)
    # class0: tp=1 fp=1 fn=0 -> f1=2/3 ; class1: tp=2 fp=0 fn=1 -> 0.8
    np.testing.assert_allclose(np.asarray(f1), [2 / 3, 0.8], rtol=1e-6)
    np.testing.assert_allclose(float(macro_f1(cm)), (2 / 3 + 0.8) / 2, rtol=1e-6)
