"""dp-shard_map'd Pallas warp == single-device kernel, bitwise.

Judges the round-3 weak item: the warp kernel used to demote to the XLA
form on *any* multi-device mesh (aug/pipeline.py), so the flagship
single-chip kernel path and the multi-chip path were different programs.
Now data-parallel-only meshes run the kernel per-shard under jax.shard_map
(ops/warp.py warp_pallas_sharded) — this test pins bitwise equality on a
virtual CPU mesh in interpreter mode, and the demotion policy matrix.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_classification_tpu.aug import geometry as geom
from image_classification_tpu.aug.pipeline import _warp_impl
from image_classification_tpu.core.config import Config
from image_classification_tpu.ops.warp import warp_pallas, warp_pallas_sharded
from image_classification_tpu.parallel.mesh import MeshSpec, build_mesh


def _inputs(rng, B=8, H=24, W=32, C=3, Ho=16, Wo=16):
    img = jnp.asarray(
        rng.uniform(0, 255, size=(B, H, W, C)).astype(np.float32)
    )
    coords = jnp.asarray(
        np.stack(
            [
                rng.uniform(-4, H + 4, size=(B, Ho, Wo)),
                rng.uniform(-4, W + 4, size=(B, Ho, Wo)),
            ],
            axis=-1,
        ).astype(np.float32)
    )
    return img, coords


def test_sharded_warp_bitwise_matches_single_device(rng, monkeypatch):
    monkeypatch.setenv("IC_TPU_WARP_INTERPRET", "1")
    mesh = build_mesh(MeshSpec(data=-1, model=1))  # 8-device dp mesh
    img, coords = _inputs(rng)
    single = np.asarray(warp_pallas(img, coords, interpret=True))
    sharded = np.asarray(warp_pallas_sharded(img, coords, mesh))
    np.testing.assert_array_equal(sharded, single)


def test_sharded_warp_through_sample_image(rng, monkeypatch):
    """The dispatch layer routes to the sharded kernel and stays bitwise
    with the direct kernel call."""
    monkeypatch.setenv("IC_TPU_WARP_INTERPRET", "1")
    mesh = build_mesh(MeshSpec(data=-1, model=1))
    img, coords = _inputs(rng)
    out = np.asarray(
        geom.sample_image(img, coords, impl="pallas", shard_mesh=mesh)
    )
    single = np.asarray(warp_pallas(img, coords, interpret=True))
    np.testing.assert_array_equal(out, single)


def test_sharded_warp_under_jit_with_sharded_batch(rng, monkeypatch):
    """Realistic setting: the kernel inside jit with the batch actually
    device-put sharded over the data axis."""
    monkeypatch.setenv("IC_TPU_WARP_INTERPRET", "1")
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = build_mesh(MeshSpec(data=-1, model=1))
    img, coords = _inputs(rng)
    sh = NamedSharding(mesh, P("data"))
    img_s = jax.device_put(img, sh)
    coords_s = jax.device_put(coords, sh)
    out = jax.jit(lambda i, c: warp_pallas_sharded(i, c, mesh))(img_s, coords_s)
    single = np.asarray(warp_pallas(img, coords, interpret=True))
    np.testing.assert_array_equal(np.asarray(out), single)


def test_warp_demotion_policy():
    """PARITY demotion matrix: dp-only meshes keep pallas (sharded); tp or
    fold meshes demote; no-mesh falls back to the config-resolved device
    count."""
    cfg = Config(warp_impl="pallas")
    dp = build_mesh(MeshSpec(data=-1, model=1))
    impl, m = _warp_impl(cfg, dp)
    assert impl == "pallas" and m is dp

    tp = build_mesh(MeshSpec(data=4, model=2))
    assert _warp_impl(cfg, tp) == ("xla", None)

    foldmesh = build_mesh(MeshSpec(fold=2, data=4, model=1))
    assert _warp_impl(cfg, foldmesh) == ("xla", None)

    one = build_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    assert _warp_impl(cfg, one) == ("pallas", None)

    assert _warp_impl(Config(warp_impl="xla"), dp) == ("xla", None)


def test_geometric_augment_sharded_matches_unsharded(rng, monkeypatch):
    """Full fused-geometry entry point: identical draws, bitwise-identical
    output with and without the dp shard_map (randomness lives outside the
    kernel, so sharding cannot change it)."""
    monkeypatch.setenv("IC_TPU_WARP_INTERPRET", "1")
    mesh = build_mesh(MeshSpec(data=-1, model=1))
    img = jnp.asarray(rng.uniform(0, 255, size=(8, 24, 32, 3)).astype(np.float32))
    key = jax.random.key(11)
    base = geom.GeometryCfg(warp_impl="pallas", shard_mesh=None)
    sharded_cfg = geom.GeometryCfg(warp_impl="pallas", shard_mesh=mesh)
    a = np.asarray(geom.geometric_augment(img, key, (16, 16), base))
    b = np.asarray(geom.geometric_augment(img, key, (16, 16), sharded_cfg))
    np.testing.assert_array_equal(a, b)
