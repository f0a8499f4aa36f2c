"""Fused Pallas trunk under a multi-device data mesh.

A Pallas call is an opaque custom call XLA cannot partition, so on a
multi-chip mesh the fused trunk shard_maps its pure kernel chain over the
data axis (models/vision_resnext._fused_stages phase 2). Here the whole
ResNeXt50 runs on a 4-device CPU mesh (interpret-mode kernels) with a
sharded batch and must match the unsharded conv path.
"""

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from multimodal_baby_tpu.models.vision_resnext import ResNeXt50  # noqa: E402
from multimodal_baby_tpu.parallel import create_mesh  # noqa: E402


@pytest.mark.parametrize("int8", [False, True, "mixed"])
def test_fused_trunk_under_data_mesh(monkeypatch, int8):
    rng = np.random.RandomState(0)
    B = 64 if int8 is False else 128  # 32 (int8) / 16 (bf16) rows/shard
    imgs = jnp.asarray(rng.randn(B, 64, 64, 3), jnp.float32)

    ref_mod = ResNeXt50(dtype=None, dense_groups=False, fused_trunk=False)
    variables = ref_mod.init(jax.random.PRNGKey(0), imgs[:16], train=False)
    params, stats = variables["params"], variables["batch_stats"]
    want = ref_mod.apply({"params": params, "batch_stats": stats},
                         imgs, train=False)["pooled"]

    monkeypatch.setenv("MMB_FUSED_TRUNK", "1")
    extra = {}
    if int8:
        from multimodal_baby_tpu.models.quant_calib import (
            calibrate_backbone)
        # "mixed" = the bench-default plan (bf16 layers 1-2 + int8
        # layers 3-4): exercises the amax_chain threading through bf16
        # blocks to the bf16 -> int8 stage boundary under shard_map
        monkeypatch.setenv("MMB_TRUNK_INT8",
                           "0,0,1,1" if int8 == "mixed" else "1")
        extra["quant_scales"] = calibrate_backbone(params, stats, imgs[:32])
    else:
        monkeypatch.setenv("MMB_TRUNK_INT8", "0")

    mesh = create_mesh((4, 1), devices=jax.devices()[:4])
    fused_mod = ResNeXt50(dtype=jnp.bfloat16,
                          trunk_int8=(False, False, True, True)
                          if int8 == "mixed" else bool(int8))
    x_sharded = jax.device_put(
        imgs.astype(jnp.bfloat16),
        NamedSharding(mesh, P("data", None, None, None)))

    with mesh:
        @jax.jit
        def run(x):
            return fused_mod.apply(
                {"params": params, "batch_stats": stats, **extra},
                x, train=False)["pooled"]

        got = np.asarray(run(x_sharded), np.float32)

    a = np.asarray(want)
    cos = (a * got).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(got, axis=-1) + 1e-9)
    # bf16 kernels vs f32 conv: cosine ~1; int8 additionally quantized
    assert cos.min() > (0.99 if int8 else 0.999), cos.min()
