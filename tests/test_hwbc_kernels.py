"""Batch-in-sublanes fused bottleneck kernels vs the XLA oracle.

Runs in interpreter mode on the CPU mesh (conftest forces platform=cpu);
the same kernels compile for TPU on the bench path. Small shapes keep the
interpreter fast; f32 inputs with tolerances sized for the kernels'
f32-accumulation order differences.

Reference workload anchor: the frozen CNN forward of
multimodal/multimodal.py:88-104.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodal_baby_tpu.ops.bottleneck_hwbc import pack_grouped_kernel
from multimodal_baby_tpu.ops.bottleneck_hwbc import (
    from_hwbc, fused_bottleneck_hwbc, fused_stage_banded, fused_stage_hwbc,
    hwbc_reference, stage_reference, to_hwbc)

RTOL = 5e-5


def mk_fw(rng, cin, width, cout, has_ds):
    cg = width // 32
    fw = {
        "w1": jnp.asarray(rng.randn(cin, width).astype(np.float32) * .05),
        "b1": jnp.asarray(rng.randn(width).astype(np.float32) * .1),
        "w2": pack_grouped_kernel(jnp.asarray(
            rng.randn(3, 3, cg, width).astype(np.float32) * .05), 32),
        "b2": jnp.asarray(rng.randn(width).astype(np.float32) * .1),
        "w3": jnp.asarray(rng.randn(width, cout).astype(np.float32) * .05),
        "b3": jnp.asarray(rng.randn(cout).astype(np.float32) * .1),
    }
    if has_ds:
        fw["wd"] = jnp.asarray(
            rng.randn(cin, cout).astype(np.float32) * .05)
        fw["bd"] = jnp.asarray(rng.randn(cout).astype(np.float32) * .1)
    return fw


def rel_err(got, want):
    return float(jnp.max(jnp.abs(got - want))) / float(
        jnp.max(jnp.abs(want)))


def test_layout_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(32, 6, 6, 8).astype(np.float32))
    assert jnp.array_equal(from_hwbc(to_hwbc(x)), x)


@pytest.mark.parametrize("stride,has_ds,H,cin,width,cout,hh,R", [
    (1, False, 8, 256, 128, 256, 4, 2),   # multi-band, no downsample
    (1, True, 8, 64, 128, 256, 8, 4),     # single band, ds
    (2, True, 8, 256, 256, 512, 4, 2),    # stride-2, nb=2
    (2, True, 16, 64, 128, 256, 4, 2),    # stride-2 multi-band
])
def test_fused_block(stride, has_ds, H, cin, width, cout, hh, R):
    rng = np.random.RandomState(1)
    fw = mk_fw(rng, cin, width, cout, has_ds)
    x = to_hwbc(jnp.asarray(rng.randn(32, H, H, cin).astype(np.float32)))
    got = fused_bottleneck_hwbc(x, fw, stride=stride, Bc=16, hh=hh, R=R)
    want = hwbc_reference(x, fw, stride=stride)
    assert got.shape == want.shape
    assert rel_err(got, want) < RTOL


def test_fused_block_tiles_mode():
    """XLA-fed tile execution matches the grid kernel's oracle."""
    from multimodal_baby_tpu.ops.bottleneck_hwbc import (
        fused_bottleneck_tiles)
    rng = np.random.RandomState(7)
    fw = mk_fw(rng, 128, 256, 512, True)
    x = to_hwbc(jnp.asarray(rng.randn(32, 16, 16, 128).astype(np.float32)))
    got = fused_bottleneck_tiles(x, fw, stride=2, Bc=16, hh=2, R=2)
    assert rel_err(got, hwbc_reference(x, fw, stride=2)) < RTOL


def test_fused_block_conv3_accum():
    rng = np.random.RandomState(2)
    fw = mk_fw(rng, 128, 256, 256, True)
    x = to_hwbc(jnp.asarray(rng.randn(32, 8, 8, 128).astype(np.float32)))
    got = fused_bottleneck_hwbc(x, fw, stride=1, Bc=16, hh=4, R=2,
                                conv3_mode="accum")
    assert rel_err(got, hwbc_reference(x, fw, stride=1)) < RTOL


@pytest.mark.parametrize("H,cin,strides", [
    (12, 256, [2, 1, 1]),   # stride-2 head + chain (layer3/4 shape)
    (8, 128, [1, 1]),       # stride-1 head with downsample
])
def test_fused_stage_full(H, cin, strides):
    rng = np.random.RandomState(3)
    fws = []
    c = cin
    for i, s in enumerate(strides):
        fws.append(mk_fw(rng, c, 128, 256, i == 0))
        c = 256
    x = to_hwbc(jnp.asarray(rng.randn(32, H, H, cin).astype(np.float32)))
    got = fused_stage_hwbc(x, fws, strides, Bc=16)
    assert rel_err(got, stage_reference(x, fws, strides)) < RTOL


@pytest.mark.parametrize("H,cin,strides,hh,R", [
    (16, 64, [1, 1, 1], 4, 4),    # banded layer1 shape, 4 bands
    (16, 128, [2, 1, 1], 4, 4),   # banded with stride-2 head (layer2)
    (16, 64, [1, 1, 1], 16, 8),   # ONE band = whole stage, no recompute
    (16, 128, [2, 1, 1], 8, 8),   # one band, stride-2 head
])
def test_fused_stage_banded(H, cin, strides, hh, R):
    rng = np.random.RandomState(4)
    fws = []
    c = cin
    for i, s in enumerate(strides):
        fws.append(mk_fw(rng, c, 128, 256, i == 0))
        c = 256
    x = to_hwbc(jnp.asarray(rng.randn(32, H, H, cin).astype(np.float32)))
    got = fused_stage_banded(x, fws, strides, Bc=16, hh=hh, R=R)
    assert rel_err(got, stage_reference(x, fws, strides)) < RTOL


@pytest.mark.parametrize("plan", [
    # one-band tails on every stage (zero halo recompute), incl. the
    # default-N spelling and a non-tiling N that exercises the
    # fused_stage_hwbc fallback (16 % 5 != 0)
    "splitband16,splitband8,splitband4,splitband2",
    "splitband5,splitband,blocks,splitband2",
])
def test_fused_trunk_splitband_plans(monkeypatch, plan):
    """splitbandN (head block alone + banded tail) matches the conv path
    through the full trunk, including the non-tiling-N fallback."""
    from multimodal_baby_tpu.models.vision_resnext import ResNeXt50
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(16, 64, 64, 3).astype(np.float32))
    m = ResNeXt50(dtype=jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), x)

    monkeypatch.setenv("MMB_FUSED_TRUNK", "0")
    ref = m.apply(v, x, train=False)
    monkeypatch.setenv("MMB_FUSED_TRUNK", "1")
    monkeypatch.setenv("MMB_TRUNK_PLAN", plan)
    got = m.apply(v, x, train=False)
    for k in ("pooled", "feature_map"):
        a = np.asarray(ref[k], np.float32)
        b = np.asarray(got[k], np.float32)
        assert a.shape == b.shape
        denom = max(np.abs(a).max(), 1e-6)
        assert np.abs(a - b).max() / denom < 0.05  # bf16 noise


def test_fused_trunk_matches_conv_path(monkeypatch):
    """ResNeXt50's fused path (forced via MMB_FUSED_TRUNK=1, interpreter
    mode on CPU) matches the flax conv path on a tiny input."""
    from multimodal_baby_tpu.models.vision_resnext import ResNeXt50
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(16, 64, 64, 3).astype(np.float32))
    m = ResNeXt50(dtype=jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), x)

    monkeypatch.setenv("MMB_FUSED_TRUNK", "0")
    ref = m.apply(v, x, train=False)
    monkeypatch.setenv("MMB_FUSED_TRUNK", "1")
    got = m.apply(v, x, train=False)
    for k in ("pooled", "feature_map"):
        a = np.asarray(ref[k], np.float32)
        b = np.asarray(got[k], np.float32)
        assert a.shape == b.shape
        denom = max(np.abs(a).max(), 1e-6)
        assert np.abs(a - b).max() / denom < 0.05  # bf16 noise


def test_to_hwbc_rt_variant_matches(monkeypatch):
    """MMB_TO_HWBC=rt (reshape-first formulation) is the same layout
    pack as the default transpose->reshape->transpose form, bit for
    bit, for both bf16 (bsub=16) and int8 (bsub=32) sublane counts."""
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(64, 8, 8, 128).astype(np.float32))
    for bsub in (16, 32):
        want = to_hwbc(x, bsub)
        monkeypatch.setenv("MMB_TO_HWBC", "rt")
        got = to_hwbc(x, bsub)
        monkeypatch.delenv("MMB_TO_HWBC")
        assert got.shape == want.shape
        assert jnp.array_equal(got, want)
    # round-trip through the inverse on the bf16 sublane count
    monkeypatch.setenv("MMB_TO_HWBC", "rt")
    assert jnp.array_equal(from_hwbc(to_hwbc(x)), x)
    monkeypatch.delenv("MMB_TO_HWBC")
