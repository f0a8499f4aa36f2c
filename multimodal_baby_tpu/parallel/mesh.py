"""Device mesh and sharding helpers.

The framework scales with a 2D ``jax.sharding.Mesh``:

- ``data`` axis: batch sharding; gradients are reduced with an XLA ``psum``
  over ICI (inserted automatically by the partitioner under jit).
- ``model`` axis: tensor parallelism for the vocab-sharded embedding/LM head
  and feature-sharded projections. The reference model is small (512-dim) so
  TP is off by default, but the axis exists so the same code scales.

No reference counterpart: the reference trains single-GPU with no distributed
backend (SURVEY.md section 2.4); this module is the TPU-native replacement for
"what DDP would have been".
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodal_baby_tpu.core.constants import DATA_AXIS, MODEL_AXIS


def create_mesh(
    mesh_shape: Tuple[int, int] = (-1, 1),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    ``-1`` in either coordinate means "all remaining devices". On real
    multi-chip hardware, ``jax.devices()`` ordering already follows the
    physical torus so adjacent mesh coordinates ride ICI links.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    n = devices.size
    d, m = mesh_shape
    if d == -1 and m == -1:
        raise ValueError("at most one mesh axis may be -1")
    if d == -1:
        d = n // m
    if m == -1:
        m = n // d
    if d * m != n:
        raise ValueError(f"mesh shape {(d, m)} does not cover {n} devices")
    return Mesh(devices.reshape(d, m), (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays: leading dim over the data axis, rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_spec() -> P:
    return P(DATA_AXIS)


def shard_batch(mesh: Mesh, batch, pad_to: Optional[int] = None):
    """Device-put a host batch, sharded along the leading axis.

    Ragged tail batches (leading dim not divisible by the data-axis size)
    are padded with wrap-around rows up to ``pad_to`` (typically the
    loader's batch size, so the tail step reuses the steady-state
    executable) or the next data-axis multiple, and a boolean ``valid``
    row mask is added; the loss/metric path masks the padding out exactly
    (models.losses.contrastive_loss_from_logits), so the tail batch runs
    at full per-device throughput instead of replicated at 1/N.
    """
    d = mesh.shape[DATA_AXIS]
    leaves = jax.tree_util.tree_leaves(batch)
    n = leaves[0].shape[0] if leaves else 0
    if n % d != 0:
        target = pad_to if pad_to and pad_to >= n and pad_to % d == 0 \
            else -(-n // d) * d
        idx = np.concatenate([np.arange(n), np.arange(target - n) % n])
        if isinstance(batch, dict):
            batch = {k: np.asarray(v)[idx] for k, v in batch.items()}
            batch["valid"] = np.arange(target) < n
        else:
            batch = jax.tree_util.tree_map(
                lambda x: np.asarray(x)[idx], batch)
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def param_pspec(path: Tuple[str, ...], leaf) -> P:
    """Partition spec for a parameter leaf.

    Default is fully replicated. Vocab-sharded layers (token embedding and the
    tied LM output head) split the vocab dim across the model axis when it is
    larger than 1 — the one genuinely TP-profitable layer at CVCL scale since
    vocab (2350) >> embedding_dim (512).
    """
    names = [str(p) for p in path]
    if any("token_embedding" in n for n in names) and getattr(leaf, "ndim", 0) == 2:
        return P(MODEL_AXIS, None)
    return P()


def make_param_shardings(mesh: Mesh, params):
    """NamedShardings for a param pytree (replicated unless vocab-sharded)."""
    if mesh.shape[MODEL_AXIS] == 1:
        rep = NamedSharding(mesh, P())
        return jax.tree_util.tree_map(lambda _: rep, params)

    def spec_for(path, leaf):
        return NamedSharding(mesh, param_pspec(tuple(str(k) for k in path), leaf))

    return jax.tree_util.tree_map_with_path(spec_for, params)
