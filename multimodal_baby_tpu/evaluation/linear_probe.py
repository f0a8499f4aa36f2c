"""Linear probing of the frozen vision backbone.

Capability parity with the reference probes (linear_decoding.py:1-279,
object_categories_linear_decoding.py:1-282 and their eval scripts), rebuilt
TPU-first: instead of re-running the frozen CNN for 100 epochs, backbone
features are extracted ONCE with a jitted batched pass, and the probe
(Linear 2048 -> n_classes, Adam lr 5e-4, CE loss — reference defaults,
linear_decoding.py:42,60-77) trains as a single ``lax.scan`` over minibatch
steps, entirely on-device. Subset sweeps (1.0 / 0.1 / 0.01) and the
forced-choice probe eval (target-class logit argmax over the 4 trial
images, eval_linear_decoding.py:82-101) are preserved.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax


def extract_features(model, variables, images_u8, batch_size: int = 256,
                     train: bool = False) -> np.ndarray:
    """Frozen-backbone pooled features [N, D] from uint8 images [N,H,W,3]."""
    from multimodal_baby_tpu.data.augment import normalize_image

    @jax.jit
    def feats(x):
        out = model.apply(variables, normalize_image(x),
                          method="encode_image", train=train)
        f = out[0]
        return f

    chunks = []
    n = images_u8.shape[0]
    for s in range(0, n, batch_size):
        chunks.append(np.asarray(feats(jnp.asarray(
            images_u8[s:s + batch_size]))))
    return np.concatenate(chunks, axis=0)


def extract_backbone_features(model, variables, images_u8,
                              batch_size: int = 256) -> np.ndarray:
    """Raw trunk features (pre projection head): the probe input the
    reference uses (2048-d pooled ResNeXt features,
    linear_decoding.py:60-77)."""
    from multimodal_baby_tpu.data.augment import normalize_image

    @jax.jit
    def feats(x):
        out = model.apply(
            variables, normalize_image(x), train=False,
            method=lambda m, img, train: m.vision_encoder.backbone(
                img, train=train)
            if not m.cfg.vision.vit_dino
            else {"pooled": m.vision_encoder.backbone(img)})
        return out["pooled"]

    chunks = []
    n = images_u8.shape[0]
    for s in range(0, n, batch_size):
        chunks.append(np.asarray(feats(jnp.asarray(
            images_u8[s:s + batch_size]))))
    return np.concatenate(chunks, axis=0)


def train_linear_probe(
    features: np.ndarray,       # [N, D]
    labels: np.ndarray,         # [N] int
    num_classes: int,
    lr: float = 5e-4,           # reference: linear_decoding.py:42
    epochs: int = 100,
    batch_size: int = 128,
    subset_fraction: float = 1.0,
    seed: int = 0,
) -> Tuple[Dict[str, np.ndarray], Dict[str, float]]:
    """Returns (probe params {"kernel","bias"}, final metrics)."""
    rng = np.random.RandomState(seed)
    n = features.shape[0]
    if subset_fraction < 1.0:
        keep = rng.choice(n, max(1, int(n * subset_fraction)),
                          replace=False)
        features, labels = features[keep], labels[keep]
        n = features.shape[0]

    d = features.shape[1]
    feats = jnp.asarray(features, jnp.float32)
    labs = jnp.asarray(labels, jnp.int32)

    batch_size = min(batch_size, n)
    steps_per_epoch = max(1, n // batch_size)
    total_steps = epochs * steps_per_epoch

    key = jax.random.PRNGKey(seed)
    k = 1.0 / np.sqrt(d)
    params = {
        "kernel": jax.random.uniform(key, (d, num_classes), jnp.float32,
                                     -k, k),
        "bias": jnp.zeros((num_classes,), jnp.float32),
    }
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def loss_fn(p, x, y):
        logits = x @ p["kernel"] + p["bias"]
        logp = jax.nn.log_softmax(logits)
        ce = -jnp.take_along_axis(logp, y[:, None], axis=1).mean()
        acc = (logits.argmax(-1) == y).mean()
        return ce, acc

    def step(carry, key):
        p, s = carry
        idx = jax.random.randint(key, (batch_size,), 0, n)
        (ce, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, feats[idx], labs[idx])
        updates, s = opt.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), (ce, acc)

    keys = jax.random.split(jax.random.fold_in(key, 1), total_steps)
    (params, _), (ces, accs) = jax.lax.scan(step, (params, opt_state), keys)

    final_ce, final_acc = loss_fn(params, feats, labs)
    metrics = {"train_ce": float(final_ce), "train_acc": float(final_acc),
               "n_train": int(n)}
    return jax.tree_util.tree_map(np.asarray, params), metrics


def half_split(labels: np.ndarray, split: str
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Per-class first/last-half train/test split (reference
    object_categories_linear_decoding.py:58-77): for every class, its
    examples in dataset order are halved; ``split="first"`` trains on the
    first half and tests on the second, ``split="last"`` the reverse.
    Returns (train_indices, test_indices)."""
    if split not in ("first", "last"):
        raise ValueError(f"split must be 'first' or 'last', got {split!r}")
    labels = np.asarray(labels)
    train_idx, test_idx = [], []
    for c in np.unique(labels):
        idx = np.flatnonzero(labels == c)
        cut = int(len(idx) * 0.5)
        first, last = idx[:cut], idx[cut:]
        if split == "first":
            train_idx.append(first)
            test_idx.append(last)
        else:
            train_idx.append(last)
            test_idx.append(first)
    return np.concatenate(train_idx), np.concatenate(test_idx)


def probe_accuracy(params, features: np.ndarray, labels: np.ndarray
                   ) -> float:
    logits = features @ params["kernel"] + params["bias"]
    return float((logits.argmax(-1) == labels).mean())


def probe_forced_choice(
    params,
    trial_features: np.ndarray,   # [N, K, D] target first
    target_class: np.ndarray,     # [N] class index of the target label
) -> Tuple[float, np.ndarray]:
    """Reference probe eval (eval_linear_decoding.py:82-101): for each trial
    take the target-class logit column over the K images; predict argmax;
    correct iff index 0."""
    logits = trial_features @ params["kernel"] + params["bias"]  # [N, K, C]
    target_logits = np.take_along_axis(
        logits, target_class[:, None, None], axis=2).squeeze(2)  # [N, K]
    preds = target_logits.argmax(-1)
    return float((preds == 0).mean()), preds
