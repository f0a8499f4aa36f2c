"""Fused InfoNCE (fwd+bwd+metrics) vs XLA at contrastive batch sizes."""
import time
import numpy as np, jax, jax.numpy as jnp
from multimodal_baby_tpu.models.losses import contrastive_loss_from_logits
from multimodal_baby_tpu.ops.infonce import fused_infonce_with_metrics

E = 512

def timed(run, *args, inner=10, iters=3):
    out = run(*args); jax.block_until_ready(out); _ = float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(*args)
    _ = float(out)
    return (time.perf_counter() - t0) / (iters * inner) * 1e3

for B in (256, 512, 1024):
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(B, E).astype(np.float32))
    txt = jnp.asarray(rng.randn(B, E).astype(np.float32))
    nlt = jnp.asarray(np.float32(2.659))  # -log(0.07)

    def xla_fn(img, txt):
        logits = jnp.exp(nlt) * (img @ txt.T)
        loss, m = contrastive_loss_from_logits(logits, logits.T)
        return loss + 0.0 * (m["image_accuracy"] + m["image_entropy"]
                             + m["text_accuracy"] + m["text_entropy"])

    def fused_fn(img, txt):
        loss, m = fused_infonce_with_metrics(img, txt, nlt)
        return loss + 0.0 * (m["image_accuracy"] + m["image_entropy"]
                             + m["text_accuracy"] + m["text_entropy"])

    def bench(fn):
        grad = jax.grad(lambda i, t: fn(i, t), argnums=(0, 1))
        @jax.jit
        def run(img, txt):
            def body(c, _):
                gi, gt = grad(img + c, txt)
                s = jnp.float32(gi.sum() + gt.sum())
                return s * 0.0, s
            _, outs = jax.lax.scan(body, jnp.float32(0), None, length=10)
            return outs.sum()
        return timed(run, img, txt)

    tx = bench(xla_fn)
    tf = bench(fused_fn)
    print(f"B={B:5d}: xla {tx:6.3f} ms  fused {tf:6.3f} ms", flush=True)
