"""Loss building blocks shared across the model zoo.

The reference hand-writes these per model (e.g. util/loss.py:3-6 bpr_loss,
SGL.py:192-217 InfoNCE); here they are pure jnp functions reused by every
trainer. All losses take an optional per-example ``weight`` so padded batch
tails contribute zero gradient.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def bpr_loss(
    pos_scores: jnp.ndarray,
    neg_scores: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """``-Σ log σ(s+ − s−)`` with the reference's 1e-7 stabilizer
    (util/loss.py:3-6)."""
    loss = -jnp.log(10e-8 + jax.nn.sigmoid(pos_scores - neg_scores))
    if weight is not None:
        loss = loss * weight
    return jnp.sum(loss)


def l2_reg(*tensors: jnp.ndarray) -> jnp.ndarray:
    """Sum of squared L2 norms (QRec uses plain ``||x||²`` reg terms)."""
    return sum(jnp.sum(t**2) for t in tensors)


def pointwise_ce(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Sigmoid cross-entropy for pointwise samplers (NeuMF-style)."""
    loss = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    if weight is not None:
        loss = loss * weight
    return jnp.sum(loss)


def unique_padded(ids: jnp.ndarray, fill: int = 0):
    """Static-shape ``tf.unique`` substitute: returns (unique_ids, mask)
    where duplicates/pad slots carry ``fill`` and mask=0. Used by the SSL
    models' per-batch dedup (SGL.py:196-200, SimGCL.py:61-64)."""
    size = ids.shape[0]
    uniq, counts = jnp.unique(
        ids, size=size, fill_value=fill, return_counts=True
    )
    mask = (counts > 0).astype(jnp.float32)
    return uniq, mask


def masked_infonce(
    view1: jnp.ndarray,  # (B, d)
    view2: jnp.ndarray,  # (B, d)
    mask: jnp.ndarray,  # (B,) 1=real row, 0=pad
    temperature: float,
) -> jnp.ndarray:
    """InfoNCE over L2-normalized aligned views where pad rows neither
    contribute positives nor appear as negatives."""
    # TF l2_normalize semantics: eps inside rsqrt → zero rows get zero
    # output and zero gradient (plain norm+eps division NaNs at zero rows)
    view1 = view1 * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(view1 * view1, axis=1, keepdims=True), 1e-12)
    )
    view2 = view2 * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(view2 * view2, axis=1, keepdims=True), 1e-12)
    )
    logits = (
        jnp.dot(view1, view2.T, preferred_element_type=jnp.float32)
        / temperature
    )
    # finite mask value: with -inf, pad rows produce 0·inf = NaN in the
    # *forward* value (gradients are clean either way)
    logits = jnp.where(mask[None, :] > 0, logits, -1e30)
    pos = jnp.diagonal(logits)
    lse = jax.nn.logsumexp(logits, axis=1)
    return jnp.sum(mask * (lse - pos))


# merged-batch row count at which the fused Pallas InfoNCE (forward AND
# recompute-backward in VMEM) is preferred over the XLA path on TPU under
# ssl.backend=auto. Measured on one v5e (d=64, fwd+bwd per step, scan-
# amortized): 512 rows 1.10x, 1024 rows 1.08x, 2048 rows 1.39x, 4096 rows
# 2.61x — the B×B HBM logits traffic the kernel avoids grows quadratically.
# Below ~2k rows the win is <0.05 ms/step and the extra Mosaic compile
# (~30-60 s through the remote-compile tunnel) dominates typical runs.
SSL_PALLAS_MIN_ROWS = 2048


def resolve_ssl_backend(config, batch_rows: int, mesh=None):
    """Resolve ``ssl.backend=auto|xla|pallas`` to (backend, interpret).

    auto → the fused kernel on TPU for large contrastive batches; an
    explicit ``pallas`` is honored everywhere (interpret mode off-TPU,
    mirroring graph.backend semantics). Under an active mesh the fused
    kernel runs row-sharded over the 'data' axis
    (pallas_kernels.sharded_infonce_loss) — pass the mesh through to
    :func:`infonce_dispatch`."""
    import jax

    backend = config.get("ssl.backend", "auto") if config is not None else "auto"
    on_tpu = jax.default_backend() == "tpu"
    if backend == "pallas":
        return "pallas", not on_tpu
    if backend == "auto" and on_tpu and batch_rows >= SSL_PALLAS_MIN_ROWS:
        return "pallas", False
    if backend not in ("auto", "xla"):
        from ..errors import ConfigError

        raise ConfigError(
            f"unknown ssl.backend {backend!r} (expected auto|xla|pallas)"
        )
    return "xla", False


def infonce_dispatch(
    view1: jnp.ndarray,
    view2: jnp.ndarray,
    mask: jnp.ndarray,
    temperature: float,
    backend: str = "xla",
    interpret: bool = False,
    mesh=None,
) -> jnp.ndarray:
    """``masked_infonce`` through the selected backend. The Pallas kernel
    needs the row count padded to its tile; pad rows carry mask=0 so they
    contribute neither positives nor negatives. With an active ``mesh`` the
    fused kernel runs row-sharded over the mesh's 'data' axis."""
    if backend == "pallas":
        from .pallas_kernels import ROW_TILE, infonce_loss, sharded_infonce_loss

        b, d = view1.shape
        if mesh is not None:
            # per-shard rows must be ≤ ROW_TILE or a multiple of it
            dp = mesh.shape[mesh.axis_names[0]]
            local = -(-b // dp)
            if local > ROW_TILE:
                local = -(-local // ROW_TILE) * ROW_TILE
            bp = local * dp
        else:
            bp = b if b <= ROW_TILE else -(-b // ROW_TILE) * ROW_TILE
        if bp != b:
            pad = bp - b
            view1 = jnp.concatenate([view1, jnp.zeros((pad, d), view1.dtype)])
            view2 = jnp.concatenate([view2, jnp.zeros((pad, d), view2.dtype)])
            mask = jnp.concatenate([mask, jnp.zeros((pad,), mask.dtype)])
        if mesh is not None:
            return sharded_infonce_loss(
                mesh, view1, view2, mask, temperature, interpret
            )
        return infonce_loss(view1, view2, mask, temperature, interpret)
    return masked_infonce(view1, view2, mask, temperature)


def infonce(
    view1: jnp.ndarray,  # (B, d)
    view2: jnp.ndarray,  # (B, d)
    temperature: float,
    normalize: bool = True,
) -> jnp.ndarray:
    """InfoNCE over aligned views: positives on the diagonal of the B×B
    similarity matrix, all other rows of view2 as negatives (SGL.py:192-217,
    SimGCL.py:60-90 semantics)."""
    if normalize:
        view1 = view1 / (jnp.linalg.norm(view1, axis=1, keepdims=True) + 1e-12)
        view2 = view2 / (jnp.linalg.norm(view2, axis=1, keepdims=True) + 1e-12)
    logits = jnp.dot(view1, view2.T, preferred_element_type=jnp.float32)
    logits = logits / temperature
    pos = jnp.diagonal(logits)
    lse = jax.nn.logsumexp(logits, axis=1)
    return jnp.sum(lse - pos)
