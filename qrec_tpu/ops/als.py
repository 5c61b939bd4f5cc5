"""Batched ALS / weighted-ridge solves on device.

Replaces the reference's per-row ``np.linalg.inv`` loops (WRMF.py:17-67) and
joblib process pools (ExpoMF.py:118-135) with vmapped Cholesky solves: one
``(B, d, d)`` normal-equation batch per chunk, built by an einsum that XLA
maps onto the MXU.

Both WRMF's confidence form and ExpoMF's exposure form reduce to the same
weighted ridge problem: solve ``(Yᵀ diag(w) Y + reg·I) x = Yᵀ (w ⊙ t)`` —
WRMF has w = 1 + 10r, t = 1_rated (WRMF.py:25-42); ExpoMF has w = exposure
posterior, t = 1_rated (ExpoMF.py:97-103).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def weighted_ridge_batch(
    y: jnp.ndarray,  # (N, d) fixed factor matrix
    w_batch: jnp.ndarray,  # (B, N) per-row weights
    t_batch: jnp.ndarray,  # (B, N) targets
    reg: float,
    extra_a: jnp.ndarray | None = None,  # (B, d, d) added to normal matrix
    extra_b: jnp.ndarray | None = None,  # (B, d) added to rhs
) -> jnp.ndarray:
    d = y.shape[1]
    a = jnp.einsum(
        "bn,nd,ne->bde", w_batch, y, y, preferred_element_type=jnp.float32
    ) + reg * jnp.eye(d)
    b = (w_batch * t_batch) @ y
    if extra_a is not None:
        a = a + extra_a
    if extra_b is not None:
        b = b + extra_b
    return jnp.linalg.solve(a, b[..., None])[..., 0]


@partial(jax.jit, static_argnames=("chunk", "reg"))
def solve_factors(
    y: jnp.ndarray,  # (N, d)
    weights: jnp.ndarray,  # (M, N)
    targets: jnp.ndarray,  # (M, N)
    reg: float,
    chunk: int = 256,
) -> jnp.ndarray:
    """Solve all M rows in chunks; returns (M, d)."""
    m = weights.shape[0]
    pad = (-m) % chunk
    w = jnp.concatenate([weights, jnp.ones((pad, weights.shape[1]))])
    t = jnp.concatenate([targets, jnp.zeros((pad, targets.shape[1]))])

    def one(args):
        wb, tb = args
        return weighted_ridge_batch(y, wb, tb, reg)

    out = jax.lax.map(
        one, (w.reshape(-1, chunk, w.shape[1]), t.reshape(-1, chunk, t.shape[1]))
    )
    return out.reshape(-1, y.shape[1])[:m]


def exposure_posterior(
    theta_batch: jnp.ndarray,  # (B, d)
    beta: jnp.ndarray,  # (I, d)
    rated: jnp.ndarray,  # (B, I) binary
    lam_y: float,
    mu: jnp.ndarray,  # (I,) or (B, I)
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Posterior of exposure latent variables A (ExpoMF.py:89-96)."""
    scores = theta_batch @ beta.T
    p_ex = jnp.sqrt(lam_y / (2 * jnp.pi)) * jnp.exp(-lam_y * scores**2 / 2)
    mu_b = mu if mu.ndim == 2 else mu[None, :]
    a = (p_ex + eps) / (p_ex + eps + (1 - mu_b) / jnp.maximum(mu_b, 1e-12))
    return jnp.where(rated > 0, 1.0, a)
