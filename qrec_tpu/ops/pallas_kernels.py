"""Pallas TPU kernels for the hot evaluation/loss paths.

* ``masked_catalog_scores`` — fused U_block @ Vᵀ catalog scoring with
  rated-item masking done from the packed uint32 bitmask inside the kernel:
  the (B, I) score block is produced in item tiles on the MXU and masked in
  VMEM via a repeat+shift bit-expansion, so neither a dense (B, I) bool mask
  nor a padded rated-id table ever touches HBM. Replaces the
  gather/scatter masking step of the XLA ranking path (ops/topk.py).

* ``infonce_loss`` — fused InfoNCE: row-normalization, B×B similarity
  logits, temperature, and masked logsumexp-minus-positive reduction in one
  kernel; logits tiles live only in VMEM (the XLA path materializes the
  full B×B logits in HBM). Drop-in for ops/losses.masked_infonce.

* ``weighted_segment_matmul`` — the scatter half of COO SpMM as one-hot
  matmuls on the MXU: edges are pre-partitioned by row block (host, once
  per graph — ops/spmm.PaddedCOO), the kernel builds the (RB, E_t)
  weighted selection matrix in VMEM per tile and accumulates
  ``S @ gathered`` into the revisited output row block. Measured on one
  v5e at yelp2018 scale (854k directed edges): XLA's sorted
  ``segment_sum`` runs at ~33 GB/s effective; this kernel streams the
  gathered values at near memcpy rate.

All have XLA fallbacks and run under ``interpret=True`` on CPU for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITEM_TILE = 4096  # 128 mask words per tile (Mosaic minor-dim alignment)
ROW_TILE = 256


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# masked catalog scorer
# ---------------------------------------------------------------------------


def _score_kernel(u_ref, v_ref, mask_ref, out_ref, *, mask_value):
    # u: (B, d) f32 — full block; v: (T, d) item tile; mask: FULL (B, I//32)
    # (Mosaic requires minor block dims ∈ {multiple of 128, full array}; the
    # packed mask is small, so the whole array rides in VMEM and the tile's
    # words are dynamic-sliced out.)
    j = pl.program_id(0)
    scores = jax.lax.dot_general(
        u_ref[:],
        v_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, T)
    t = scores.shape[1]
    wpt = t // 32  # 128 words — keeps the slice offset 128-aligned
    words = mask_ref[:, pl.ds(pl.multiple_of(j * wpt, 128), wpt)]
    # Bit expansion without reshapes (Mosaic can't relayout (B,W,32)→(B,T)):
    # broadcast each word to its 32 columns with a one-hot selection matmul
    # on the MXU, exactly in f32 via 16-bit halves, then extract the bit by
    # power-of-two division.
    w_idx = jax.lax.broadcasted_iota(jnp.int32, (wpt, t), 0)
    c_word = jax.lax.broadcasted_iota(jnp.int32, (wpt, t), 1) >> 5
    sel = (w_idx == c_word).astype(jnp.float32)  # (wpt, T)
    # Mosaic can't cast uint32→f32: bitcast to int32 and use logical shifts
    words_i = pltpu.bitcast(words, jnp.int32)
    lo = (words_i & 0xFFFF).astype(jnp.float32)  # (B, wpt), < 2^16 exact
    hi = jax.lax.shift_right_logical(words_i, 16).astype(jnp.float32)
    # HIGHEST precision is load-bearing: these matmuls carry exact integers
    # up to 65535 (16 mantissa bits); the TPU's default bf16-multiply pass
    # (8 mantissa bits) silently destroys the low bits of each half, i.e.
    # drops rated-item mask bits 0-7 and 16-23
    rep_lo = jax.lax.dot_general(
        lo, sel, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    rep_hi = jax.lax.dot_general(
        hi, sel, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    cbit = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) & 31
    use_hi = cbit >= 16
    # exact 2^-s via the f32 exponent field (exp2 is an approximate
    # transcendental on the VPU and misses the exact power of two)
    inv = jax.lax.bitcast_convert_type(
        ((127 - (cbit & 15)) << 23), jnp.float32
    )
    val = jnp.where(use_hi, rep_hi, rep_lo) * inv
    vf = jnp.floor(val)
    bits = vf - 2.0 * jnp.floor(vf * 0.5)  # vf mod 2
    out_ref[:] = jnp.where(bits > 0.5, mask_value, scores)


@functools.partial(
    jax.jit, static_argnames=("mask_value", "interpret")
)
def masked_catalog_scores(
    u_block: jnp.ndarray,  # (B, d) f32
    items: jnp.ndarray,  # (I, d) f32 — I must be a multiple of ITEM_TILE
    bitmask: jnp.ndarray,  # (B, I//32) uint32
    mask_value: float = 0.0,
    interpret: bool = False,
) -> jnp.ndarray:
    b, d = u_block.shape
    i = items.shape[0]
    assert i % ITEM_TILE == 0, "pad the catalog to ITEM_TILE"
    assert bitmask.shape == (b, i // 32)
    grid = (i // ITEM_TILE,)
    return pl.pallas_call(
        functools.partial(_score_kernel, mask_value=mask_value),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (ITEM_TILE, d), lambda j: (j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (b, i // 32), lambda j: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (b, ITEM_TILE), lambda j: (0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, i), jnp.float32),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(u_block, items, bitmask)


def masked_catalog_scores_xla(u_block, items, bitmask, mask_value=0.0):
    """Reference/fallback implementation with identical semantics."""
    scores = jnp.dot(u_block, items.T, preferred_element_type=jnp.float32)
    i = items.shape[0]
    words = jnp.repeat(bitmask, 32, axis=1)[:, :i]
    shifts = (jnp.arange(i, dtype=jnp.uint32) & 31)[None, :]
    bits = (words >> shifts) & 1
    return jnp.where(bits > 0, mask_value, scores)


# ---------------------------------------------------------------------------
# fused InfoNCE
# ---------------------------------------------------------------------------


def _infonce_kernel(
    off_ref, v1_ref, v2_ref, cmask_ref, rmask_ref, out_ref, *, temperature
):
    # off: (1,1) SMEM global row offset of this v1 block (0 single-device;
    # shard_offset when the batch rows are sharded over a mesh axis).
    # cmask masks the full-batch COLUMNS (denominator); rmask the local ROWS.
    j = pl.program_id(0)
    v1 = v1_ref[:]  # (Rt, d) — row block, already normalized by caller
    v2 = v2_ref[:]  # (B, d)
    cmask = cmask_ref[:]  # (1, B)
    logits = (
        jax.lax.dot_general(
            v1, v2,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        / temperature
    )  # (Rt, B)
    neg_inf = jnp.float32(-1e30)
    logits = jnp.where(cmask > 0, logits, neg_inf)
    row_max = jnp.max(logits, axis=1, keepdims=True)
    lse = jnp.log(
        jnp.sum(jnp.exp(logits - row_max), axis=1, keepdims=True)
    ) + row_max  # (Rt, 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    rt = v1.shape[0]
    diag = rows + off_ref[0, 0] + j * rt == cols
    pos = jnp.sum(jnp.where(diag, logits, 0.0), axis=1, keepdims=True)
    row_mask = rmask_ref[:, pl.ds(pl.multiple_of(j * rt, rt), rt)]
    partial_sum = jnp.sum(row_mask.reshape(-1, 1) * (lse - pos))

    @pl.when(j == 0)
    def _():
        out_ref[0, 0] = 0.0

    out_ref[0, 0] += partial_sum


def _l2n(x):
    """Zero-row-safe L2 normalization — rsqrt(max(Σx², eps)) so zero rows
    give zero output and a FINITE gradient (the repo-wide SSL invariant;
    plain norm+eps division NaNs in the backward at zero rows)."""
    return x * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(x * x, axis=1, keepdims=True), 1e-12)
    )


def _l2n_bwd(x, g):
    """VJP of ``_l2n`` at ``x`` applied to cotangent ``g``."""
    s = jnp.sum(x * x, axis=1, keepdims=True)
    inv = jax.lax.rsqrt(jnp.maximum(s, 1e-12))
    gx = g * inv
    corr = x * jnp.sum(g * x, axis=1, keepdims=True) * inv**3
    return jnp.where(s > 1e-12, gx - corr, gx)


def _infonce_fwd_pallas(off, v1, v2, cmask, rmask, temperature, interpret):
    """Forward kernel call over a (possibly sharded-local) row block ``v1``
    against the full batch ``v2``. ``off`` is the (1,1) global row offset."""
    b_loc, d = v1.shape
    b = v2.shape[0]
    row_tile = min(ROW_TILE, b_loc)
    out = pl.pallas_call(
        functools.partial(_infonce_kernel, temperature=temperature),
        grid=(b_loc // row_tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((row_tile, d), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_loc), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=interpret,
    )(off, v1, v2, cmask, rmask)
    return out[0, 0]


def _infonce_fwd_call(v1, v2, mask2d, temperature, interpret):
    off = jnp.zeros((1, 1), jnp.int32)
    return _infonce_fwd_pallas(off, v1, v2, mask2d, mask2d, temperature, interpret)


def _infonce_bwd_kernel(
    off_ref, v1_ref, v2_ref, cmask_ref, rmask_ref, dv1_ref, dv2_ref, *, temperature
):
    """Fused backward: recompute the logits tile + row softmax in VMEM and
    emit both cotangents — dlogits never touches HBM (the XLA backward
    materializes the full B×B probability matrix)."""
    j = pl.program_id(0)
    v1 = v1_ref[:]  # (Rt, d) normalized row tile
    v2 = v2_ref[:]  # (B, d) normalized
    cmask = cmask_ref[:]  # (1, B)
    logits = (
        jax.lax.dot_general(
            v1, v2,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        / temperature
    )  # (Rt, B)
    neg_inf = jnp.float32(-1e30)
    logits = jnp.where(cmask > 0, logits, neg_inf)
    row_max = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - row_max)
    p = e / jnp.sum(e, axis=1, keepdims=True)  # (Rt, B)
    rt = v1.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, p.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
    diag = (rows + off_ref[0, 0] + j * rt == cols).astype(jnp.float32)
    row_mask = rmask_ref[:, pl.ds(pl.multiple_of(j * rt, rt), rt)]
    dlog = row_mask.reshape(-1, 1) * (p - diag) / temperature  # (Rt, B)
    dv1_ref[:] = jax.lax.dot_general(
        dlog, v2,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == 0)
    def _():
        dv2_ref[:] = jnp.zeros_like(dv2_ref)

    dv2_ref[:] += jax.lax.dot_general(
        dlog, v1,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _infonce_bwd_pallas(off, v1, v2, cmask, rmask, temperature, interpret):
    b_loc, d = v1.shape
    b = v2.shape[0]
    row_tile = min(ROW_TILE, b_loc)
    return pl.pallas_call(
        functools.partial(_infonce_bwd_kernel, temperature=temperature),
        grid=(b_loc // row_tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((row_tile, d), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_loc), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((row_tile, d), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_loc, d), jnp.float32),
            jax.ShapeDtypeStruct((b, d), jnp.float32),
        ],
        interpret=interpret,
    )(off, v1, v2, cmask, rmask)


def _infonce_bwd_call(v1, v2, mask2d, temperature, interpret):
    off = jnp.zeros((1, 1), jnp.int32)
    return _infonce_bwd_pallas(off, v1, v2, mask2d, mask2d, temperature, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def infonce_loss(
    view1: jnp.ndarray,  # (B, d)
    view2: jnp.ndarray,  # (B, d)
    mask: jnp.ndarray,  # (B,) 1=real row
    temperature: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Masked InfoNCE with L2 normalization, fused logits+logsumexp forward
    and a fused recompute backward (flash-attention-style): the (B, B)
    logits/probability matrices live only in VMEM tiles, never in HBM.
    Drop-in for ops/losses.masked_infonce (same zero-row-safe
    normalization); B must be a multiple of ROW_TILE (or <= ROW_TILE) —
    ops/losses.infonce_dispatch pads."""
    b, d = view1.shape
    assert b % ROW_TILE == 0 or b <= ROW_TILE, "pad batch to ROW_TILE"
    v1 = _l2n(view1)
    v2 = _l2n(view2)
    mask2d = mask.reshape(1, b).astype(jnp.float32)
    return _infonce_fwd_call(v1, v2, mask2d, temperature, interpret)


def _infonce_vjp_fwd(view1, view2, mask, temperature, interpret):
    b = view1.shape[0]
    v1 = _l2n(view1)
    v2 = _l2n(view2)
    mask2d = mask.reshape(1, b).astype(jnp.float32)
    loss = _infonce_fwd_call(v1, v2, mask2d, temperature, interpret)
    return loss, (view1, view2, v1, v2, mask2d)


def _infonce_vjp_bwd(temperature, interpret, res, g):
    view1, view2, v1, v2, mask2d = res
    dv1n, dv2n = _infonce_bwd_call(v1, v2, mask2d, temperature, interpret)
    dview1 = _l2n_bwd(view1, g * dv1n)
    dview2 = _l2n_bwd(view2, g * dv2n)
    return dview1, dview2, None


infonce_loss.defvjp(_infonce_vjp_fwd, _infonce_vjp_bwd)


# ---------------------------------------------------------------------------
# mesh-sharded fused InfoNCE
# ---------------------------------------------------------------------------


def _sharded_infonce_fwd_call(mesh, v1, v2, mask2d, temperature, interpret):
    """Batch rows sharded over the mesh's first ('data') axis; each device
    runs the fused kernel for its row block against the full (replicated)
    column batch, then the partial losses psum over 'data'. Model-axis
    replicas compute identical values, so the scalar is mesh-invariant."""
    from jax.sharding import PartitionSpec as P

    data_axis = mesh.axis_names[0]
    dp = mesh.shape[data_axis]
    b = v1.shape[0]
    local_b = b // dp

    def body(v1_loc, v2_full, cmask, rmask_loc):
        off = (jax.lax.axis_index(data_axis) * local_b).astype(jnp.int32)
        out = _infonce_fwd_pallas(
            off.reshape(1, 1), v1_loc, v2_full, cmask, rmask_loc,
            temperature, interpret,
        )
        return jax.lax.psum(out, data_axis)

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(data_axis, None),
            P(None, None),  # full column batch: GSPMD all-gathers
            P(None, None),
            P(None, data_axis),
        ),
        out_specs=P(),
        check_vma=False,
    )(v1, v2, mask2d, mask2d)


def _sharded_infonce_bwd_call(mesh, v1, v2, mask2d, temperature, interpret):
    from jax.sharding import PartitionSpec as P

    data_axis = mesh.axis_names[0]
    dp = mesh.shape[data_axis]
    b = v1.shape[0]
    local_b = b // dp

    def body(v1_loc, v2_full, cmask, rmask_loc):
        off = (jax.lax.axis_index(data_axis) * local_b).astype(jnp.int32)
        dv1_loc, dv2_part = _infonce_bwd_pallas(
            off.reshape(1, 1), v1_loc, v2_full, cmask, rmask_loc,
            temperature, interpret,
        )
        # each shard contributes its row block's pull on EVERY column row
        return dv1_loc, jax.lax.psum(dv2_part, data_axis)

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(data_axis, None),
            P(None, None),
            P(None, None),
            P(None, data_axis),
        ),
        out_specs=(P(data_axis, None), P(None, None)),
        check_vma=False,
    )(v1, v2, mask2d, mask2d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 4, 5))
def sharded_infonce_loss(
    mesh,
    view1: jnp.ndarray,  # (B, d) — B divisible by the mesh's data axis
    view2: jnp.ndarray,
    mask: jnp.ndarray,  # (B,) 1=real row
    temperature: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Mesh-partitioned :func:`infonce_loss`: same semantics, batch rows
    sharded over the 'data' axis so the fused logits/softmax tiles stay in
    each device's VMEM. Per-shard row count must be ≤ ROW_TILE or a multiple
    of it — ops/losses.infonce_dispatch pads accordingly."""
    b = view1.shape[0]
    v1 = _l2n(view1)
    v2 = _l2n(view2)
    mask2d = mask.reshape(1, b).astype(jnp.float32)
    return _sharded_infonce_fwd_call(mesh, v1, v2, mask2d, temperature, interpret)


def _sharded_vjp_fwd(mesh, view1, view2, mask, temperature, interpret):
    b = view1.shape[0]
    v1 = _l2n(view1)
    v2 = _l2n(view2)
    mask2d = mask.reshape(1, b).astype(jnp.float32)
    loss = _sharded_infonce_fwd_call(mesh, v1, v2, mask2d, temperature, interpret)
    return loss, (view1, view2, v1, v2, mask2d)


def _sharded_vjp_bwd(mesh, temperature, interpret, res, g):
    view1, view2, v1, v2, mask2d = res
    dv1n, dv2n = _sharded_infonce_bwd_call(
        mesh, v1, v2, mask2d, temperature, interpret
    )
    dview1 = _l2n_bwd(view1, g * dv1n)
    dview2 = _l2n_bwd(view2, g * dv2n)
    return dview1, dview2, None


sharded_infonce_loss.defvjp(_sharded_vjp_fwd, _sharded_vjp_bwd)


# ---------------------------------------------------------------------------
# weighted sorted-segment-sum via one-hot MXU matmul (COO SpMM scatter half)
# ---------------------------------------------------------------------------


def _segmm_kernel(block_id_ref, is_first_ref, g_ref, vals_ref, rl_ref, out_ref):
    t = pl.program_id(0)

    @pl.when(is_first_ref[t] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    rb = out_ref.shape[0]
    et = g_ref.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (rb, et), 0)
    # weighted one-hot selection: S[r, e] = vals[e] if rows_local[e] == r
    sel = jnp.where(rl_ref[:] == iota, vals_ref[:], 0.0).astype(jnp.bfloat16)
    out_ref[:] += jax.lax.dot_general(
        sel,
        g_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("row_block", "num_blocks", "interpret"))
def weighted_segment_matmul(
    gathered: jnp.ndarray,  # (E_pad, d) bf16/f32 — x[cols_padded]
    vals: jnp.ndarray,  # (1, E_pad) f32, 0 on padding
    rows_local: jnp.ndarray,  # (1, E_pad) int32 in [0, row_block)
    block_ids: jnp.ndarray,  # (T,) int32 non-decreasing output block per tile
    is_first: jnp.ndarray,  # (T,) int32 — 1 on the first tile of each block
    row_block: int,
    num_blocks: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Sorted segment-sum of ``vals * gathered`` rows into
    ``num_blocks * row_block`` output rows. Edge tiles must be grouped by
    output block (ops/spmm.PaddedCOO layout). Accumulates in f32; the
    selection matmul runs in bf16 — same precision class as the DenseJoint
    backend's bf16 adjacency."""
    e_pad, d = gathered.shape
    t = block_ids.shape[0]
    assert e_pad % t == 0
    et = e_pad // t
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((et, d), lambda i, b, f: (i, 0)),
            pl.BlockSpec((1, et), lambda i, b, f: (0, i)),
            pl.BlockSpec((1, et), lambda i, b, f: (0, i)),
        ],
        out_specs=pl.BlockSpec((row_block, d), lambda i, b, f: (b[i], 0)),
    )
    return pl.pallas_call(
        _segmm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_blocks * row_block, d), jnp.float32),
        interpret=interpret,
    )(block_ids, is_first, gathered, vals, rows_local)


def weighted_segment_matmul_xla(
    gathered, vals, rows_local, block_ids, is_first, row_block, num_blocks
):
    """Reference/fallback implementation with identical semantics."""
    e_pad, d = gathered.shape
    t = block_ids.shape[0]
    et = e_pad // t
    rows = (
        jnp.repeat(block_ids, et) * row_block + rows_local.reshape(-1)
    ).astype(jnp.int32)
    g = gathered.astype(jnp.float32) * vals.reshape(-1, 1)
    return jax.ops.segment_sum(g, rows, num_segments=num_blocks * row_block)


# ---------------------------------------------------------------------------
# bipartite dual-product: {A @ xi, Aᵀ @ xu} in ONE pass over A
# ---------------------------------------------------------------------------

# measured on one v5e (lastfm shape, d=50, chained fwd+bwd per application,
# scripts/dual_tile_sweep.py, round 3): (512,1024) 1.56 ms, (1024,2048)
# 0.98 ms, (512,4096) 1.72 ms, (2048,4096) fails Mosaic's store-alignment
# check — larger tiles amortize the per-tile grid/accumulate overhead until
# the A tile (8 MB double-buffered at 1024×2048) crowds VMEM
DUAL_U_TILE = 1024
DUAL_I_TILE = 2048


def _dual_kernel(a_ref, xu_ref, xi_ref, ou_ref, oi_ref):
    """Grid step (u, i): stream one A tile, update both partial products.

    The joint LightGCN propagation ``[[0,A],[Aᵀ,0]] @ [xu; xi]`` reads the
    (U, I) adjacency twice per application on the two-matmul XLA path (once
    as A, once as Aᵀ) — and the adjacency is the dominant HBM traffic of the
    whole training step (67 MB bf16 at lastfm scale vs <4 MB of activations).
    Computing both products from the same streamed tile halves adjacency
    traffic per application; with the symmetric-VJP backward (ops/spmm) the
    full fwd+bwd step does 4 single-pass applications instead of 8 reads.
    """
    u = pl.program_id(0)
    i = pl.program_id(1)
    a = a_ref[...]  # (UT, IT) bf16 — or int8 (quantized adjacency), in
    # which case the dequant-to-bf16 runs in VMEM and the tile streams from
    # HBM at HALF the bf16 bytes (quarter of the two-matmul XLA path)
    if a.dtype == jnp.int8:
        a = a.astype(jnp.bfloat16)
    ut, it = a.shape
    xu_t = xu_ref[pl.ds(pl.multiple_of(u * ut, ut), ut), :]  # (UT, d)
    xi_t = xi_ref[pl.ds(pl.multiple_of(i * it, it), it), :]  # (IT, d)
    # BOTH products in transposed (d, N) layout so the MXU output lanes are
    # the full UT/IT tile dims instead of d (d=50 would cap lane utilization
    # at 39%); contracting dim 0 of both operands only relayouts the small
    # x tiles, never the streamed (UT, IT) A tile. The caller transposes the
    # two small (d, N) f32 results back once per application.
    pu = jax.lax.dot_general(
        xi_t, a,
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (d, UT) = (A_tile @ xi_t)ᵀ
    pi = jax.lax.dot_general(
        xu_t, a,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (d, IT) = xu_tᵀ @ A_tile

    @pl.when(i == 0)
    def _():
        ou_ref[:, pl.ds(pl.multiple_of(u * ut, ut), ut)] = pu

    @pl.when(i != 0)
    def _():
        ou_ref[:, pl.ds(pl.multiple_of(u * ut, ut), ut)] += pu

    @pl.when(u == 0)
    def _():
        oi_ref[:, pl.ds(pl.multiple_of(i * it, it), it)] = pi

    @pl.when(u != 0)
    def _():
        oi_ref[:, pl.ds(pl.multiple_of(i * it, it), it)] += pi


@functools.partial(jax.jit, static_argnames=("interpret",))
def bipartite_dual_matmul(
    a_p: jnp.ndarray,  # (Up, Ip) bf16, zero-padded to the dual tile grid
    xu: jnp.ndarray,  # (Up, d) bf16
    xi: jnp.ndarray,  # (Ip, d) bf16
    interpret: bool = False,
):
    """``(A @ xi, Aᵀ @ xu)`` with f32 accumulation, one HBM pass over A.

    The x/out arrays ride whole in VMEM (a few MB at dense-budget scale);
    only adjacency tiles stream. Callers pad Up/Ip via ``dual_pad_sizes``.
    """
    up, ip = a_p.shape
    ut = up if up < DUAL_U_TILE else DUAL_U_TILE
    it = ip if ip < DUAL_I_TILE else DUAL_I_TILE
    assert up % ut == 0 and ip % it == 0, "pad A to the dual tile grid"
    d = xu.shape[1]
    grid = (up // ut, ip // it)
    ou_t, oi_t = pl.pallas_call(
        _dual_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ut, it), lambda u, i: (u, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((up, d), lambda u, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ip, d), lambda u, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((d, up), lambda u, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, ip), lambda u, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, up), jnp.float32),
            jax.ShapeDtypeStruct((d, ip), jnp.float32),
        ],
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(a_p, xu, xi)
    return ou_t.T, oi_t.T


def bipartite_dual_matmul_xla(a_p, xu, xi):
    """Reference/fallback implementation with identical semantics."""
    ou = jnp.dot(a_p, xi, preferred_element_type=jnp.float32)
    oi = jax.lax.dot_general(
        a_p, xu,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return ou, oi


DUAL_VMEM_LIMIT = 96 * 1024 * 1024  # vmem_limit_bytes passed to Mosaic


def dual_vmem_bytes(num_users: int, num_items: int, d: int) -> int:
    """Estimated VMEM footprint of ``bipartite_dual_matmul`` for a
    (num_users, num_items) adjacency with embedding dim ``d``: the x inputs
    and both f32 accumulators are pinned WHOLE in VMEM; only A tiles stream
    (double-buffered). Used to gate the ``graph.dense.dual=auto`` path — a
    skewed shape inside the dense entry budget (e.g. I≈500k, d=50) overflows
    the accumulator pinning even though the two-matmul XLA path is fine."""
    up, ip = dual_pad_sizes(num_users, num_items)
    ut = up if up < DUAL_U_TILE else DUAL_U_TILE
    it = ip if ip < DUAL_I_TILE else DUAL_I_TILE
    return (
        2 * ut * it * 2  # A tile, bf16, double-buffered
        + (up + ip) * d * 2  # xu + xi, bf16
        + (up + ip) * d * 4  # ou + oiᵀ, f32
    )


def dual_pad_sizes(num_users: int, num_items: int, sublane: int = 16):
    """(Up, Ip) the dual kernel needs for a (num_users, num_items) A.
    ``sublane`` is the dtype's sublane tile: 16 for bf16, 32 for int8."""
    up = (
        _round_up(num_users, sublane)
        if num_users < DUAL_U_TILE
        else _round_up(num_users, DUAL_U_TILE)
    )
    ip = (
        _round_up(num_items, 128)
        if num_items < DUAL_I_TILE
        else _round_up(num_items, DUAL_I_TILE)
    )
    return up, ip
