"""Monotonic alignment search (VITS MAS) — TPU-native implementations.

Replaces the reference's Cython/OpenMP extension
(VISinger/monotonic_align/core.pyx:1-42): a Viterbi-style DP that finds the
best monotonic path through the [t_y frames, t_x tokens] log-likelihood
matrix, then backtraces a one-hot path.

Three implementations, one semantics:
  - maximum_path_jax: lax.scan row-wise DP, fully vectorized over (batch, t_x)
    — runs anywhere, differentiable-free (alignment targets are detached);
  - maximum_path_pallas: Pallas TPU kernel — the DP rows stay in VMEM, the
    row-max recurrence is a VPU op, grid over batch;
  - native CPU (music_generation_tpu.runtime.native): C++/OpenMP twin of the
    reference extension for host-side data preprocessing.

All paths follow the reference recurrence exactly:
  value[y, x] += max(value[y-1, x-1], value[y-1, x]) with the x==y diagonal
  forced to come from the diagonal predecessor and x==0 only allowed at y==0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

MAX_NEG = -1e9


def _forward_rows(values: jnp.ndarray, t_ys: jnp.ndarray, t_xs: jnp.ndarray):
    """Run the DP accumulation. values: [B, Ty, Tx]. Returns accumulated
    values [B, Ty, Tx] (same as the reference's in-place `value`)."""
    b, t_y, t_x = values.shape
    xs = jnp.arange(t_x)

    def row_step(prev_row, inputs):
        y, row_vals = inputs                      # [], [B, Tx]
        shifted = jnp.concatenate(
            [jnp.full((b, 1), MAX_NEG), prev_row[:, :-1]], axis=1)
        v_prev = jnp.where(xs[None, :] == 0,
                           jnp.where(y == 0, 0.0, MAX_NEG), shifted)
        v_cur = jnp.where(xs[None, :] == y, MAX_NEG, prev_row)
        # active region: max(0, t_x + y - t_y) <= x < min(t_x, y+1), per item
        lo = jnp.maximum(0, t_xs + y - t_ys)[:, None]
        hi = jnp.minimum(t_xs, y + 1)[:, None]
        active = (xs[None, :] >= lo) & (xs[None, :] < hi)
        new_row = jnp.where(active,
                            row_vals + jnp.maximum(v_prev, v_cur), row_vals)
        return new_row, new_row

    init = jnp.full((b, t_x), MAX_NEG)
    _, rows = jax.lax.scan(row_step, init,
                           (jnp.arange(t_y), values.transpose(1, 0, 2)))
    return rows.transpose(1, 0, 2)


def _backtrace(acc: jnp.ndarray, t_ys: jnp.ndarray, t_xs: jnp.ndarray):
    """One-hot backtrace. Returns path [B, Ty, Tx] float32."""
    b, t_y, t_x = acc.shape

    def step(index, y):
        # only rows y < t_y are real; above them we just hold index = t_x-1
        prev = jnp.where(y > 0,
                         acc[:, jnp.maximum(y - 1, 0), :], MAX_NEG)
        v_stay = jnp.take_along_axis(prev, index[:, None], axis=1)[:, 0]
        v_diag = jnp.take_along_axis(prev, jnp.maximum(index - 1, 0)[:, None],
                                     axis=1)[:, 0]
        move = (index != 0) & ((index == y) | (v_stay < v_diag))
        onehot = jax.nn.one_hot(index, t_x)
        active = (y < t_ys)
        onehot = onehot * active[:, None].astype(onehot.dtype)
        new_index = jnp.where(active & move, index - 1, index)
        return new_index, onehot

    init_index = t_xs - 1
    _, path_rows = jax.lax.scan(step, init_index,
                                jnp.arange(t_y - 1, -1, -1))
    # rows were produced for y = t_y-1 .. 0
    return path_rows[::-1].transpose(1, 0, 2)


@functools.partial(jax.jit, static_argnames=())
def maximum_path_jax(neg_cent: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """neg_cent, mask: [B, Ty, Tx] -> one-hot monotonic path [B, Ty, Tx]."""
    t_ys = mask[:, :, 0].sum(axis=1).astype(jnp.int32)
    t_xs = mask[:, 0, :].sum(axis=1).astype(jnp.int32)
    values = jnp.where(mask > 0, neg_cent, 0.0).astype(jnp.float32)
    acc = _forward_rows(values, t_ys, t_xs)
    path = _backtrace(acc, t_ys, t_xs)
    return path * mask


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------

def _mas_kernel(t_y_n, t_x_n, value_ref, path_ref, acc_ref):
    """One batch item per grid step. value_ref: [Ty, Tx] VMEM; path out.

    Mosaic-friendly: row reads/writes via pl.ds on refs, scalar gathers
    expressed as masked row reductions (VPU ops), no dynamic_slice on arrays.
    """
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    t_y, t_x = value_ref.shape
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, t_x), 1)

    def fwd(y, prev_row):
        row = value_ref[pl.ds(y, 1), :]
        shifted = jnp.concatenate(
            [jnp.full((1, 1), MAX_NEG, jnp.float32), prev_row[:, :-1]], axis=1)
        v_prev = jnp.where(xs == 0,
                           jnp.where(y == 0, 0.0, MAX_NEG), shifted)
        v_cur = jnp.where(xs == y, MAX_NEG, prev_row)
        lo = jnp.maximum(0, t_x_n + y - t_y_n)
        hi = jnp.minimum(t_x_n, y + 1)
        active = (xs >= lo) & (xs < hi)
        new_row = jnp.where(active, row + jnp.maximum(v_prev, v_cur), row)
        acc_ref[pl.ds(y, 1), :] = new_row
        return new_row

    jax.lax.fori_loop(0, t_y, fwd, jnp.full((1, t_x), MAX_NEG, jnp.float32))

    def bwd(i, index):
        y = t_y - 1 - i
        active = y < t_y_n
        onehot = ((xs == index) & active).astype(jnp.float32)
        path_ref[pl.ds(y, 1), :] = onehot
        prev = jnp.where(y > 0,
                         acc_ref[pl.ds(jnp.maximum(y - 1, 0), 1), :], MAX_NEG)
        # masked-reduction scalar gathers (no dynamic_slice in Mosaic)
        v_stay = jnp.sum(jnp.where(xs == index, prev, 0.0))
        v_diag = jnp.sum(jnp.where(xs == jnp.maximum(index - 1, 0), prev, 0.0))
        move = (index != 0) & ((index == y) | (v_stay < v_diag))
        return jnp.where(active & move, index - 1, index)

    path_ref[...] = jnp.zeros((t_y, t_x), jnp.float32)
    jax.lax.fori_loop(0, t_y, bwd, t_x_n - 1)


def maximum_path_pallas(neg_cent: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Pallas TPU version; same contract as maximum_path_jax."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t_y0, t_x0 = neg_cent.shape
    t_ys = mask[:, :, 0].sum(axis=1).astype(jnp.int32)
    t_xs = mask[:, 0, :].sum(axis=1).astype(jnp.int32)
    values = jnp.where(mask > 0, neg_cent, 0.0).astype(jnp.float32)
    # Mosaic tiling: lane (last) dim 128-aligned, sublane 8-aligned.
    t_x = -(-t_x0 // 128) * 128
    t_y = -(-t_y0 // 8) * 8
    values = jnp.pad(values, ((0, 0), (0, t_y - t_y0), (0, t_x - t_x0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, t_y, t_x), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, t_y, t_x), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((t_y, t_x), jnp.float32)],
    )

    def kernel(tys_ref, txs_ref, value_ref, path_ref, acc_ref):
        i = pl.program_id(0)
        _mas_kernel(tys_ref[i], txs_ref[i],
                    value_ref.at[0], path_ref.at[0], acc_ref)

    path = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, t_y, t_x), jnp.float32),
    )(t_ys, t_xs, values)
    return path[:, :t_y0, :t_x0] * mask


def _auto_platform() -> str:
    """Effective platform for dispatch: the pinned jax_default_device wins
    over default_backend (in this environment the TPU plugin registers even
    when tests pin computation to CPU — CLAUDE.md; a Pallas TPU kernel would
    then fail at lowering, after the dispatch's try block)."""
    dev = jax.config.jax_default_device
    if dev is not None:
        return dev.platform
    return jax.default_backend()


def maximum_path(neg_cent, mask, backend: str = "auto"):
    """Dispatch: pallas on TPU, lax elsewhere."""
    if backend == "pallas" or (backend == "auto" and
                               _auto_platform() not in ("cpu",)):
        try:
            return maximum_path_pallas(neg_cent, mask)
        except Exception:
            pass
    return maximum_path_jax(neg_cent, mask)


def mas_duration_targets(z_p, m_p, logs_p, x_mask, y_mask,
                         logs_clamp: float = 7.0):
    """Monotonic-alignment-search duration targets (frames per phone).

    The VITS negative cross-entropy alignment score (the commented-out
    training path at VISinger/models.py:590-604), fed to maximum_path; use
    when the dataset has no ground-truth phone durations. All inputs
    channels-last: z_p [B,F,C] (posterior sample through the flow),
    m_p/logs_p [B,T,C] (token-level prior BEFORE length regulation),
    masks [B,F,1]/[B,T,1]. Returns int32 durations [B, T].
    """
    import math as _math

    logs_p = jnp.clip(logs_p, -logs_clamp, logs_clamp)
    s_p_sq_r = jnp.exp(-2.0 * logs_p)                          # [B,T,C]
    neg_cent1 = jnp.sum(-0.5 * _math.log(2 * _math.pi) - logs_p,
                        axis=-1)[:, None, :]                    # [B,1,T]
    neg_cent2 = jnp.einsum("bfc,btc->bft", -0.5 * z_p ** 2, s_p_sq_r)
    neg_cent3 = jnp.einsum("bfc,btc->bft", z_p, m_p * s_p_sq_r)
    neg_cent4 = jnp.sum(-0.5 * (m_p ** 2) * s_p_sq_r, axis=-1)[:, None, :]
    neg_cent = neg_cent1 + neg_cent2 + neg_cent3 + neg_cent4    # [B,F,T]

    attn_mask = y_mask[:, :, 0][:, :, None] * x_mask[:, :, 0][:, None, :]
    path = maximum_path(jax.lax.stop_gradient(neg_cent), attn_mask)
    return jnp.sum(path, axis=1).astype(jnp.int32)              # [B, T]


def maximum_path_numpy(neg_cent: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Plain numpy oracle (for tests), same recurrence as core.pyx."""
    b, t_y, t_x = neg_cent.shape
    t_ys = mask[:, :, 0].sum(1).astype(int)
    t_xs = mask[:, 0, :].sum(1).astype(int)
    paths = np.zeros_like(neg_cent)
    for i in range(b):
        value = np.array(neg_cent[i] * mask[i], dtype=np.float32)
        ty, tx = int(t_ys[i]), int(t_xs[i])
        for y in range(ty):
            for x in range(max(0, tx + y - ty), min(tx, y + 1)):
                v_cur = MAX_NEG if x == y else value[y - 1, x]
                if x == 0:
                    v_prev = 0.0 if y == 0 else MAX_NEG
                else:
                    v_prev = value[y - 1, x - 1]
                value[y, x] += max(v_prev, v_cur)
        index = tx - 1
        for y in range(ty - 1, -1, -1):
            paths[i, y, index] = 1
            if index != 0 and (index == y or
                               value[y - 1, index] < value[y - 1, index - 1]):
                index -= 1
    return paths * mask
