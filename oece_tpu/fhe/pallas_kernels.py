"""Pallas TPU kernels for the FHEW hot path.

The single hot operation of the whole framework (SURVEY.md §3.5: the blind
rotation inside EvalBinGate is ~99% of encrypted runtime) is the negacyclic
"digits × RGSW-key" contraction

    prod[b, m, k] = sum_{r,i} digs[r, b, i] * key[r, m, (k - i) mod 2N]

(m = parts*out*limb flattened), where the key index arithmetic encodes
multiplication by a block-negacyclic matrix.  XLA can only express this with
a 134 MB gather per bootstrap step, which lowers catastrophically on TPU.
This kernel materializes the negacyclic tiles *in VMEM* with a log-depth
barrel shifter and feeds the MXU one [TB, R*128] x [R*128, M*128] int8
matmul per grid cell, accumulating exactly in int32.

Key ideas (all exactness-preserving):
  * The (k_tile, i_tile) grid cell only depends on the diagonal k - i, so
    the 2*nt-1 needed byte windows are precomputed host-side and selected
    with BlockSpec index_map arithmetic — no dynamic slicing in-kernel.
  * Key bytes are packed four-per-int32 lane (pltpu.roll is 32-bit only;
    packing also cuts barrel traffic 4x).  The byte-granular part of each
    row's shift is handled by storing the window at 4 byte-phases and
    selecting per row; the word-granular part is a 6-round masked barrel.
  * The built tile's columns come out plane-permuted (byte j of word w at
    column j*32+w instead of 4w+j); the cheap int32 un-permute happens on
    the kernel *output* outside Pallas (a [4,32] transpose per 128-column
    tile commutes with the row contraction).

Shapes (STD128: R = 2*d_g = 8 digit rows, M = parts*out*limbs = 16):
    digs : int8 [N/128, B, R*128]           (pack_digits_for_pallas)
    keys : int32 [2*nt-1, 4, R*M*SPANW]     (pack_keys_for_pallas; windows
                                             flattened so the whole block
                                             barrels in one full-lane pass —
                                             max shift 32 words < the 64-word
                                             segment, so a global roll never
                                             contaminates the consumed 32
                                             leading words of any segment)
    out  : int32 [B, M, N]

Numerically exact; differentially tested against the jnp gather formulation
and the NumPy golden model (tests/test_pallas.py).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import modmath

TILE = 128  # TI = TK = 128
SPAN = 2 * TILE  # window bytes; net shift + read never exceeds 255
SPANW = SPAN // 4  # packed int32 words per window
TKW = TILE // 4  # words per output tile

# v5e has 128 MB VMEM/core; the 16 MB default scoped limit starves these
# kernels (measured: the matmul kernel only reaches the int8-MXU roofline
# with full double-buffering headroom).
VMEM_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _build_diag_kernel(keys_ref, dense_ref, *, R, M):
    """Grid (ndiag,): materialize the dense negacyclic block for one
    diagonal (shared by every (k, i) cell with k - i = d, and by every
    batch chunk) into HBM.

    keys_ref  : [1, 4, R*M*SPANW] int32 (this diagonal's packed windows)
    dense_ref : [1, R*TILE, M*TILE] int8 out block
    """
    TI = TK = TILE
    RMW = R * M * SPANW
    roww = jax.lax.broadcasted_iota(jnp.int32, (TI, RMW), 0)
    amount = TI - roww  # per-row left byte shift in [1, 128]
    v = amount & 3
    wsh = amount >> 2

    x = jnp.broadcast_to(keys_ref[0, 0, :], (TI, RMW)).astype(jnp.uint32)
    for ph in (1, 2, 3):
        xp = jnp.broadcast_to(keys_ref[0, ph, :], (TI, RMW)).astype(jnp.uint32)
        x = jnp.where(v == ph, xp, x)
    for b in range(6):  # word shifts 1..32
        shw = 1 << b
        rolled = pltpu.roll(x, RMW - shw, 1)
        x = jnp.where((wsh & shw) != 0, rolled, x)

    for r in range(R):
        for m in range(M):
            x32 = x[:, (r * M + m) * SPANW : (r * M + m) * SPANW + TKW]
            planes = [
                ((x32 >> jnp.uint32(8 * j)) & jnp.uint32(0xFF)).astype(jnp.int32)
                for j in range(4)
            ]
            tile8 = jnp.concatenate(planes, axis=1).astype(jnp.int8)
            dense_ref[0, r * TI : (r + 1) * TI, m * TK : (m + 1) * TK] = tile8


def _diag_matmul_kernel(digs_ref, dense_ref, out_ref, *, M, TB):
    """Grid (k_tiles, i_tiles): int8 MXU contraction against the prebuilt
    diagonal dense blocks (streamed from HBM by BlockSpec).

    digs_ref  : [1, TB, R*TILE] int8  (block at (i, 0, 0))
    dense_ref : [1, R*TILE, M*TILE] int8 (block at (k-i+nt-1, 0, 0))
    out_ref   : [TB, M, TILE] int32 (block at (0, 0, k))

    The whole-block reshape write (instead of per-m slice stores) is what
    lets Mosaic keep the MXU saturated — measured 692 us/step at
    B=1024/STD128, i.e. the int8 roofline, vs ~1.5 ms with slice stores.
    """
    i_idx = pl.program_id(1)
    res = jax.lax.dot_general(
        digs_ref[0],
        dense_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [TB, M*TK]
    r3 = res.reshape(TB, M, TILE)

    @pl.when(i_idx == 0)
    def _():
        out_ref[...] = r3

    @pl.when(i_idx != 0)
    def _():
        out_ref[...] = out_ref[...] + r3


def _combine_limbs_tile(a, Q: int):
    """a int32 [TB, G, L=4, TILE] limb accumulators -> [TB, G, TILE] mod Q
    (modmath.combine_limbs_mod_q inlined on the limb axis=2)."""
    acc = modmath.mod_q(a[:, :, 3, :], Q)
    for l in (2, 1, 0):
        acc = modmath.mul_pow8_mod(acc, Q)
        acc = acc + modmath.mod_q(a[:, :, l, :], Q)
        acc = acc - Q * (acc >= Q).astype(jnp.int32)
    return acc


def _diag_matmul_combine_kernel(digs_ref, dense_ref, out_ref, acc_ref, *, M, TB, nt, Q):
    """Like _diag_matmul_kernel but accumulates into a VMEM scratch and, on
    the last i-tile, Horner-combines the L=4 key limbs mod Q in-kernel —
    the [TB, M, N] int32 intermediate never touches HBM (4x less output
    traffic and no separate combine pass).

    m-plane order is (part, out, limb) (pack_bootstrap_key), so the limb
    axis is minor: res.reshape(TB, M//4, 4, TILE).
    out_ref : [TB, M//4, TILE] int32 combined, columns still plane-permuted.
    """
    i_idx = pl.program_id(1)
    res = jax.lax.dot_general(
        digs_ref[0],
        dense_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(i_idx == 0)
    def _():
        acc_ref[...] = res

    @pl.when(i_idx != 0)
    def _():
        acc_ref[...] = acc_ref[...] + res

    @pl.when(i_idx == nt - 1)
    def _():
        out_ref[...] = _combine_limbs_tile(acc_ref[...].reshape(TB, M // 4, 4, TILE), Q)


def build_diagonals_pallas(
    keys_windows, R: int, interpret: bool = False, reverse: bool = False
):
    """keys_windows int32 [ndiag, 4, R*M*SPANW] -> dense int8
    [ndiag, R*TILE, M*TILE] (built once per bootstrap step).

    With ``reverse=True`` the output is stored in reversed diagonal order
    (rev[d'] = dense[ndiag-1-d']), which makes the per-output-tile operand of
    the window matmul a *contiguous* row span (see window_matmul_pallas).
    """
    ndiag, nph, rmw = keys_windows.shape
    RM = rmw // SPANW
    M = RM // R
    kernel = functools.partial(_build_diag_kernel, R=R, M=M)
    out_map = (lambda d: (ndiag - 1 - d, 0, 0)) if reverse else (lambda d: (d, 0, 0))
    return pl.pallas_call(
        kernel,
        grid=(ndiag,),
        in_specs=[
            pl.BlockSpec((1, 4, rmw), lambda d: (d, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, R * TILE, M * TILE), out_map, memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((ndiag, R * TILE, M * TILE), jnp.int8),
        interpret=interpret,
        compiler_params=None if interpret else VMEM_PARAMS,
    )(keys_windows)


def _window_matmul_kernel(digs_ref, rev_ref, out_ref, *, nt, RT, M, TB, Q):
    """Grid (b_chunks, nt): ONE [TB, nt*RT] x [nt*RT, M*TILE] int8 MXU dot
    per output N-tile, contracting over all i-tiles at once.

    The second operand for output tile k is the row span
    rev[(nt-1-k)*RT : (2*nt-1-k)*RT] of the reversed-diagonal dense array
    (rev[j] = dense[k-j+nt-1] within the span), so no per-cell accumulator
    read-modify-write and no per-cell HBM streaming of the dense blocks —
    rev stays VMEM-resident across the whole grid.  The limb combine runs on
    the complete dot result (columns remain plane-permuted, like the other
    kernels).

    digs_ref : [TB, nt*RT] int8 (block at (c, 0)); column j*RT+r*128+t is
               digit row r of i-tile j.
    rev_ref  : [(2*nt-1)*RT, M*TILE] int8, whole array resident.
    out_ref  : [TB, M//4, TILE] int32 (block at (c, 0, k)).
    """
    k = pl.program_id(1)
    win = rev_ref[pl.ds((nt - 1 - k) * RT, nt * RT), :]
    res = jax.lax.dot_general(
        digs_ref[...],
        win,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [TB, M*TILE]
    out_ref[...] = _combine_limbs_tile(res.reshape(TB, M // 4, 4, TILE), Q)


def window_matmul_pallas(
    digs_rows, rev_flat, nt: int, R: int, Q: int, block_b: int = 1024,
    interpret: bool = False,
):
    """digs_rows int8 [B, nt*R*TILE]; rev_flat int8 [(2*nt-1)*R*TILE, M*TILE]
    -> int32 [B, M//4, N] limb-combined mod Q (plane-permuted columns)."""
    B, K = digs_rows.shape
    RT = R * TILE
    assert K == nt * RT
    MT = rev_flat.shape[1]
    M = MT // TILE
    TB = min(block_b, B)
    assert B % TB == 0, (B, TB)
    N = nt * TILE
    # VMEM guard (ADVICE r1): rev is whole-array resident; with the digs
    # block (double-buffered) and the int32 dot intermediate it must fit the
    # compiler budget, else Mosaic fails with an opaque allocation error.
    resident = (2 * nt - 1) * RT * MT  # rev, int8
    per_step = 2 * TB * K + TB * MT * 4 + TB * (M // 4) * TILE * 4
    budget = VMEM_PARAMS.vmem_limit_bytes
    assert resident + per_step <= budget, (
        f"window matmul VMEM estimate {resident + per_step} exceeds budget "
        f"{budget}; use negacyclic_matmul_combine (streamed diagonals) for "
        f"this parameter set"
    )
    kernel = functools.partial(
        _window_matmul_kernel, nt=nt, RT=RT, M=M, TB=TB, Q=Q
    )
    return pl.pallas_call(
        kernel,
        grid=(B // TB, nt),
        in_specs=[
            pl.BlockSpec((TB, K), lambda c, k: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                ((2 * nt - 1) * RT, MT), lambda c, k: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (TB, M // 4, TILE), lambda c, k: (c, 0, k), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, M // 4, N), jnp.int32),
        interpret=interpret,
        compiler_params=None if interpret else VMEM_PARAMS,
    )(digs_rows, rev_flat)


@functools.partial(jax.jit, static_argnames=("R", "Q", "max_b", "interpret"))
def negacyclic_matmul_window(
    digs_rows, keys_windows, R: int, Q: int, max_b: int = 1024,
    interpret: bool = False,
):
    """Window-matmul pipeline: build the reversed diagonal array once, then
    one K=(N/128)*R*128 MXU dot per output tile with the limb combine fused.

    digs_rows int8 [B, nt*R*128] (pack_digits_rows layout).
    Returns int32 [B, M//4, N] in [0, Q), true column order.
    """
    B, K = digs_rows.shape
    RT = R * TILE
    nt = K // RT
    N = nt * TILE
    rev = build_diagonals_pallas(keys_windows, R, interpret, reverse=True)
    ndiag, _, MT = rev.shape
    rev_flat = rev.reshape(ndiag * RT, MT)
    # chunk ragged batches (ADVICE r1): kernel blocks must divide the batch
    step = min(max_b, B)
    chunks = []
    for c0 in range(0, B, step):
        part = digs_rows[c0 : c0 + step]
        chunks.append(
            window_matmul_pallas(
                part, rev_flat, nt, R, Q, block_b=part.shape[0],
                interpret=interpret,
            )
        )
    out = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=0)
    G = MT // TILE // 4
    out5 = out.reshape(B, G, nt, 4, TKW)
    return jnp.transpose(out5, (0, 1, 2, 4, 3)).reshape(B, G, N)


def diag_matmul_pallas(digs_tiled, dense_all, R: int, interpret: bool = False):
    """digs_tiled int8 [nt, B, R*128]; dense_all int8 [2*nt-1, R*128, M*128]
    -> int32 [B, M, N] (plane-permuted columns, like the fused kernel)."""
    nt, B, RT = digs_tiled.shape
    N = nt * TILE
    ndiag, _, MT = dense_all.shape
    M = MT // TILE
    kernel = functools.partial(_diag_matmul_kernel, M=M, TB=B)
    return pl.pallas_call(
        kernel,
        grid=(nt, nt),
        in_specs=[
            pl.BlockSpec((1, B, RT), lambda k, i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, RT, MT), lambda k, i: (k - i + nt - 1, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (B, M, TILE), lambda k, i: (0, 0, k), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, M, N), jnp.int32),
        interpret=interpret,
        compiler_params=None if interpret else VMEM_PARAMS,
    )(digs_tiled, dense_all)


def diag_matmul_combine_pallas(
    digs_tiled, dense_all, R: int, Q: int, interpret: bool = False
):
    """digs_tiled int8 [nt, B, R*128]; dense_all int8 [2*nt-1, R*128, M*128]
    -> int32 [B, M//4, N] limb-combined mod Q (plane-permuted columns)."""
    nt, B, RT = digs_tiled.shape
    N = nt * TILE
    ndiag, _, MT = dense_all.shape
    M = MT // TILE
    kernel = functools.partial(
        _diag_matmul_combine_kernel, M=M, TB=B, nt=nt, Q=Q
    )
    return pl.pallas_call(
        kernel,
        grid=(nt, nt),
        in_specs=[
            pl.BlockSpec((1, B, RT), lambda k, i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, RT, MT), lambda k, i: (k - i + nt - 1, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (B, M // 4, TILE), lambda k, i: (0, 0, k), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, M // 4, N), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, M * TILE), jnp.int32)],
        interpret=interpret,
        compiler_params=None if interpret else VMEM_PARAMS,
    )(digs_tiled, dense_all)


@functools.partial(jax.jit, static_argnames=("R", "Q", "max_b", "interpret"))
def negacyclic_matmul_combine(
    digs_tiled, keys_windows, R: int, Q: int, max_b: int = 512, interpret: bool = False
):
    """Two-phase pipeline with the limb combine fused into the matmul:
    build the 2*nt-1 dense diagonal blocks once, contract every batch chunk,
    Horner-combine the 4 key limbs mod Q in-kernel.

    Returns int32 [B, M//4, N] in [0, Q), true column order (the plane
    un-permutation runs on the combined output — 4x smaller than the raw
    limb accumulators)."""
    nt, B, RT = digs_tiled.shape
    N = nt * TILE
    dense_all = build_diagonals_pallas(keys_windows, R, interpret)
    G = dense_all.shape[2] // TILE // 4
    step = min(max_b, B)
    chunks = []
    for c0 in range(0, B, step):
        chunks.append(
            diag_matmul_combine_pallas(
                digs_tiled[:, c0 : c0 + step], dense_all, R, Q, interpret
            )
        )
    out = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=0)
    out5 = out.reshape(B, G, nt, 4, TKW)
    return jnp.transpose(out5, (0, 1, 2, 4, 3)).reshape(B, G, N)


@functools.partial(jax.jit, static_argnames=("R", "max_b", "interpret"))
def negacyclic_matmul_split(
    digs_tiled, keys_windows, R: int, max_b: int = 512, interpret: bool = False
):
    """Two-phase pipeline: build the 2*nt-1 diagonal dense blocks once, then
    MXU-contract every batch chunk against them.  Same result (and column
    un-permutation) as negacyclic_matmul_pallas, far less barrel traffic."""
    nt, B, RT = digs_tiled.shape
    N = nt * TILE
    dense_all = build_diagonals_pallas(keys_windows, R, interpret)
    M = dense_all.shape[2] // TILE
    step = min(max_b, B)
    chunks = []
    for c0 in range(0, B, step):
        chunks.append(
            diag_matmul_pallas(digs_tiled[:, c0 : c0 + step], dense_all, R, interpret)
        )
    out = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=0)
    out5 = out.reshape(B, M, nt, 4, TKW)
    return jnp.transpose(out5, (0, 1, 2, 4, 3)).reshape(B, M, N)


def _negacyclic_kernel(digs_ref, keys_ref, out_ref, dense_ref, *, N, R, M, TB):
    """Grid (k_tiles, i_tiles); i innermost so ``out`` stays resident.

    digs_ref  : [1, TB, R*TILE] int8       (block at (i, 0, 0))
    keys_ref  : [1, 4, R*M*SPANW] int32    (window block, diagonal k-i)
    out_ref   : [TB, M, TILE] int32        (block at (0, 0, k))
    dense_ref : scratch [R*TILE, M*TILE] int8
    """
    i_idx = pl.program_id(1)
    TI = TK = TILE
    RMW = R * M * SPANW

    # Row i' of the tile needs its window left-shifted by amount = TI - i'.
    roww = jax.lax.broadcasted_iota(jnp.int32, (TI, RMW), 0)
    amount = TI - roww  # byte shift in [1, 128]
    v = amount & 3  # byte phase, handled by phase selection
    wsh = amount >> 2  # word shift in [0, 32]

    # One full-lane barrel pass over ALL R*M windows at once.
    x = jnp.broadcast_to(keys_ref[0, 0, :], (TI, RMW)).astype(jnp.uint32)
    for ph in (1, 2, 3):
        xp = jnp.broadcast_to(keys_ref[0, ph, :], (TI, RMW)).astype(jnp.uint32)
        x = jnp.where(v == ph, xp, x)
    for b in range(6):  # word shifts 1..32
        shw = 1 << b
        rolled = pltpu.roll(x, RMW - shw, 1)
        x = jnp.where((wsh & shw) != 0, rolled, x)

    for r in range(R):
        for m in range(M):
            x32 = x[:, (r * M + m) * SPANW : (r * M + m) * SPANW + TKW]
            # plane-separated unpack: column j*TKW+w holds byte j of word w
            # (un-permuted outside the kernel)
            planes = [
                ((x32 >> jnp.uint32(8 * j)) & jnp.uint32(0xFF)).astype(jnp.int32)
                for j in range(4)
            ]
            tile8 = jnp.concatenate(planes, axis=1).astype(jnp.int8)  # [TI, TK]
            dense_ref[r * TI : (r + 1) * TI, m * TK : (m + 1) * TK] = tile8

    res = jax.lax.dot_general(
        digs_ref[0],
        dense_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [TB, M*TK]

    @pl.when(i_idx == 0)
    def _():
        for m in range(M):
            out_ref[:, m, :] = res[:, m * TK : (m + 1) * TK]

    @pl.when(i_idx != 0)
    def _():
        for m in range(M):
            out_ref[:, m, :] = out_ref[:, m, :] + res[:, m * TK : (m + 1) * TK]


@functools.partial(jax.jit, static_argnames=("R", "interpret"))
def negacyclic_matmul_pallas(digs_tiled, keys_windows, R: int, interpret: bool = False):
    """digs_tiled int8 [N/128, B, R*128]; keys_windows int32
    [2*nt-1, 4, R*M, SPANW] -> int32 [B, M, N] (column order corrected)."""
    nt, B, RT = digs_tiled.shape
    N = nt * TILE
    assert RT == R * TILE
    ndiag, nph, rmw = keys_windows.shape
    assert ndiag == 2 * nt - 1 and nph == 4
    RM = rmw // SPANW
    M = RM // R
    kernel = functools.partial(_negacyclic_kernel, N=N, R=R, M=M, TB=B)
    out = pl.pallas_call(
        kernel,
        grid=(nt, nt),
        in_specs=[
            pl.BlockSpec((1, B, RT), lambda k, i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 4, RM * SPANW), lambda k, i: (k - i + nt - 1, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (B, M, TILE), lambda k, i: (0, 0, k), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, M, N), jnp.int32),
        scratch_shapes=[pltpu.VMEM((R * TILE, M * TILE), jnp.int8)],
        interpret=interpret,
        compiler_params=None if interpret else VMEM_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * R * M * N,
            bytes_accessed=B * N * R + ndiag * 4 * RM * SPAN + B * M * N * 4,
            transcendentals=0,
        ),
    )(digs_tiled, keys_windows)
    # undo the per-tile plane permutation: column j*TKW+w -> 4w+j
    out5 = out.reshape(B, M, nt, 4, TKW)
    return jnp.transpose(out5, (0, 1, 2, 4, 3)).reshape(B, M, N)


def _cmux_epilogue_kernel(P_ref, acc_ref, amt_ref, out_ref, *, BG, N, Q):
    """Per-gate negacyclic monomial rotations + CMUX add + reduction, all
    VMEM-resident (replaces the jnp 11-round roll/where barrel that cost
    ~0.42 ms/step at B=1024 in HBM round trips).

    P_ref   : [BG, 2(part), 2(out), N] int32 in [0, Q)
    acc_ref : [BG, 2, N] int32
    amt_ref : [BG, 2, 2, TILE] int32 rotation amounts in [0, 2N), lane-
              replicated host-side (part0: 2N - a~, part1: a~).  Mosaic
              supports neither reshape-to-singleton-minors nor the matching
              broadcast_in_dim, so the per-gate scalars arrive pre-spread
              over one lane tile and are widened by concatenation.
    out_ref : [BG, 2, N] int32 = red(acc + X^amt0*P0 + X^amt1*P1 - P0 - P1)
    """
    P = P_ref[...]
    neg = jnp.where(P == 0, 0, Q - P)
    x = jnp.concatenate([P, neg], axis=-1)  # negacyclic 2N extension
    amt = jnp.concatenate([amt_ref[...]] * (2 * N // TILE), axis=-1)
    for bbit in range(int(np.log2(2 * N))):
        sh = 1 << bbit
        rolled = pltpu.roll(x, sh, 3)
        x = jnp.where((amt & sh) != 0, rolled, x)
    rot = x[..., :N]
    y = acc_ref[...] + rot[:, 0] + rot[:, 1] + (2 * Q - P[:, 0] - P[:, 1])
    out_ref[...] = modmath.red31(y, Q)


def cmux_epilogue_pallas(P, acc, amt, Q: int, block_b: int = 256, interpret: bool = False):
    """P int32 [B, 2, 2, N] mod Q; acc [B, 2, N]; amt [B, 2] in [0, 2N)
    -> int32 [B, 2, N]: red31(acc + rot(P0, amt0) + rot(P1, amt1) + 2Q - P0 - P1).

    Exactly matches the jnp path (monomial_rotate + red31 in fhe/boot.py)."""
    B, _, _, N = P.shape
    BG = min(block_b, B)
    assert B % BG == 0, (B, BG)
    amt_lane = jnp.broadcast_to(amt[:, :, None, None], (B, 2, 2, TILE))
    kernel = functools.partial(_cmux_epilogue_kernel, BG=BG, N=N, Q=Q)
    return pl.pallas_call(
        kernel,
        grid=(B // BG,),
        in_specs=[
            pl.BlockSpec((BG, 2, 2, N), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BG, 2, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BG, 2, 2, TILE), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BG, 2, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2, N), jnp.int32),
        interpret=interpret,
        compiler_params=None if interpret else VMEM_PARAMS,
    )(P, acc, amt_lane)


# ---------------------------------------------------------------------------
# Fully-fused bootstrap step (round 2).
#
# One pallas_call per GINX CMUX step: gadget decomposition, the negacyclic
# key matmul, the limb combine, the per-gate monomial rotations and the CMUX
# add all run in VMEM; per step only the accumulator [B, 2, N] crosses HBM.
#
# The MXU matmul's natural output columns are plane-permuted per 128-tile
# (true coefficient t = 128k + 4w + j lives at lane 128k + 32j + w; Mosaic
# cannot bitwidth-cast int32->int8 in true order — measured).  Instead of
# un-permuting per step, the ACCUMULATOR ITSELF lives in this permuted
# layout for the whole blind rotation:
#   * gadget decomposition is elementwise — layout-agnostic;
#   * the dense key matrix is built in the conjugated basis P^T M P simply
#     by changing the per-row barrel amount to TILE - trueidx(row)
#     (trueidx(r) = 4*(r & 31) + (r >> 5)), columns come out permuted
#     naturally;
#   * the per-gate monomial rotation becomes a composition of uniform lane
#     rolls + masked selects (a true-space roll by 2^b maps to 1-3 permuted
#     rolls — see _roll_true_in_perm);
#   * permute/unpermute happen ONCE per bootstrap, outside the scan
#     (permute_lanes / unpermute_lanes below).
# ---------------------------------------------------------------------------


def permute_lanes(x: jnp.ndarray) -> jnp.ndarray:
    """[..., N] true coefficient order -> fused-kernel permuted order
    (true t = 128k + 4w + j  ->  lane 128k + 32j + w)."""
    N = x.shape[-1]
    nt = N // TILE
    x5 = x.reshape(*x.shape[:-1], nt, 32, 4)
    return jnp.swapaxes(x5, -1, -2).reshape(*x.shape)


def unpermute_lanes(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of permute_lanes."""
    N = x.shape[-1]
    nt = N // TILE
    x5 = x.reshape(*x.shape[:-1], nt, 4, 32)
    return jnp.swapaxes(x5, -1, -2).reshape(*x.shape)


def _roll_true_in_perm(x, b: int, N: int, j_lane, w_lane):
    """Right-roll by 2^b in TRUE coefficient space, applied to a
    permuted-layout array x [..., N] (last axis).  j_lane/w_lane are iota
    masks of x's shape: j = (lane>>5)&3, w = lane&31."""
    sh = 1 << b
    ax = x.ndim - 1
    if sh % TILE == 0:  # whole permuted tiles move intact
        return pltpu.roll(x, sh, ax)
    if sh >= 4:  # true roll by 4m: lanes shift by m within w, tile carry
        m = sh // 4
        r_in = pltpu.roll(x, m, ax)
        r_cross = pltpu.roll(x, 96 + m, ax)
        return jnp.where(w_lane < m, r_cross, r_in)
    if sh == 1:
        r32 = pltpu.roll(x, 32, ax)
        rm95 = pltpu.roll(x, N - 95, ax)
        r1 = pltpu.roll(x, 1, ax)
        return jnp.where(j_lane > 0, r32, jnp.where(w_lane > 0, rm95, r1))
    # sh == 2
    r64 = pltpu.roll(x, 64, ax)
    rm63 = pltpu.roll(x, N - 63, ax)
    r33 = pltpu.roll(x, 33, ax)
    return jnp.where(j_lane >= 2, r64, jnp.where(w_lane > 0, rm63, r33))


def _monomial_rotate_perm(x, c, N: int, Q: int, lane):
    """x [..., N] permuted-layout mod Q; c [..., N] lane-replicated rotation
    amounts in [0, 2N).  Matches boot.monomial_rotate bit-exactly (on the
    unpermuted view): cyclic half-barrel over N + negacyclic sign fix."""
    j_lane = (lane >> 5) & 3
    w_lane = lane & 31
    t_lane = lane - (lane & 127) + 4 * w_lane + j_lane  # true coefficient
    cp = c & (N - 1)
    for b in range(int(np.log2(N))):
        cand = _roll_true_in_perm(x, b, N, j_lane, w_lane)
        x = jnp.where((cp & (1 << b)) != 0, cand, x)
    wrap = (t_lane < cp) ^ (c >= N)
    return jnp.where(wrap, jnp.where(x == 0, 0, Q - x), x)


def _decompose_lanes(col, Q: int, B: int, d_used: int, shift: int):
    """Gadget digits of one accumulator poly block [TB, N] (permuted layout;
    elementwise).  Returns a list of d_used int8 [TB, N] digit planes.
    shift > 0 selects the approximate centered-rounded decomposition
    (golden.gadget_digits_approx); shift == 0 the exact one
    (golden.gadget_digits)."""
    half = B // 2
    log_b = int(np.log2(B))
    digs = []
    if shift > 0:
        cen = col - Q * (col >= (Q + 1) // 2).astype(jnp.int32)
        cur = (cen + (1 << (shift - 1))) >> shift
        for _ in range(d_used - 1):
            r = ((cur + half) & (B - 1)) - half
            digs.append(r.astype(jnp.int8))
            cur = (cur - r) >> log_b
        digs.append(cur.astype(jnp.int8))
    else:
        cur = col
        for _ in range(d_used - 1):
            r = cur & (B - 1)
            r = r - (B * (r >= half)).astype(jnp.int32)
            digs.append(r.astype(jnp.int8))
            cur = (cur - r) >> log_b
        digs.append(cur.astype(jnp.int8))
    return digs


def _build_rev_kernel(win_ref, rev_ref, *, nt, R, M):
    """Packed windows -> conjugated-basis reversed-diagonal dense blocks.

    win_ref : [2*nt-1, 4, R*M*SPANW] int32
    rev_ref : [(2*nt-1)*R*TILE, M*TILE] int8 out
    """
    TI = TILE
    RT = R * TILE
    ndiag = 2 * nt - 1
    RMW = R * M * SPANW
    roww = jax.lax.broadcasted_iota(jnp.int32, (TI, RMW), 0)
    trueidx = 4 * (roww & 31) + (roww >> 5)  # conjugated row basis
    amount = TI - trueidx  # per-row left byte shift in [1, 128]
    v = amount & 3
    wsh = amount >> 2
    for d in range(ndiag):
        x = jnp.broadcast_to(win_ref[d, 0, :], (TI, RMW)).astype(jnp.uint32)
        for ph in (1, 2, 3):
            xp = jnp.broadcast_to(win_ref[d, ph, :], (TI, RMW)).astype(jnp.uint32)
            x = jnp.where(v == ph, xp, x)
        for b in range(6):  # word shifts 1..32
            shw = 1 << b
            rolled = pltpu.roll(x, RMW - shw, 1)
            x = jnp.where((wsh & shw) != 0, rolled, x)
        row0 = (ndiag - 1 - d) * RT  # reversed order
        for r in range(R):
            for m in range(M):
                x32 = x[:, (r * M + m) * SPANW : (r * M + m) * SPANW + TKW]
                planes = [
                    ((x32 >> jnp.uint32(8 * j)) & jnp.uint32(0xFF)).astype(
                        jnp.int32
                    )
                    for j in range(4)
                ]
                tile8 = jnp.concatenate(planes, axis=1).astype(jnp.int8)
                rev_ref[
                    row0 + r * TI : row0 + (r + 1) * TI,
                    m * TILE : (m + 1) * TILE,
                ] = tile8


def build_rev_pallas(win, R: int, M: int, interpret: bool = False):
    """win int32 [2*nt-1, 4, R*M*SPANW] -> rev int8 [(2*nt-1)*R*128, M*128]."""
    ndiag, nph, rmw = win.shape
    nt = (ndiag + 1) // 2
    kernel = functools.partial(_build_rev_kernel, nt=nt, R=R, M=M)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ndiag * R * TILE, M * TILE), jnp.int8),
        interpret=interpret,
        compiler_params=None if interpret else VMEM_PARAMS,
    )(win)


# ---------------------------------------------------------------------------
# Round-3 production pipeline: PREBUILT true-layout diagonals.
#
# The per-step dense build (251 us/step of VPU barrels) is key material, not
# per-step data: fhe/devkeygen.py materializes all n reversed-diagonal dense
# blocks ONCE at keygen (rev_all int8 [n, (2*nt-1)*R*128, M*128], ~8 GB at
# STD128_OPT — streamed from HBM at ~19 us/step), in TRUE column order (the
# permuted-lane machinery existed only because Mosaic could not build int8
# tiles in true order in-kernel; XLA building them at keygen can).  The step
# then reduces to:  decompose (jnp) -> ONE [TB, nt*R*128] x [span, M*128]
# MXU dot per output tile with the limb combine fused -> an in-VMEM CMUX
# epilogue (rotations were 394 us/step as HBM-bound jnp rolls; in VMEM they
# are VPU-bound).  Real-hardware phase numbers: ROOFLINE.md §2.
# ---------------------------------------------------------------------------


def _window_matmul_true_kernel(digs_ref, rev_ref, out_ref, *, nt, RT, M, TB, Q):
    """Grid (b_chunks, nt): one [TB, nt*RT] x [nt*RT, M*TILE] int8 MXU dot
    per output N-tile (rev VMEM-resident), limb combine fused; TRUE column
    order throughout (prebuilt rev, no plane permutation)."""
    k = pl.program_id(1)
    win = rev_ref[pl.ds((nt - 1 - k) * RT, nt * RT), :]
    res = jax.lax.dot_general(
        digs_ref[...],
        win,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [TB, M*TILE]
    out_ref[...] = _combine_limbs_tile(res.reshape(TB, M // 4, 4, TILE), Q)


def window_matmul_true(
    digs_rows, rev_flat, R: int, Q: int, block_b: int = 1024,
    interpret: bool = False,
):
    """digs_rows int8 [B, nt*R*TILE] (pack_digits_rows layout);
    rev_flat int8 [(2*nt-1)*R*TILE, M*TILE] prebuilt TRUE-layout reversed
    diagonals -> int32 [B, M//4, N] limb-combined mod Q, true columns."""
    B, K = digs_rows.shape
    RT = R * TILE
    nt = K // RT
    N = nt * TILE
    MT = rev_flat.shape[1]
    M = MT // TILE
    TB = min(block_b, B)
    while B % TB:
        TB -= 1 if TB % 2 else TB // 2
    resident = rev_flat.shape[0] * MT  # rev int8
    per_chunk = 2 * TB * K + 4 * TB * MT + 2 * 4 * TB * (M // 4) * TILE
    assert resident + per_chunk <= VMEM_PARAMS.vmem_limit_bytes, (
        f"window_matmul_true VMEM estimate {(resident + per_chunk) >> 20} MiB "
        f"exceeds budget; reduce block_b (got {TB})"
    )
    kernel = functools.partial(
        _window_matmul_true_kernel, nt=nt, RT=RT, M=M, TB=TB, Q=Q
    )
    return pl.pallas_call(
        kernel,
        grid=(B // TB, nt),
        in_specs=[
            pl.BlockSpec((TB, K), lambda c, k: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (rev_flat.shape[0], MT), lambda c, k: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (TB, M // 4, TILE), lambda c, k: (c, 0, k), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, M // 4, N), jnp.int32),
        interpret=interpret,
        compiler_params=None if interpret else VMEM_PARAMS,
    )(digs_rows, rev_flat)


def _matmul_dec_true_kernel(
    acc_ref, rev_ref, out_ref, digs_ref, *, nt, R, M, TB, Q, B_g, d_used,
    g_shift,
):
    """Grid (B//TB,): gadget decompose + digit pack IN KERNEL (the jnp
    transpose/pack glue cost ~400 us/step at B=1024 — measured), then one
    window-span MXU dot per output tile with the limb combine fused.

    acc_ref  : [TB, 2, N] int32 accumulator (true layout)
    rev_ref  : [(2*nt-1)*R*TILE, M*TILE] int8 prebuilt diagonals (resident)
    out_ref  : [TB, M//4, N] int32 combined mod Q
    digs_ref : scratch [TB, nt*R*TILE] int8 (pack_digits_rows order)
    """
    RT = R * TILE
    for pp in range(2):
        col = acc_ref[:, pp, :]
        planes = _decompose_lanes(col, Q, B_g, d_used, g_shift)
        for dgt, plane in enumerate(planes):
            rr = pp * d_used + dgt
            for j in range(nt):
                digs_ref[:, j * RT + rr * TILE : j * RT + (rr + 1) * TILE] = (
                    plane[:, j * TILE : (j + 1) * TILE]
                )
    for k in range(nt):
        res = jax.lax.dot_general(
            digs_ref[...],
            rev_ref[pl.ds((nt - 1 - k) * RT, nt * RT), :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out_ref[:, :, pl.ds(k * TILE, TILE)] = _combine_limbs_tile(
            res.reshape(TB, M // 4, 4, TILE), Q
        )


def window_matmul_dec_true(
    acc, rev_flat, R: int, Q: int, B_g: int, d_used: int, g_shift: int,
    block_b: int = 1024, interpret: bool = False,
):
    """acc int32 [B, 2, N] -> P4 int32 [B, M//4, N] mod Q: decompose +
    pack + window matmul + limb combine in ONE kernel (true layout)."""
    B, _, N = acc.shape
    nt = N // TILE
    RT = R * TILE
    MT = rev_flat.shape[1]
    M = MT // TILE
    TB = min(block_b, B)
    while B % TB:
        TB -= 1 if TB % 2 else TB // 2
    resident = rev_flat.shape[0] * MT
    per_chunk = (
        2 * 4 * TB * 2 * N  # acc in (double-buffered)
        + TB * nt * RT  # digs scratch
        + 4 * TB * MT  # dot result
        + 2 * 4 * TB * (M // 4) * N  # out
    )
    assert resident + per_chunk <= VMEM_PARAMS.vmem_limit_bytes, (
        f"window_matmul_dec_true VMEM estimate "
        f"{(resident + per_chunk) >> 20} MiB exceeds budget (TB={TB})"
    )
    kernel = functools.partial(
        _matmul_dec_true_kernel, nt=nt, R=R, M=M, TB=TB, Q=Q, B_g=B_g,
        d_used=d_used, g_shift=g_shift,
    )
    return pl.pallas_call(
        kernel,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((TB, 2, N), lambda c: (c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (rev_flat.shape[0], MT), lambda c: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (TB, M // 4, N), lambda c: (c, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, M // 4, N), jnp.int32),
        scratch_shapes=[pltpu.VMEM((TB, nt * RT), jnp.int8)],
        interpret=interpret,
        compiler_params=None if interpret else VMEM_PARAMS,
    )(acc, rev_flat)


def _cmux_epilogue_true_kernel(
    P_ref, acc_ref, amt_ref, out_ref, *, N, Q, TB, b_lo
):
    """In-VMEM per-gate monomial rotations + CMUX add, TRUE layout:
    out = red31(acc + X^amt0*P0 + X^amt1*P1 + 2Q - P0 - P1).

    Half-barrel (cyclic roll over N + negacyclic sign fix — same math as
    boot.monomial_rotate, bit-exact).  Batch sub-chunks bound the barrel's
    live temporaries (Mosaic register pressure).  ``b_lo`` barrel rounds
    are skipped: rotation amounts come from the q -> 2N mod switch, so
    their low log2(2N/q) bits are always zero.

    P_ref   : [TB, 2(part), 2(out), N] int32 in [0, Q)
    acc_ref : [TB, 2, N] int32
    amt_ref : [TB, 2, TILE] int32 lane-replicated (c_pos, a_col) in [0, 2N)
    """
    EB = math.gcd(TB, 64)  # always divides TB: no silently-dropped tail rows
    lane = jax.lax.broadcasted_iota(jnp.int32, (EB, 2, 2, N), 3)

    def body(i, carry):
        s0 = i * EB
        P = P_ref[pl.ds(s0, EB)]  # [EB, 2, 2, N]
        amt = jnp.concatenate(
            [amt_ref[pl.ds(s0, EB)]] * (N // TILE), axis=-1
        )  # [EB, 2, N]
        c = amt[:, :, None, :]  # [EB, 2, 1, N] broadcast over out axis
        cp = c & (N - 1)
        x = P
        for b in range(b_lo, int(np.log2(N))):
            sh = 1 << b
            rolled = pltpu.roll(x, sh, 3)
            x = jnp.where((cp & sh) != 0, rolled, x)
        wrap = (lane < cp) ^ (c >= N)
        rot = jnp.where(wrap, jnp.where(x == 0, 0, Q - x), x)
        y = (
            acc_ref[pl.ds(s0, EB)]
            + rot[:, 0]
            + rot[:, 1]
            + (2 * Q - P[:, 0] - P[:, 1])
        )
        out_ref[pl.ds(s0, EB)] = modmath.red31(y, Q)
        return carry

    jax.lax.fori_loop(0, TB // EB, body, 0)


def cmux_epilogue_true(
    P, acc, amt, Q: int, block_b: int = 1024, interpret: bool = False,
    zero_low_bits: int = 0,
):
    """P int32 [B, 2, 2, N] mod Q; acc [B, 2, N]; amt [B, 2] in [0, 2N)
    -> int32 [B, 2, N] = red31(acc + rot(P0,amt0) + rot(P1,amt1) + 2Q-P0-P1).
    Bit-exact vs the jnp path (boot.monomial_rotate + red31).
    ``zero_low_bits``: statically-known zero low bits of every amt entry
    (= log2(2N/q) after the gate mod switch) — their barrel rounds skip."""
    B, _, _, N = P.shape
    TB = min(block_b, B)
    while B % TB:
        TB -= 1 if TB % 2 else TB // 2
    amt_lane = jnp.broadcast_to(amt[:, :, None], (B, 2, TILE))
    kernel = functools.partial(
        _cmux_epilogue_true_kernel, N=N, Q=Q, TB=TB, b_lo=zero_low_bits
    )
    return pl.pallas_call(
        kernel,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((TB, 2, 2, N), lambda c: (c, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 2, N), lambda c: (c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 2, TILE), lambda c: (c, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, 2, N), lambda c: (c, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2, N), jnp.int32),
        interpret=interpret,
        compiler_params=None if interpret else VMEM_PARAMS,
    )(P, acc, amt_lane)


FUSE_PARTS = os.environ.get("OECE_ROT_FUSEPARTS", "0") == "1"


def _rot_diff_decompose(
    acc_ref, get_amt, digs_ref, *, nt, R, TB, Q, B_g, d_used, g_shift, N,
    b_lo,
):
    """Shared rotate-diff + decompose body of the rotated-difference step
    (used by BOTH _rot_step_true_kernel and _rot_megakernel — one copy of
    the barrel/wrap/decompose logic keeps scan and megakernel bit-aligned).

    Per part p: d = (X^{c_p} * acc - acc) mod Q, gadget-decomposed into the
    part-interleaved digit scratch (column j*2RT + p*RT + rr*TILE).
    ``get_amt(s0, EB, part)`` returns [EB, 1, N]-broadcastable amounts.

    OECE_ROT_FUSEPARTS=1 merges the two parts' chunk loops so the
    accumulator chunk is read once and the loop/mask overhead is shared —
    bit-identical values, different instruction schedule.
    """
    RT = R * TILE
    RT2 = 2 * RT
    EB = math.gcd(TB, 64)  # barrel sub-chunks (Mosaic register pressure)
    lane = jax.lax.broadcasted_iota(jnp.int32, (EB, 2, N), 2)

    def one_part(A, s0, part):
        c = get_amt(s0, EB, part)
        cp = c & (N - 1)
        x = A
        for b in range(b_lo, int(np.log2(N))):
            sh = 1 << b
            rolled = pltpu.roll(x, sh, 2)
            x = jnp.where((cp & sh) != 0, rolled, x)
        wrap = (lane < cp) ^ (c >= N)
        rot = jnp.where(wrap, jnp.where(x == 0, 0, Q - x), x)
        d = rot - A
        d = jnp.where(d < 0, d + Q, d)  # (X^c - 1)*acc mod Q
        for pp in range(2):
            planes = _decompose_lanes(d[:, pp, :], Q, B_g, d_used, g_shift)
            for dgt, plane in enumerate(planes):
                rr = pp * d_used + dgt
                for j in range(nt):
                    col = j * RT2 + part * RT + rr * TILE
                    digs_ref[pl.ds(s0, EB), col : col + TILE] = (
                        plane[:, j * TILE : (j + 1) * TILE]
                    )

    if FUSE_PARTS:

        def rot_dec_both(i, carry):
            s0 = i * EB
            A = acc_ref[pl.ds(s0, EB)]  # [EB, 2, N] read ONCE for both parts
            one_part(A, s0, 0)
            one_part(A, s0, 1)
            return carry

        jax.lax.fori_loop(0, TB // EB, rot_dec_both, 0)
        return

    for part in (0, 1):

        def rot_dec_body(i, carry, part=part):
            s0 = i * EB
            A = acc_ref[pl.ds(s0, EB)]  # [EB, 2, N]
            one_part(A, s0, part)
            return carry

        jax.lax.fori_loop(0, TB // EB, rot_dec_body, 0)


def _rot_step_true_kernel(
    acc_ref, rev2_ref, amt_ref, out_ref, digs_ref,
    *, nt, R, TB, Q, B_g, d_used, g_shift, N, b_lo,
):
    """ONE fully-fused GINX CMUX step in the CGGI rotated-difference form
    (ROOFLINE §4 lever 2; golden twin: golden.blind_rotate_ginx_rot):

        out = red31(acc + K_pos ⊡ dec(X^c0·acc - acc)
                        + K_neg ⊡ dec(X^c1·acc - acc))

    The per-gate monomial rotation moves BEFORE the gadget decomposition
    (applied to the accumulator in VMEM), so the r3 pipeline's second
    kernel — post-matmul rotation + CMUX subtraction, with its [B, 4, N]
    HBM round-trip of the product planes — disappears entirely.  MXU work
    is unchanged, issued as ONE [TB, nt*2RT] x [nt*2RT, 8*T] dot per
    output tile: the two secret parts' digits interleave at the
    window-block level, matching devkeygen's interleaved rev2 rows.

    acc_ref  : [TB, 2, N] int32 in [0, Q)
    rev2_ref : [(2*nt-1)*2*R*TILE, 8*TILE] int8 part-interleaved prebuilt
               reversed diagonals (row (d',p,r,u) at d'*2RT+p*RT+r*T+u)
    amt_ref  : [TB, 2, TILE] int32 lane-replicated (c_pos, c_neg) in [0,2N)
    digs_ref : scratch int8 [TB, nt*2*R*TILE]
    ``b_lo`` barrel rounds skip (rotation amounts are multiples of 2N/q).
    """
    RT2 = 2 * R * TILE

    def get_amt(s0, EB, part):  # lane-replicated [TB, 2, TILE] input
        return jnp.concatenate(
            [amt_ref[pl.ds(s0, EB), part : part + 1]] * (N // TILE), axis=-1
        )  # [EB, 1, N]

    _rot_diff_decompose(
        acc_ref, get_amt, digs_ref, nt=nt, R=R, TB=TB, Q=Q, B_g=B_g,
        d_used=d_used, g_shift=g_shift, N=N, b_lo=b_lo,
    )

    for k in range(nt):
        res = jax.lax.dot_general(
            digs_ref[...],
            rev2_ref[pl.ds((nt - 1 - k) * RT2, nt * RT2), :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [TB, 8*TILE]; both parts' limb accumulators sum in the dot
        comb = _combine_limbs_tile(res.reshape(TB, 2, 4, TILE), Q)  # [TB,2,T]
        y = acc_ref[:, :, pl.ds(k * TILE, TILE)] + comb  # < 2Q
        out_ref[:, :, pl.ds(k * TILE, TILE)] = modmath.red31(y, Q)


def rot_step_true(
    acc, rev2, amt, Q: int, B_g: int, d_used: int, g_shift: int,
    block_b: int = 1024, interpret: bool = False, zero_low_bits: int = 0,
):
    """acc int32 [B, 2, N]; rev2 int8 [(2*nt-1)*2*R*T, 8*T]
    (part-interleaved, devkeygen layout "rev2"); amt int32 [B, 2] in
    [0, 2N) -> new accumulator [B, 2, N].  One pallas_call per CMUX step:
    rotate-diff + decompose + matmul + combine + add fused.
    Bit-exact vs golden.blind_rotate_ginx_rot's step on matching keys."""
    B, _, N = acc.shape
    nt = N // TILE
    R = 2 * d_used
    RT2 = 2 * R * TILE
    assert rev2.shape[0] == (2 * nt - 1) * RT2, (rev2.shape, RT2)
    MT = rev2.shape[1]
    TB = min(block_b, B)
    while B % TB:
        TB -= 1 if TB % 2 else TB // 2
    resident = rev2.shape[0] * MT  # rev2 int8
    per_chunk = (
        2 * 4 * TB * 2 * N  # acc in (double-buffered)
        + TB * nt * RT2  # digit scratch
        + 2 * 4 * TB * MT  # dot results
        + 2 * 4 * TB * 2 * N  # out
    )
    assert resident + per_chunk <= VMEM_PARAMS.vmem_limit_bytes, (
        f"rot_step_true VMEM estimate {(resident + per_chunk) >> 20} MiB "
        f"exceeds budget (TB={TB})"
    )
    amt_lane = jnp.broadcast_to(amt[:, :, None], (B, 2, TILE))
    kernel = functools.partial(
        _rot_step_true_kernel, nt=nt, R=R, TB=TB, Q=Q, B_g=B_g,
        d_used=d_used, g_shift=g_shift, N=N, b_lo=zero_low_bits,
    )
    return pl.pallas_call(
        kernel,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((TB, 2, N), lambda c: (c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (rev2.shape[0], MT), lambda c: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((TB, 2, TILE), lambda c: (c, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, 2, N), lambda c: (c, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2, N), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((TB, nt * RT2), jnp.int8),
        ],
        interpret=interpret,
        compiler_params=None if interpret else VMEM_PARAMS,
    )(acc, rev2, amt_lane)


def build_rev_true_host(perm_ext: np.ndarray, R: int, N: int) -> np.ndarray:
    """Host/NumPy reference of devkeygen's prebuilt TRUE-layout reversed
    diagonals: perm_ext int8 [RM, 2N] (r-major, m=(part,out,limb) minor)
    -> rev int8 [(2*nt-1)*R*TILE, M*TILE].

    rev[d'*RT + r*TILE + u, m*TILE + t] = perm_ext[r*M + m,
        ((nt-1-d')*TILE + t - u) mod 2N].
    """
    RM, two_n = perm_ext.shape
    M = RM // R
    nt = N // TILE
    ndiag = 2 * nt - 1
    dp = np.arange(ndiag)[:, None, None]
    u = np.arange(TILE)[None, :, None]
    t = np.arange(TILE)[None, None, :]
    idx = ((nt - 1 - dp) * TILE + t - u) % two_n  # [ndiag, T, T]
    g = perm_ext[:, idx]  # [RM, ndiag, T, T]
    g = g.reshape(R, M, ndiag, TILE, TILE)
    return np.ascontiguousarray(
        g.transpose(2, 0, 3, 1, 4).reshape(ndiag * R * TILE, M * TILE)
    )


# ---------------------------------------------------------------------------
# The AP megakernel: ALL n*d_r binary-base AP steps in ONE pallas_call.
# (The GINX rotation megakernel that shared these phase helpers is deleted —
# VERDICT r3 #6: superseded by the prebuilt rev/rev2 single-kernel steps.)
# Step index is a GRID dimension: windows/bits stream in per step via
# BlockSpec index maps (double-buffered DMA); the accumulator lives in a
# revisited input/output-aliased block that stays VMEM-resident across the
# whole rotation.
# ---------------------------------------------------------------------------


def _build_rev_body(win_ref, rev_ref, nt, R, M):
    """Shared megakernel phase: windows block [1, ndiag, 4, RMW] -> rev.

    The diagonal loop is a ``fori_loop`` (not a Python unroll): the body
    compiles ONCE, which is what keeps the megakernel's Mosaic program small
    enough to compile in minutes instead of tens of minutes (VERDICT r2 #1).
    The plane unpack is vectorized over the whole window block before the
    per-tile slicing."""
    TI = TILE
    RT = R * TILE
    ndiag = 2 * nt - 1
    RMW = R * M * SPANW
    roww = jax.lax.broadcasted_iota(jnp.int32, (TI, RMW), 0)
    trueidx = 4 * (roww & 31) + (roww >> 5)
    amount = TI - trueidx
    v = amount & 3
    wsh = amount >> 2

    def body(d, carry):
        x = jnp.broadcast_to(win_ref[0, d, 0, :], (TI, RMW)).astype(jnp.uint32)
        for ph in (1, 2, 3):
            xp = jnp.broadcast_to(win_ref[0, d, ph, :], (TI, RMW)).astype(
                jnp.uint32
            )
            x = jnp.where(v == ph, xp, x)
        for b in range(6):
            shw = 1 << b
            rolled = pltpu.roll(x, RMW - shw, 1)
            x = jnp.where((wsh & shw) != 0, rolled, x)
        planes = [
            ((x >> jnp.uint32(8 * j)) & jnp.uint32(0xFF)).astype(jnp.int32)
            for j in range(4)
        ]
        row0 = (ndiag - 1 - d) * RT
        for r in range(R):
            for m in range(M):
                w0 = (r * M + m) * SPANW
                tile8 = jnp.concatenate(
                    [pln[:, w0 : w0 + TKW] for pln in planes], axis=1
                ).astype(jnp.int8)
                rev_ref[pl.ds(row0 + r * TI, TI), m * TILE : (m + 1) * TILE] = (
                    tile8
                )
        return carry

    jax.lax.fori_loop(0, ndiag, body, 0)


def _decompose_body(out_ref, digs_ref, nt, R, Q, B_g, d_used, g_shift):
    """Shared megakernel phase: resident acc -> digit rows scratch."""
    RT = R * TILE
    for p in range(2):
        col = out_ref[:, p, :]
        planes = _decompose_lanes(col, Q, B_g, d_used, g_shift)
        for dgt, plane in enumerate(planes):
            rr = p * d_used + dgt
            for j in range(nt):
                digs_ref[:, j * RT + rr * TILE : j * RT + (rr + 1) * TILE] = (
                    plane[:, j * TILE : (j + 1) * TILE]
                )


def _matmul_body(digs_ref, rev_ref, pacc_ref, nt, R, M, TB, Q):
    """Shared megakernel phase: MXU contraction per output tile (static k)."""
    RT = R * TILE
    for k in range(nt):
        res = jax.lax.dot_general(
            digs_ref[...],
            rev_ref[(nt - 1 - k) * RT : (2 * nt - 1 - k) * RT, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        pacc_ref[:, :, k * TILE : (k + 1) * TILE] = _combine_limbs_tile(
            res.reshape(TB, M // 4, 4, TILE), Q
        )


def _rot_megakernel(
    rev2_ref, amt_ref, accin_ref, out_ref, digs_ref,
    *, nt, R, TB, Q, B_g, d_used, g_shift, N, b_lo,
):
    """GINX rotated-difference step with the STEP INDEX AS A GRID DIM:
    the accumulator lives in a revisited VMEM block across all n steps
    (zero per-step kernel-launch overhead — the cost that dominates
    small-batch circuit levels), each step's interleaved rev2 diagonals
    stream in via the BlockSpec index map (double-buffered DMA).  The
    in-cell math is _rot_step_true_kernel's, reading/writing the resident
    block.

    rev2_ref : [1, (2*nt-1)*2*R*TILE, 8*TILE] — this step's diagonals
    amt_ref  : [1, TB, 2] — this step's (c_pos, c_neg) per gate
    accin_ref: [TB, 2, N] — initial accumulator (read at step 0 only)
    out_ref  : [TB, 2, N] — resident accumulator (read + write)
    """
    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = accin_ref[...]

    RT2 = 2 * R * TILE

    def get_amt(s0, EB, part):  # [1, TB, 2] streamed input
        return jnp.broadcast_to(
            amt_ref[0, pl.ds(s0, EB), part : part + 1], (EB, N)
        )[:, None, :]

    _rot_diff_decompose(
        out_ref, get_amt, digs_ref, nt=nt, R=R, TB=TB, Q=Q, B_g=B_g,
        d_used=d_used, g_shift=g_shift, N=N, b_lo=b_lo,
    )

    for k in range(nt):
        res = jax.lax.dot_general(
            digs_ref[...],
            rev2_ref[0, pl.ds((nt - 1 - k) * RT2, nt * RT2), :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        comb = _combine_limbs_tile(res.reshape(TB, 2, 4, TILE), Q)
        # per-tile read-then-write of the resident block: tile k's original
        # accumulator value is still unwritten when read here
        y = out_ref[:, :, pl.ds(k * TILE, TILE)] + comb  # < 2Q
        out_ref[:, :, pl.ds(k * TILE, TILE)] = modmath.red31(y, Q)


def _rot_megakernel_pipe(
    rev2_ref, amt_ref, accin_ref, out_ref, *scratch,
    nt, R, TB, H, Q, B_g, d_used, g_shift, N, b_lo, nsteps,
):
    """H-way software-pipelined rotated-difference megakernel (ROOFLINE §4's
    named lever: overlap the serialized VPU barrel/decompose phase with the
    MXU dots).  The batch block TB splits into H chunks, each with its OWN
    accumulator and digit scratch ref, so chunk h+1's rotate-diff+decompose
    (pure VPU) is syntactically independent of chunk h's matmul+combine
    (MXU-dominated) and Mosaic can schedule them concurrently:

        dec(0); [dec(1) | mm(0)]; [dec(2) | mm(1)]; ...; mm(H-1)

    Per step the ideal wall drops from dec_total + mm_total to
    dec_chunk + max(dec, mm)_total-ish — a ~2x bound when the phases are
    balanced (measured r4: ~480 us VPU + ~470 us MXU per B=1024 step).
    The accumulators live in scratch across ALL grid steps (copied in from
    accin at step 0, flushed to out_ref at the last step); rev2/amt stream
    per step via their index maps exactly like _rot_megakernel.
    """
    accs = scratch[:H]
    digss = scratch[H : 2 * H]
    TBH = TB // H
    RT2 = 2 * R * TILE

    @pl.when(pl.program_id(1) == 0)
    def _():
        for h in range(H):
            accs[h][...] = accin_ref[pl.ds(h * TBH, TBH)]

    def make_amt(h):
        def get_amt(s0, EB, part):  # [1, TB, 2] streamed input
            return jnp.broadcast_to(
                amt_ref[0, pl.ds(h * TBH + s0, EB), part : part + 1], (EB, N)
            )[:, None, :]

        return get_amt

    def dec(h):
        _rot_diff_decompose(
            accs[h], make_amt(h), digss[h], nt=nt, R=R, TB=TBH, Q=Q,
            B_g=B_g, d_used=d_used, g_shift=g_shift, N=N, b_lo=b_lo,
        )

    def mm(h):
        for k in range(nt):
            res = jax.lax.dot_general(
                digss[h][...],
                rev2_ref[0, pl.ds((nt - 1 - k) * RT2, nt * RT2), :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            comb = _combine_limbs_tile(res.reshape(TBH, 2, 4, TILE), Q)
            y = accs[h][:, :, pl.ds(k * TILE, TILE)] + comb  # < 2Q
            accs[h][:, :, pl.ds(k * TILE, TILE)] = modmath.red31(y, Q)

    dec(0)
    for h in range(H):
        if h + 1 < H:
            dec(h + 1)  # emitted before mm(h): both are independent
        mm(h)

    @pl.when(pl.program_id(1) == nsteps - 1)
    def _():
        for h in range(H):
            out_ref[pl.ds(h * TBH, TBH)] = accs[h][...]


def blind_rotate_rot_megakernel(
    acc, rev2_all, a2N, Q: int, B_g: int, d_used: int, g_shift: int,
    block_b: int = 1024, interpret: bool = False, zero_low_bits: int = 0,
    pipeline: int = 0,
):
    """The whole rotated-difference GINX rotation as ONE pallas_call.

    acc      : int32 [B, 2, N]
    rev2_all : int8 [n, (2*nt-1)*2*R*T, 8*T] (devkeygen layout "rev2")
    a2N      : int32 [B, n] in [0, 2N)
    pipeline : 0/1 = the single-chunk kernel; H>1 = H-way VPU/MXU
               software pipelining (_rot_megakernel_pipe); H must divide
               the batch block.
    Bit-exact equal to scanning boot._external_cmux_rot over the steps.
    """
    B, _, N = acc.shape
    nsteps = rev2_all.shape[0]
    nt = N // TILE
    R = 2 * d_used
    RT2 = 2 * R * TILE
    assert rev2_all.shape[1] == (2 * nt - 1) * RT2, rev2_all.shape
    MT = rev2_all.shape[2]
    TB = min(block_b, B)
    while B % TB:
        TB -= 1 if TB % 2 else TB // 2
    two_n = 2 * N
    c_pos = (two_n - a2N) & (two_n - 1)
    amt = jnp.transpose(jnp.stack([c_pos, a2N], axis=2), (1, 0, 2))  # [n,B,2]
    H = int(pipeline) if pipeline and pipeline > 1 else 0
    if H and TB % H:
        H = 0  # batch block not divisible by the pipeline depth
    resident = 2 * rev2_all.shape[1] * MT  # step block, double-buffered
    per_chunk = (
        2 * 4 * TB * 2 * N  # accin + out
        + TB * nt * RT2  # digit scratch
        + 2 * 4 * TB * MT  # dot results
        + (4 * TB * 2 * N if H else 0)  # pipelined acc scratch
    )
    assert resident + per_chunk <= VMEM_PARAMS.vmem_limit_bytes, (
        f"rot megakernel VMEM estimate {(resident + per_chunk) >> 20} MiB "
        f"exceeds budget (TB={TB})"
    )
    if H:
        kernel = functools.partial(
            _rot_megakernel_pipe, nt=nt, R=R, TB=TB, H=H, Q=Q, B_g=B_g,
            d_used=d_used, g_shift=g_shift, N=N, b_lo=zero_low_bits,
            nsteps=nsteps,
        )
        scratch = [
            pltpu.VMEM((TB // H, 2, N), jnp.int32) for _ in range(H)
        ] + [
            pltpu.VMEM((TB // H, nt * RT2), jnp.int8) for _ in range(H)
        ]
    else:
        kernel = functools.partial(
            _rot_megakernel, nt=nt, R=R, TB=TB, Q=Q, B_g=B_g, d_used=d_used,
            g_shift=g_shift, N=N, b_lo=zero_low_bits,
        )
        scratch = [pltpu.VMEM((TB, nt * RT2), jnp.int8)]
    return pl.pallas_call(
        kernel,
        grid=(B // TB, nsteps),
        in_specs=[
            pl.BlockSpec(
                (1, rev2_all.shape[1], MT), lambda c, i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, TB, 2), lambda c, i: (i, c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 2, N), lambda c, i: (c, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TB, 2, N), lambda c, i: (c, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 2, N), jnp.int32),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=None if interpret else VMEM_PARAMS,
    )(rev2_all, amt, acc)


def _ap_megakernel(
    win_ref, bit_ref, accin_ref, out_ref, rev_ref, digs_ref, pacc_ref,
    *, nt, R, M, TB, Q, B_g, d_used, g_shift, N,
):
    """AP (binary base) step: acc <- bit ? EP(acc, K1_ij) : acc.

    The digit bit of the public rotation amount selects, per gate, between
    the shared-key external product (one MXU matmul, M = out*L = 8 planes)
    and the unchanged accumulator — no per-gate rotation (the monomial
    X^{2^j s_i} lives in the key).
    bit_ref : [1, TB, 1] int32 — this step's public digit bit per gate.
    """
    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = accin_ref[...]

    _build_rev_body(win_ref, rev_ref, nt, R, M)
    _decompose_body(out_ref, digs_ref, nt, R, Q, B_g, d_used, g_shift)
    _matmul_body(digs_ref, rev_ref, pacc_ref, nt, R, M, TB, Q)
    EB = math.gcd(TB, 128)  # divisor of TB: no dropped tail rows

    def sel_body(i, carry):
        s0 = i * EB
        bit = jnp.broadcast_to(bit_ref[0, pl.ds(s0, EB), 0:1], (EB, N))
        P = pacc_ref[pl.ds(s0, EB)]  # [EB, 2, N] (out = a', b')
        acc = out_ref[pl.ds(s0, EB)]
        out_ref[pl.ds(s0, EB)] = jnp.where(bit[:, None, :] != 0, P, acc)
        return carry

    jax.lax.fori_loop(0, TB // EB, sel_body, 0)


def blind_rotate_ap_megakernel(
    accp: jnp.ndarray,
    wins: jnp.ndarray,
    bits: jnp.ndarray,
    *,
    R: int,
    Q: int,
    B_g: int,
    d_used: int,
    g_shift: int,
    block_b: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """The whole binary-base AP blind rotation as one pallas_call.

    accp : int32 [B, 2, N] accumulator in permute_lanes layout
    wins : int32 [n*d_r, 2*nt-1, 4, R*Ma*SPANW] v=1 rotation-key windows
    bits : int32 [n*d_r, B, 1] public digit bits of -a_i (base 2)
    """
    B, _, N = accp.shape
    nsteps = wins.shape[0]
    nt = N // TILE
    ndiag, nph, rmw = wins.shape[1:]
    assert ndiag == 2 * nt - 1 and nph == 4
    M = rmw // SPANW // R
    RT = R * TILE
    TB = min(block_b, B)
    while B % TB:
        TB -= 1 if TB % 2 else TB // 2
    kernel = functools.partial(
        _ap_megakernel,
        nt=nt, R=R, M=M, TB=TB, Q=Q, B_g=B_g, d_used=d_used,
        g_shift=g_shift, N=N,
    )
    return pl.pallas_call(
        kernel,
        grid=(B // TB, nsteps),
        in_specs=[
            pl.BlockSpec(
                (1, ndiag, nph, rmw), lambda c, i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, TB, 1), lambda c, i: (i, c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 2, N), lambda c, i: (c, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TB, 2, N), lambda c, i: (c, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 2, N), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((ndiag * RT, M * TILE), jnp.int8),
            pltpu.VMEM((TB, nt * RT), jnp.int8),
            pltpu.VMEM((TB, M // 4, N), jnp.int32),
        ],
        input_output_aliases={2: 0},
        interpret=interpret,
        compiler_params=None if interpret else VMEM_PARAMS,
    )(wins, bits, accp)


def pack_digits_for_pallas(digs: jnp.ndarray) -> jnp.ndarray:
    """int8 [R, B, N] -> [N/128, B, R*128] (i-tile-major for the kernel)."""
    R, B, N = digs.shape
    nt = N // TILE
    d = digs.reshape(R, B, nt, TILE)
    return jnp.transpose(d, (2, 1, 0, 3)).reshape(nt, B, R * TILE)


def pack_digits_rows(digs: jnp.ndarray) -> jnp.ndarray:
    """int8 [R, B, N] -> [B, (N/128)*R*128] (window-matmul layout: column
    j*R*128 + r*128 + t is digit row r of i-tile j)."""
    R, B, N = digs.shape
    nt = N // TILE
    d = digs.reshape(R, B, nt, TILE)
    return jnp.transpose(d, (1, 2, 0, 3)).reshape(B, nt * R * TILE)


def pack_keys_for_pallas(keys_ext_int8: np.ndarray) -> np.ndarray:
    """[RM, 2N] int8 (negacyclic-extended key) -> [2*nt-1, 4, RM, SPANW]
    int32 packed byte windows.

    Window (d, v) starts at byte ((d - (nt-1) - 1) * TILE) mod 2N, plus the
    byte phase v, over the cyclic 2N-extended sequence.
    """
    k = np.asarray(keys_ext_int8)
    RM, two_n = k.shape
    N = two_n // 2
    nt = N // TILE
    reps = -(-(2 * N + SPAN + 4) // two_n) + 1
    tiled = np.concatenate([k] * reps, axis=-1)  # cyclic extension
    wins = np.empty((2 * nt - 1, 4, RM, SPAN), dtype=np.int8)
    for d in range(2 * nt - 1):
        start = ((d - (nt - 1) - 1) * TILE) % (2 * N)
        for v in range(4):
            wins[d, v] = tiled[:, start + v : start + v + SPAN]
    b = wins.astype(np.uint8).astype(np.uint32)
    w = b[..., 0::4] | (b[..., 1::4] << 8) | (b[..., 2::4] << 16) | (b[..., 3::4] << 24)
    return w.astype(np.int32).reshape(2 * nt - 1, 4, RM * SPANW)


def negacyclic_matmul_reference(digs, keys_ext):
    """jnp gather reference of the same contraction (tests/CPU path).

    digs int8 [R, B, N]; keys_ext int8 [R*M, 2N] (UNPACKED) -> int32 [B, M, N].
    """
    R, B, N = digs.shape
    RM = keys_ext.shape[0]
    M = RM // R
    keys = keys_ext.reshape(R, M, 2 * N)
    i = jnp.arange(N, dtype=jnp.int32)
    idx = (i[None, :] - i[:, None]) % (2 * N)  # [i, k]
    dense = keys[..., idx]  # [R, M, N(i), N(k)]
    return jnp.einsum(
        "rbi,rmik->bmk", digs, dense, preferred_element_type=jnp.int32
    )
