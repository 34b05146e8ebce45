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

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128  # TI = TK = 128
SPAN = 2 * TILE  # window bytes; net shift + read never exceeds 255
SPANW = SPAN // 4  # packed int32 words per window
TKW = TILE // 4  # words per output tile


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
    """
    i_idx = pl.program_id(1)
    TK = TILE
    res = jax.lax.dot_general(
        digs_ref[0],
        dense_ref[0],
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


def build_diagonals_pallas(keys_windows, R: int, interpret: bool = False):
    """keys_windows int32 [ndiag, 4, R*M*SPANW] -> dense int8
    [ndiag, R*TILE, M*TILE] (built once per bootstrap step)."""
    ndiag, nph, rmw = keys_windows.shape
    RM = rmw // SPANW
    M = RM // R
    kernel = functools.partial(_build_diag_kernel, R=R, M=M)
    return pl.pallas_call(
        kernel,
        grid=(ndiag,),
        in_specs=[
            pl.BlockSpec((1, 4, rmw), lambda d: (d, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, R * TILE, M * TILE), lambda d: (d, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((ndiag, R * TILE, M * TILE), jnp.int8),
        interpret=interpret,
    )(keys_windows)


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
    )(digs_tiled, dense_all)


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
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * R * M * N,
            bytes_accessed=B * N * R + ndiag * 4 * RM * SPAN + B * M * N * 4,
            transcendentals=0,
        ),
    )(digs_tiled, keys_windows)
    # undo the per-tile plane permutation: column j*TKW+w -> 4w+j
    out5 = out.reshape(B, M, nt, 4, TKW)
    return jnp.transpose(out5, (0, 1, 2, 4, 3)).reshape(B, M, N)


def pack_digits_for_pallas(digs: jnp.ndarray) -> jnp.ndarray:
    """int8 [R, B, N] -> [N/128, B, R*128] (i-tile-major for the kernel)."""
    R, B, N = digs.shape
    nt = N // TILE
    d = digs.reshape(R, B, nt, TILE)
    return jnp.transpose(d, (2, 1, 0, 3)).reshape(nt, B, R * TILE)


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
