"""Pallas TPU kernels for the FHEW hot path.

The single hot operation of the whole framework (SURVEY.md §3.5: the blind
rotation inside EvalBinGate is ~99% of encrypted runtime) is the negacyclic
"digits × RGSW-key" contraction

    prod[b, po, l, k] = sum_{r,i} digs[b, i, r] * key[r, po, l, (k - i) mod 2N]

where the key's index arithmetic encodes multiplication by a negacyclic
matrix.  XLA can only express this with a 134 MB gather per bootstrap step,
which lowers catastrophically on TPU.  This kernel instead materializes the
negacyclic tiles *in VMEM* with a log-depth barrel shifter (masked
``pltpu.roll``) and runs the contraction on the MXU as int8 matmuls with
exact int32 accumulation.

Shapes (STD128: R = 2*d_g = 8 digit rows, PO = parts*out = 4, L = 4 limbs):
    digs : int8 [B, N, R]      (note (i, r) minor order — matches the tile)
    keys : int8 [R*PO*L, 4N]   (the 2N negacyclic-extended key, doubled again
                                so every window read is a plain slice)
    out  : int32 [B, PO, L, N]

The kernel is numerically exact and is differentially tested against the
jnp gather formulation (tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128  # TI = TK = 128
SPAN = 2 * TILE  # barrel window: covers i' + k' <= 254 < 256


def _negacyclic_kernel(digs_ref, keys_ref, out_ref, dense_ref, *, N, R, PO, L, TB):
    """Grid (k_tiles, i_tiles); i innermost so ``out`` stays resident.

    digs_ref  : [TB, TILE, R] int8      (block at (0, i, 0))
    keys_ref  : [R*PO*L, 4N] int8       (full)
    out_ref   : [TB, PO*L, TILE] int32  (block at (0, 0, k))
    dense_ref : scratch [TILE, R, PO*L, TILE] int8
    """
    k_idx = pl.program_id(0)
    i_idx = pl.program_id(1)
    TI = TK = TILE

    # delta = (k0 - i0) mod 2N; W[t] = keys[.., delta + t], t < SPAN.
    delta = (k_idx * TK - i_idx * TI + 2 * N) % (2 * N)
    row = jax.lax.broadcasted_iota(jnp.int32, (TI, SPAN), 0)

    for r in range(R):
        for m in range(PO * L):
            w = keys_ref[r * PO * L + m : r * PO * L + m + 1, pl.ds(delta, SPAN)]
            x = jnp.broadcast_to(w, (TI, SPAN))
            # barrel shift: row i' reads w[i' + t]
            for b in range(7):  # shifts 1..64 cover i' in [0, 128)
                sh = 1 << b
                rolled = pltpu.roll(x, SPAN - sh, 1)
                x = jnp.where((row & sh) != 0, rolled, x)
            dense_ref[:, r, m, :] = x[:, :TK]

    # ---- MXU contraction -------------------------------------------------
    digs = digs_ref[:].reshape(TB, TI * R)
    dense = dense_ref[:].reshape(TI * R, PO * L * TK)
    res = jax.lax.dot_general(
        digs,
        dense,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [TB, PO*L*TK]
    res = res.reshape(TB, PO * L, TK)

    @pl.when(i_idx == 0)
    def _():
        out_ref[...] = res

    @pl.when(i_idx != 0)
    def _():
        out_ref[...] = out_ref[...] + res


@functools.partial(jax.jit, static_argnames=("PO", "L", "interpret"))
def negacyclic_matmul_pallas(digs, keys4n, PO: int, L: int, interpret: bool = False):
    """digs int8 [B, N, R]; keys4n int8 [R*PO*L, 4N] -> int32 [B, PO*L, N].

    Exact: |sum| <= R*N*128*128 = 2**27 for R=8, N=1024.
    """
    B, N, R = digs.shape
    RM, four_n = keys4n.shape
    assert four_n == 4 * N and RM == R * PO * L
    assert N % TILE == 0
    nt = N // TILE
    kernel = functools.partial(_negacyclic_kernel, N=N, R=R, PO=PO, L=L, TB=B)
    return pl.pallas_call(
        kernel,
        grid=(nt, nt),
        in_specs=[
            pl.BlockSpec((B, TILE, R), lambda k, i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R * PO * L, 4 * N), lambda k, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (B, PO * L, TILE), lambda k, i: (0, 0, k), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, PO * L, N), jnp.int32),
        scratch_shapes=[pltpu.VMEM((TILE, R, PO * L, TILE), jnp.int8)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * R * PO * L * N,
            bytes_accessed=B * N * R + R * PO * L * 4 * N + B * PO * L * N * 4,
            transcendentals=0,
        ),
    )(digs, keys4n)


def negacyclic_matmul_reference(digs, keys4n, PO: int, L: int):
    """jnp gather reference of the same contraction (tests/CPU path)."""
    B, N, R = digs.shape
    keys = keys4n.reshape(R, PO * L, 4 * N)[..., : 2 * N]
    i = jnp.arange(N, dtype=jnp.int32)
    idx = (i[None, :] - i[:, None]) % (2 * N)  # [i, k]
    dense = keys[..., idx]  # [R, PO*L, N(i), N(k)]
    return jnp.einsum(
        "bir,rmik->bmk", digs, dense, preferred_element_type=jnp.int32
    )
