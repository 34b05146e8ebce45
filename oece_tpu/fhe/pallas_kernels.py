"""Pallas TPU kernels for the FHEW hot path.

The single hot operation of the whole framework (SURVEY.md §3.5: the blind
rotation inside EvalBinGate is ~99% of encrypted runtime) is the negacyclic
"digits × RGSW-key" contraction

    prod[b, m, k] = sum_{r,i} digs[r, b, i] * key[r, m, (k - i) mod 2N]

(m = parts*out*limb flattened), where the key index arithmetic encodes
multiplication by a negacyclic matrix.  XLA can only express this with a
134 MB gather per bootstrap step, which lowers catastrophically on TPU.
This kernel materializes each negacyclic 128x128 tile *in VMEM* with a
log-depth barrel shifter (masked ``pltpu.roll``) and feeds the MXU with
int8 matmuls accumulating exactly in int32.

Shapes (STD128: R = 2*d_g = 8 digit rows, M = parts*out*limbs = 16):
    digs : int8 [R, B, N]
    keys : int8 [R*M, 4N]   (negacyclic-extended key doubled again, so every
                             barrel window is a plain aligned slice)
    out  : int32 [B, M, N]

Numerically exact; differentially tested against the jnp gather
formulation and the NumPy golden model (tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128  # TI = TK = 128
SPAN = 2 * TILE  # window length: covers i' + k' <= 254 < 256


def _negacyclic_kernel(digs_ref, keys_ref, out_ref, *, N, R, M, TB):
    """Grid (k_tiles, i_tiles); i innermost so ``out`` stays resident.

    digs_ref : [R, TB, TILE] int8   (block at (0, 0, i))
    keys_ref : [R*M, 4N] int8       (full)
    out_ref  : [TB, M, TILE] int32  (block at (0, 0, k))
    """
    k_idx = pl.program_id(0)
    i_idx = pl.program_id(1)
    TI = TK = TILE

    # delta = (k0 - i0) mod 2N; window W[t] = keys[.., delta + t], t < SPAN.
    delta = (k_idx * TK - i_idx * TI + 2 * N) % (2 * N)
    delta = pl.multiple_of(delta, TILE)  # k0, i0, 2N are multiples of 128
    row = jax.lax.broadcasted_iota(jnp.int32, (TI, SPAN), 0)

    for m in range(M):
        acc = jnp.zeros((TB, TK), jnp.int32)
        for r in range(R):
            w = keys_ref[r * M + m : r * M + m + 1, pl.ds(delta, SPAN)]
            # barrel shift in int32 (pltpu.roll is 32-bit only):
            # after the rounds, x[i', t] = w[i' + t]
            x = jnp.broadcast_to(w, (TI, SPAN)).astype(jnp.int32)
            for b in range(7):  # shifts 1..64 cover i' in [0, 128)
                sh = 1 << b
                rolled = pltpu.roll(x, SPAN - sh, 1)
                x = jnp.where((row & sh) != 0, rolled, x)
            dense = x[:, :TK].astype(jnp.int8)  # [TI, TK]
            acc = acc + jax.lax.dot_general(
                digs_ref[r],
                dense,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

        @pl.when(i_idx == 0)
        def _():
            out_ref[:, m, :] = acc

        @pl.when(i_idx != 0)
        def _():
            out_ref[:, m, :] = out_ref[:, m, :] + acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def negacyclic_matmul_pallas(digs, keys4n, interpret: bool = False):
    """digs int8 [R, B, N]; keys4n int8 [R*M, 4N] -> int32 [B, M, N].

    Exact: |sum| <= R*N*128*128 = 2**27 for R=8, N=1024.
    """
    R, B, N = digs.shape
    RM, four_n = keys4n.shape
    assert four_n == 4 * N, (four_n, N)
    assert RM % R == 0
    M = RM // R
    assert N % TILE == 0
    nt = N // TILE
    kernel = functools.partial(_negacyclic_kernel, N=N, R=R, M=M, TB=B)
    return pl.pallas_call(
        kernel,
        grid=(nt, nt),
        in_specs=[
            pl.BlockSpec((R, B, TILE), lambda k, i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((RM, 4 * N), lambda k, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (B, M, TILE), lambda k, i: (0, 0, k), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, M, N), jnp.int32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * R * M * N,
            bytes_accessed=R * B * N + RM * 4 * N + B * M * N * 4,
            transcendentals=0,
        ),
    )(digs, keys4n)


def negacyclic_matmul_reference(digs, keys4n):
    """jnp gather reference of the same contraction (tests/CPU path)."""
    R, B, N = digs.shape
    RM = keys4n.shape[0]
    M = RM // R
    keys = keys4n.reshape(R, M, 4 * N)[..., : 2 * N]
    i = jnp.arange(N, dtype=jnp.int32)
    idx = (i[None, :] - i[:, None]) % (2 * N)  # [i, k]
    dense = keys[..., idx]  # [R, M, N(i), N(k)]
    return jnp.einsum(
        "rbi,rmik->bmk", digs, dense, preferred_element_type=jnp.int32
    )
