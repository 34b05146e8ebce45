"""Device-mesh parallelism for batched gate bootstrapping.

The reference's only parallelism is intra-level OpenMP gate tasks
(circuit.cpp:698-710); there is no distributed backend (SURVEY.md §2.7).
Here the same independence structure maps onto a JAX device mesh:

  * ``dp`` (data parallel): the gate batch of a level is sharded across
    devices — bootstraps are embarrassingly parallel, keys replicated.
  * ``tp`` (tensor parallel): the blind-rotation contraction (rows axis of
    the RGSW key matmul) and the key-switch contraction are sharded, with a
    per-step ``psum`` over the tp axis riding ICI.

Implemented with ``shard_map`` so the collectives are explicit; the same
code runs on a virtual 8-device CPU mesh (tests, driver dryrun) and on real
multi-chip slices.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..fhe import boot
from ..fhe.params import BinFHEMethod

try:  # JAX >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def make_mesh(n_devices: Optional[int] = None, tp: int = 1) -> Mesh:
    """Build a (dp, tp) mesh over the first n_devices devices."""
    devs = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devs)
    assert n % tp == 0, (n, tp)
    arr = np.array(devs).reshape(n // tp, tp)
    return Mesh(arr, ("dp", "tp"))


def shard_bootstrap_keys(keys: boot.DeviceBootKeys, mesh: Mesh) -> boot.DeviceBootKeys:
    """Place keys on the mesh.

    Prebuilt layout (ginx_rev, the production TPU path / device keygen
    output): keys fully replicated — dp-only parallelism; each device runs
    the fused prebuilt-diagonal kernels on its batch shard (VERDICT r3 #2:
    this layout used to be silently dropped here, crashing Circuit(mesh=...)
    after device keygen).
    jnp layout (ginx_kext): RGSW rows / key-switch contraction sharded over
    ``tp``, replicated over ``dp``.
    Pallas window layout (ginx_pallas): keys fully replicated (dp-only).
    """
    from jax.sharding import NamedSharding

    tv = jax.device_put(keys.tv_table, NamedSharding(mesh, P()))
    if keys.method == BinFHEMethod.AP:
        assert int(mesh.shape.get("tp", 1)) == 1, (
            "AP shards dp-only (the megakernel owns the whole contraction); "
            "build the mesh with tp=1"
        )
        rep = lambda x: (
            None if x is None else jax.device_put(x, NamedSharding(mesh, P()))
        )
        return boot.DeviceBootKeys(
            params=keys.params, method=keys.method, ginx_kext=None,
            ap_kext=rep(keys.ap_kext), ksk=rep(keys.ksk), tv_table=tv,
            ap_pallas=rep(keys.ap_pallas),
        )
    if keys.ginx_rev is not None or keys.ginx_rev2 is not None:
        assert int(mesh.shape.get("tp", 1)) == 1, (
            "the prebuilt ginx_rev/rev2 layouts shard dp-only; build the "
            "mesh with tp=1 or pack keys with use_pallas=False (jnp layout) "
            "for tensor parallelism"
        )
        rep = lambda x: (
            None if x is None else jax.device_put(x, NamedSharding(mesh, P()))
        )
        ksk = jax.device_put(keys.ksk, NamedSharding(mesh, P()))
        return boot.DeviceBootKeys(
            params=keys.params, method=keys.method, ginx_kext=None,
            ap_kext=None, ksk=ksk, tv_table=tv,
            ginx_rev=rep(keys.ginx_rev), ginx_rev2=rep(keys.ginx_rev2),
        )
    if keys.ginx_pallas is not None:
        gp = jax.device_put(keys.ginx_pallas, NamedSharding(mesh, P()))
        ksk = jax.device_put(keys.ksk, NamedSharding(mesh, P()))
        return boot.DeviceBootKeys(
            params=keys.params, method=keys.method, ginx_kext=None,
            ap_kext=None, ksk=ksk, tv_table=tv, ginx_pallas=gp,
        )
    kext = jax.device_put(
        keys.ginx_kext, NamedSharding(mesh, P(None, None, "tp", None, None, None))
    )
    ksk = jax.device_put(keys.ksk, NamedSharding(mesh, P("tp", None, None)))
    return boot.DeviceBootKeys(
        params=keys.params, method=keys.method, ginx_kext=kext,
        ap_kext=None, ksk=ksk, tv_table=tv,
    )


def make_sharded_gate_fn(keys: boot.DeviceBootKeys, mesh: Mesh):
    """Return a jitted fn(gids, c1, c2) evaluating gates sharded over the
    mesh.  The batch must be divisible by the dp size.

    Two key layouts (boot.pack_bootstrap_key):
      * Pallas layout (TPU hot path): dp-only — keys replicated, every
        device runs the fused bootstrap kernel on its batch shard (requires
        mesh tp == 1; the fused kernel owns the full contraction).
      * jnp layout: dp × tp — RGSW-row and key-switch contractions sharded
        over tp with per-step psums riding ICI.
    """
    p = keys.params
    method = keys.method
    tp = mesh.shape["tp"]

    if method == BinFHEMethod.AP:
        assert tp == 1, "AP shards dp-only; build the mesh with tp=1"
        ap_key = keys.ap_pallas if keys.ap_pallas is not None else keys.ap_kext
        use_pallas_ap = keys.ap_pallas is not None

        def local_fn_ap(ap_key, ksk, tv, gids, c1, c2):
            lkeys = boot.DeviceBootKeys(
                params=p, method=method, ginx_kext=None,
                ap_kext=None if use_pallas_ap else ap_key,
                ksk=ksk, tv_table=tv,
                ap_pallas=ap_key if use_pallas_ap else None,
            )
            return boot.eval_bin_gate_batch(lkeys, gids, c1, c2)

        smapped_ap = shard_map(
            local_fn_ap,
            mesh=mesh,
            in_specs=(P(), P(), P(), P("dp"), P("dp", None), P("dp", None)),
            out_specs=P("dp", None),
            check_vma=False,
        )

        # keys pass as jit ARGUMENTS, never closure-captured: captured
        # arrays are baked into the lowered program as constants, which
        # embeds the multi-GB key in the remote-compile request on the
        # relayed TPU (ADVICE r4; same fix as tools/measure_noise.py).
        jfn_ap = jax.jit(smapped_ap)

        def fn_ap(gids, c1, c2):
            return jfn_ap(ap_key, keys.ksk, keys.tv_table, gids, c1, c2)

        return fn_ap

    if keys.ginx_rev is not None or keys.ginx_rev2 is not None:
        assert tp == 1, (
            "the prebuilt ginx_rev/rev2 layouts shard dp-only; build the "
            "mesh with tp=1 or pack keys with use_pallas=False for tensor "
            "parallelism"
        )
        is_rev2 = keys.ginx_rev2 is not None
        rev_arr = keys.ginx_rev2 if is_rev2 else keys.ginx_rev

        def local_fn_rev(rev, ksk, tv, gids, c1, c2):
            lkeys = boot.DeviceBootKeys(
                params=p, method=method, ginx_kext=None, ap_kext=None,
                ksk=ksk, tv_table=tv,
                ginx_rev=None if is_rev2 else rev,
                ginx_rev2=rev if is_rev2 else None,
            )
            return boot.eval_bin_gate_batch(lkeys, gids, c1, c2)

        smapped_rev = shard_map(
            local_fn_rev,
            mesh=mesh,
            in_specs=(P(), P(), P(), P("dp"), P("dp", None), P("dp", None)),
            out_specs=P("dp", None),
            # pallas_call's out_shape carries no varying-mesh-axes info
            check_vma=False,
        )

        jfn_rev = jax.jit(smapped_rev)  # keys as args (see fn_ap note)

        def fn_rev(gids, c1, c2):
            return jfn_rev(rev_arr, keys.ksk, keys.tv_table, gids, c1, c2)

        return fn_rev

    if keys.ginx_pallas is not None:
        assert tp == 1, (
            "the Pallas key layout shards dp-only; build the mesh with tp=1 "
            "or pack keys with use_pallas=False for tensor parallelism"
        )

        def local_fn_pallas(gp, ksk, tv, gids, c1, c2):
            lkeys = boot.DeviceBootKeys(
                params=p, method=method, ginx_kext=None, ap_kext=None,
                ksk=ksk, tv_table=tv, ginx_pallas=gp,
            )
            return boot.eval_bin_gate_batch(lkeys, gids, c1, c2)

        smapped = shard_map(
            local_fn_pallas,
            mesh=mesh,
            in_specs=(P(), P(), P(), P("dp"), P("dp", None), P("dp", None)),
            out_specs=P("dp", None),
            # pallas_call's out_shape carries no varying-mesh-axes info
            check_vma=False,
        )

        jfn_pallas = jax.jit(smapped)  # keys as args (see fn_ap note)

        def fn_pallas(gids, c1, c2):
            return jfn_pallas(
                keys.ginx_pallas, keys.ksk, keys.tv_table, gids, c1, c2
            )

        return fn_pallas

    def local_fn(kext, ksk, tv, gids, c1, c2):
        lkeys = boot.DeviceBootKeys(
            params=p, method=method, ginx_kext=kext, ap_kext=None,
            ksk=ksk, tv_table=tv,
        )
        # always reduce over tp (a size-1 psum is a no-op and keeps the
        # scan carry's varying-axes type consistent)
        return boot.eval_bin_gate_batch(lkeys, gids, c1, c2, tp_axis="tp")

    smapped = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(None, None, "tp", None, None, None),  # kext rows axis
            P("tp", None, None),  # ksk contraction axis
            P(),  # tv replicated
            P("dp"),
            P("dp", None),
            P("dp", None),
        ),
        out_specs=P("dp", None),
    )

    jfn = jax.jit(smapped)  # keys as args (see fn_ap note)

    def fn(gids, c1, c2):
        return jfn(keys.ginx_kext, keys.ksk, keys.tv_table, gids, c1, c2)

    return fn


def eval_bin_gate_sharded(
    keys: boot.DeviceBootKeys,
    gids: jnp.ndarray,
    c1: jnp.ndarray,
    c2: jnp.ndarray,
    mesh: Mesh,
):
    """One-shot convenience wrapper (builds the sharded fn each call)."""
    return make_sharded_gate_fn(keys, mesh)(gids, c1, c2)
