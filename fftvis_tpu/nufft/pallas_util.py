"""Shared infrastructure for the three Pallas TPU kernels.

:mod:`.pallas_spread`, :mod:`.pallas_interp`, and
:mod:`fftvis_tpu.beams.pallas_eval` follow one design (occupancy-
proportional 128-lane chunks over bin-sorted payloads, VMEM-budgeted
admission gates, sequential_vmap under the engine's freq-vmap, interpret
mode off-TPU). The invariants they share live here exactly once.
"""

from __future__ import annotations

import os

# Occupancy chunk: sources/targets are consumed PC at a time inside each
# tile's fori_loop. 128 matches the lane width (one MXU pass per chunk),
# and chunk bases round to multiples of it (Mosaic provable alignment).
DEFAULT_PC = 128

# VMEM budget for each kernel's resident buffers (bytes). The chip has
# ~16 MB; leave headroom for Mosaic's own buffers.
VMEM_BUDGET = 10 * 1024 * 1024


def chunk_size() -> int:
    """The (lane-aligned) occupancy chunk size, FFTVIS_PALLAS_PC override."""
    pc = int(os.environ.get("FFTVIS_PALLAS_PC", DEFAULT_PC))
    return max(128, (pc // 128) * 128)


def sublane_pad(n: int) -> int:
    """n rounded up to the f32 sublane grain (8)."""
    return -(-int(n) // 8) * 8


def lane_pad(n: int) -> int:
    """n rounded up to the lane grain (128)."""
    return -(-int(n) // 128) * 128


def vma_of(*arrays):
    """Union of the operands' varying-axes (shard_map vma) as a frozenset.

    Under jax.shard_map with check_vma (the default), a pallas_call must
    declare how its outputs vary across mesh axes; the output varies over
    exactly the axes any input does.
    """
    import jax

    vs = set()
    for a in arrays:
        v = getattr(jax.typeof(a), "vma", None)
        if v:
            vs |= set(v)
    return frozenset(vs)


def interpret_shardmap_blocked(*arrays) -> bool:
    """True when the INTERPRET-mode kernel cannot run these operands.

    On non-TPU backends the kernels execute in Pallas interpret mode,
    which lowers to plain jax ops; inside shard_map with check_vma those
    ops mix kernel-internal unvarying indices with varying data and fail
    the vma checker. The compiled TPU lowering is a single primitive with
    a declared output vma and is unaffected. Callers fall back to the XLA
    spreaders/interp in this (test-only) combination.
    """
    import jax

    return jax.default_backend() != "tpu" and bool(vma_of(*arrays))


def sequential(call):
    """Wrap a pallas_call for use under vmap (no batching rule exists).

    The engine batches the frequency axis with vmap; sequential_vmap
    lowers the batched call to a scan of per-element calls instead.
    """
    import jax

    return jax.custom_batching.sequential_vmap(lambda *a: call(*a))


def bin_sort_csr(tid, payload, ntiles: int, pc: int, sort_carry: bool = False):
    """Bin-sort a lane-major payload by tile id and build CSR bounds.

    Parameters
    ----------
    tid
        (n,) int32 tile id per column of ``payload``.
    payload
        (D, n) values with sources/targets on the lane axis.
    ntiles
        Number of tiles (CSR table length).
    pc
        Occupancy chunk size; ``pc`` zero columns are appended so the last
        chunk's aligned dynamic slice never overruns (dead lanes are
        live-masked in the kernels).
    sort_carry
        Carry the payload rows through a multi-operand sort instead of
        permuting them with a post-sort gather (FFTVIS_SORT_CARRY knob;
        measured a wash on v5e, kept for other TPU generations).

    Returns
    -------
    (payload_sorted, starts, ends, perm)
        ``payload_sorted`` is (D, n + pc); ``perm`` is the sort
        permutation (None when ``sort_carry`` — the caller cannot need it,
        spreading is order-insensitive).
    """
    import jax
    import jax.numpy as jnp

    n = payload.shape[1]
    perm = None
    if sort_carry:
        ops = jax.lax.sort(
            (tid,) + tuple(payload[d] for d in range(payload.shape[0])),
            num_keys=1,
        )
        tid_sorted = ops[0]
        payload_sorted = jnp.stack(ops[1:])
    else:
        iota = jnp.arange(n, dtype=jnp.int32)
        tid_sorted, perm = jax.lax.sort((tid, iota), num_keys=1)
        payload_sorted = jnp.take(payload, perm, axis=1)
    payload_sorted = jnp.concatenate(
        [payload_sorted, jnp.zeros((payload.shape[0], pc), payload.dtype)],
        axis=1,
    )
    starts = jnp.searchsorted(
        tid_sorted, jnp.arange(ntiles, dtype=jnp.int32)
    ).astype(jnp.int32)
    ends = jnp.searchsorted(
        tid_sorted, jnp.arange(1, ntiles + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    return payload_sorted, starts, ends, perm
