"""Batched FMD-index operations on device (JAX).

Device counterpart of mapad_tpu.index.fmd (reference src/map/fmd_index.rs),
re-designed for batch execution: instead of one rank query at a time, whole
lanes of bidirectional intervals are extended per step.

Layout: one fused int32 row per BWT block --
  row[0:6]   exclusive-prefix occ checkpoint counts for ranks 0..5
  row[6:6+K/4] BWT symbol ranks packed 4-per-int32 (little-endian)
so a single gathered row answers the rank query for all four DNA symbols at
once (the reference's shared 4-symbol sweep, fmd_index.rs:108-182), at one
HBM row read per interval end.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class DeviceFmIndex(NamedTuple):
    """FMD-index arrays resident on device.

    `big=False` (texts < 2^31 symbols): checkpoint counts are int32 and one
    fused row is [cp(6) | packed bwt].  `big=True` (int64 mode for e.g.
    doubled human references): counts are stored as int32 lo/hi pairs in
    the same fused row -- [cp_lo(6) | cp_hi(6) | packed bwt] -- so the rank
    query still costs a single row gather; interval arithmetic runs in
    int64 (requires jax x64, enabled at ops package import).

    Symbols (ranks 0..5, pad 15) pack 8 per int32 (4 bits each) and the
    block size is chosen so a row is exactly 128 int32 = 512 B: one aligned
    HBM granule per rank query, no tile padding waste (TPU (8,128) tiling
    pads the minor dim to 128 lanes regardless, so narrower rows store the
    same 512 B but carry fewer symbols).  k = (128-6)*8 = 976 small,
    (128-12)*8 = 928 big.
    """

    rows: jax.Array  # (nb, 128) int32 fused occ+bwt rows
    less: jax.Array  # (A,) int32 / int64
    sentinels: jax.Array  # (2,) int32 / int64
    occ_k: int  # static
    text_len: int  # static
    big: bool = False  # static: int64 interval mode

    @property
    def idx_dtype(self):
        return jnp.int64 if self.big else jnp.int32

    @property
    def n_cp_cols(self) -> int:
        return 12 if self.big else 6

    @classmethod
    def from_host(cls, fmd, occ_k: int | None = None,
                  big: bool | None = None) -> "DeviceFmIndex":
        """Build from a host FmdIndex (mapad_tpu.index.fmd.FmdIndex).

        The device block size is independent of the on-disk checkpoint
        spacing; checkpoints are rebuilt here at a device-friendly k.
        `big` defaults to automatic (int64 mode iff the text needs it).
        """
        import os

        from ..index.fmd import compute_occ_checkpoints

        n = len(fmd.bwt)
        if big is None:
            big = n >= 2**31 - 1
        n_cp = 12 if big else 6
        k = occ_k or (128 - n_cp) * 8
        assert k % 8 == 0
        nb = (n + k - 1) // k

        # the fused row build re-walks the whole BWT (checkpoints at the
        # device k + 4-bit packing): ~45 min of host time at hg19 scale,
        # deterministic from the bundle -- cache it next to the index
        cache_dir = getattr(fmd, "cache_dir", None)
        cache_path = (
            os.path.join(
                cache_dir, f"device_rows_k{k}{'_big' if big else ''}.npy"
            )
            if cache_dir
            else None
        )
        rows = None
        if cache_path and os.path.exists(cache_path):
            cached = np.load(cache_path, mmap_mode="r")
            if cached.shape == (nb, 128) and cached.dtype == np.int32:
                rows = cached
        if rows is None:
            bwt = np.asarray(fmd.bwt, dtype=np.uint8)
            padded = np.full(nb * k, 15, dtype=np.uint8)
            padded[:n] = bwt
            nibbles = padded.reshape(nb, k // 8, 8).astype(np.uint32)
            packed = np.zeros((nb, k // 8), dtype=np.uint32)
            for b in range(8):
                packed |= nibbles[:, :, b] << (4 * b)
            packed = packed.view(np.int32)
            if k == fmd.occ_k:
                cp = np.asarray(fmd.occ_cp, dtype=np.int64)
            else:
                alphabet_size = len(fmd.rank_transform)
                cp = compute_occ_checkpoints(bwt, k, alphabet_size)
            cp = cp[:nb]
            if cp.shape[1] < 6:
                cp = np.pad(cp, ((0, 0), (0, 6 - cp.shape[1])))
            cp = cp[:, :6]
            if big:
                cp_lo = (cp & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
                cp_hi = (cp >> 32).astype(np.int32)
                rows = np.concatenate([cp_lo, cp_hi, packed], axis=1)
            else:
                rows = np.concatenate([cp.astype(np.int32), packed], axis=1)
            if cache_path:
                try:
                    tmp = cache_path + ".tmp"
                    with open(tmp, "wb") as f:
                        np.save(f, rows)
                    os.replace(tmp, cache_path)
                except OSError:  # read-only bundle: skip the cache
                    pass
        idt = np.int64 if big else np.int32
        return cls(
            rows=jnp.asarray(rows),
            less=jnp.asarray(np.asarray(fmd.less, dtype=np.int64).astype(idt)),
            sentinels=jnp.asarray(
                np.asarray(fmd.sentinel_occ, dtype=np.int64).astype(idt)
            ),
            occ_k=int(k),
            text_len=int(n),
            big=bool(big),
        )


# occ_k/text_len/big must be STATIC under jit (they steer Python-level
# branching, e.g. the big-mode row layout), so override the default
# NamedTuple pytree flattening with array-children + hashable aux data.
jax.tree_util.register_pytree_node(
    DeviceFmIndex,
    lambda x: ((x.rows, x.less, x.sentinels), (x.occ_k, x.text_len, x.big)),
    lambda aux, ch: DeviceFmIndex(ch[0], ch[1], ch[2], *aux),
)


def _row_occ4(index: DeviceFmIndex, r: jax.Array) -> jax.Array:
    """(L,) positions -> (L, 4) counts of ranks 1..4 in bwt[0..=r] (-1 -> 0)."""
    k = index.occ_k
    r_safe = jnp.maximum(r, 0)
    blk = (r_safe // k).astype(jnp.int32)
    off = (r_safe % k).astype(jnp.int32)
    rows = index.rows[blk]  # (L, n_cp + K//4) single gather
    if index.big:
        cp = (
            (rows[:, 1:5].astype(jnp.int64) & 0xFFFFFFFF)
            | (rows[:, 7:11].astype(jnp.int64) << 32)
        )
    else:
        cp = rows[:, 1:5]  # checkpoint counts for ranks 1..4
    words = rows[:, index.n_cp_cols:]  # (L, K//8)
    # unpack nibbles: (L, K//8, 8) -> (L, K)
    shifts = jnp.arange(0, 32, 4, dtype=jnp.int32)
    symbols = ((words[:, :, None] >> shifts[None, None, :]) & 0xF).reshape(
        rows.shape[0], -1
    )
    pos = jax.lax.broadcasted_iota(jnp.int32, symbols.shape, 1)
    in_prefix = pos <= off[:, None]
    counts = jnp.stack(
        [
            jnp.sum((symbols == c) & in_prefix, axis=1, dtype=jnp.int32)
            for c in (1, 2, 3, 4)
        ],
        axis=1,
    )
    return jnp.where(
        r[:, None] >= 0, counts.astype(index.idx_dtype) + cp,
        jnp.zeros((), index.idx_dtype),
    )


def occ4_batch(index: DeviceFmIndex, r: jax.Array) -> jax.Array:
    return _row_occ4(index, r)


def sentinel_count(index: DeviceFmIndex, r: jax.Array) -> jax.Array:
    """(L,) -> number of sentinels in bwt[0..=r] (fmd_index.rs:138-151)."""
    s0 = index.sentinels[0]
    s1 = index.sentinels[1]
    return (r >= s0).astype(jnp.int32) + (r >= s1).astype(jnp.int32)


def extend_batch(index: DeviceFmIndex, lower, lower_rev, size):
    """Batched 4-symbol backward-extension sweep.

    Inputs (L,) int32; returns (child_lower, child_lower_rev, child_size),
    each (L, 4) in sweep slot order [T, G, C, A] (ranks 4, 3, 2, 1), exactly
    mirroring FmdExtIterator (fmd_index.rs:108-182).
    """
    r1 = lower - 1
    r2 = lower + size - 1
    # one fused (2L,) rank query instead of two (L,) ones: halves the
    # per-step gather dispatch cost of the hottest primitive
    rr = jnp.concatenate([jnp.where(lower == 0, -1, r1), r2])
    occ12 = _row_occ4(index, rr)
    occ1 = occ12[: lower.shape[0]]  # (L, 4) ranks 1..4
    occ2 = occ12[lower.shape[0]:]
    sent1 = jnp.where(lower == 0, 0, sentinel_count(index, r1))
    sent2 = sentinel_count(index, r2)

    out_lower = []
    out_lrev = []
    out_size = []
    s_run = sent2 - sent1
    l_run = lower_rev
    for c in (4, 3, 2, 1):
        l_run = l_run + s_run
        o = occ1[:, c - 1]
        s_run = occ2[:, c - 1] - o
        out_lower.append(index.less[c] + o)
        out_lrev.append(l_run)
        out_size.append(s_run)
    return (
        jnp.stack(out_lower, axis=1),
        jnp.stack(out_lrev, axis=1),
        jnp.stack(out_size, axis=1),
    )


def backward_ext_by_rank(index: DeviceFmIndex, lower, lower_rev, size, c):
    """Backward-extend (L,) intervals by per-lane symbol ranks c (1..4).

    c outside 1..4 yields the empty interval (non-alphabet symbol).
    """
    ch_lower, ch_lrev, ch_size = extend_batch(index, lower, lower_rev, size)
    # sweep slot for rank c is 4 - c
    slot = jnp.clip(4 - c, 0, 3)
    lanes = jnp.arange(lower.shape[0], dtype=jnp.int32)
    sel_lower = ch_lower[lanes, slot]
    sel_lrev = ch_lrev[lanes, slot]
    sel_size = ch_size[lanes, slot]
    valid = (c >= 1) & (c <= 4)
    zero = jnp.zeros_like(sel_lower)
    return (
        jnp.where(valid, sel_lower, zero),
        jnp.where(valid, sel_lrev, zero),
        jnp.where(valid, sel_size, zero),
    )


def forward_ext_by_rank(index: DeviceFmIndex, lower, lower_rev, size, c):
    """Forward extension = backward extension of the swapped interval with the
    complement symbol, then swap back (fmd_index.rs:93-96).

    Complement of rank c (1=A..4=T) is 5-c.
    """
    comp = jnp.where((c >= 1) & (c <= 4), 5 - c, 0)
    sl, slr, ss = backward_ext_by_rank(index, lower_rev, lower, size, comp)
    return slr, sl, ss
