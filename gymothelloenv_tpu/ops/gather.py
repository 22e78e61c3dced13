"""TPU-friendly batched row gathers.

XLA lowers a row gather on a >2-D operand (e.g. ``obs[(K,), 4, 8, 8]``)
into a slow per-row path on TPU: measured on-chip, gathering 64K rows of a
(256K, 4, 8, 8) float32 array costs ~15 ms, while the identical bytes
gathered through a (256K, 256) 2-D view cost ~2.3 ms
(scripts/profile_update_breakdown.py).  ``gather_rows`` routes every row
gather through a 2-D view; reshapes are free (layout no-ops).

Beyond layout, every 2-D row gather pays a large per-invocation cost that
is nearly independent of the row WIDTH: on-chip, gathering 64K rows costs
~0.55 ms whether the rows are 4 bytes or 256 bytes (trace_update.py — the
per-leaf gathers were 61% of the PPO update).  ``pack_rows`` therefore
byte-packs a whole pytree of (B, ...) leaves into ONE uint8 (B, P) array
so a minibatch fetch is ONE gather, unpacked afterwards by free
slices/bitcasts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_rows(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``x[idx]`` along axis 0, lowered via a 2-D view when ``x`` has more
    than one trailing dim.  ``idx`` must be 1-D."""
    if x.ndim <= 2:
        return x[idx]
    flat2 = x.reshape(x.shape[0], -1)
    return flat2[idx].reshape((idx.shape[0],) + x.shape[1:])


def _to_bytes(flat: jnp.ndarray) -> jnp.ndarray:
    """(B, K) any-dtype -> (B, K * itemsize) uint8, bit-exact."""
    if flat.dtype == jnp.bool_:
        return flat.astype(jnp.uint8)
    if flat.dtype.itemsize == 1:
        return jax.lax.bitcast_convert_type(flat, jnp.uint8)
    u8 = jax.lax.bitcast_convert_type(flat, jnp.uint8)  # (B, K, itemsize)
    return u8.reshape(flat.shape[0], -1)


def _from_bytes(u8: jnp.ndarray, dtype, m: int) -> jnp.ndarray:
    """(M, K * itemsize) uint8 -> (M, K) dtype, inverse of ``_to_bytes``."""
    dtype = jnp.dtype(dtype)
    if dtype == jnp.bool_:
        return u8.astype(jnp.bool_)
    if dtype.itemsize == 1:
        return jax.lax.bitcast_convert_type(u8, dtype)
    return jax.lax.bitcast_convert_type(
        u8.reshape(m, -1, dtype.itemsize), dtype)


def make_row_codec(template):
    """Build a byte-row codec for a pytree of ``(B, ...)`` arrays (only
    trailing shapes/dtypes of ``template`` matter; its leading dim may be
    anything, including 0).

    Returns ``(pack, unpack, nbytes)``: ``pack(tree) -> uint8 (B, nbytes)``
    and ``unpack(rows) -> tree`` with leading dim ``rows.shape[0]``.
    Bit-exact round-trip (bool via uint8 0/1, everything else bitcast).
    """
    leaves, treedef = jax.tree.flatten(template)
    if not leaves:
        raise ValueError("row codec needs at least one leaf")
    specs = []
    for leaf in leaves:
        width = 1
        for d in leaf.shape[1:]:
            width *= d
        itemsize = 1 if leaf.dtype == jnp.bool_ else jnp.dtype(
            leaf.dtype).itemsize
        specs.append((leaf.shape[1:], jnp.dtype(leaf.dtype),
                      width * itemsize))
    total = sum(nb for _, _, nb in specs)

    def pack(tree):
        leaves2, treedef2 = jax.tree.flatten(tree)
        if treedef2 != treedef:
            raise ValueError(
                f"pack() tree structure {treedef2} does not match the "
                f"codec template {treedef} — packed rows would be "
                f"silently corrupted")
        b = leaves2[0].shape[0]
        cols = []
        for leaf, (shape_tail, dtype, _) in zip(leaves2, specs):
            if leaf.shape[0] != b:
                raise ValueError(
                    f"all leaves must share the leading dim: "
                    f"{leaf.shape[0]} != {b}")
            cols.append(_to_bytes(leaf.reshape(b, -1)))
        return jnp.concatenate(cols, axis=1) if len(cols) > 1 else cols[0]

    def unpack(rows: jnp.ndarray):
        m = rows.shape[0]
        out, off = [], 0
        for shape_tail, dtype, nbytes in specs:
            chunk = jax.lax.slice_in_dim(rows, off, off + nbytes, axis=1)
            off += nbytes
            out.append(_from_bytes(chunk, dtype, m).reshape(
                (m,) + shape_tail))
        return jax.tree.unflatten(treedef, out)

    return pack, unpack, total


def pack_rows(tree):
    """Byte-pack a pytree of ``(B, ...)`` arrays into one uint8 ``(B, P)``
    array so that many row gathers become ONE.

    Returns ``(packed, unpack)`` where ``unpack(packed[idx])`` rebuilds the
    pytree with leading dim ``len(idx)``.  Packing/unpacking is bit-exact
    (bool round-trips through uint8 0/1; everything else is bitcast), and
    costs one sequential pass over the data — repaid after the second
    gather of the packed rows (see module docstring for the measured
    per-gather overhead this amortizes).
    """
    pack, unpack, _ = make_row_codec(tree)
    return pack(tree), unpack


def onehot_select_last(values: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``values[..., idx]`` pick-one along the last axis via one-hot
    multiply-reduce — bit-exact (single nonzero term) and far cheaper on
    TPU than ``take_along_axis``, whose per-row gather carries a large
    fixed cost (see module docstring).  ``idx.shape == values.shape[:-1]``.
    """
    onehot = (idx[..., None].astype(jnp.int32)
              == jnp.arange(values.shape[-1], dtype=jnp.int32))
    picked = jnp.where(onehot, values, 0).sum(axis=-1)
    return picked.astype(values.dtype)  # sum() widens small ints
