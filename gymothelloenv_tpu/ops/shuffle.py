"""Sort-free minibatch shuffling.

``jax.random.permutation`` lowers to a key sort — measured 2.2 ms per PPO
update at batch 256K on-chip (scripts/trace_update.py: sort.42/sort.44 were
the #16/#20 ops).  For power-of-two batch sizes a random BIJECTION on
``[0, 2**k)`` is enough for epoch shuffling, and one can be evaluated
pointwise with a handful of integer ops — no sort, and no materialized
permutation array: each minibatch computes its own index block on the fly.

The bijection is a keyed mix in the style of integer hash finalizers
(xor-constant, odd-multiply mod 2^k, xorshift-right), every stage of which
is invertible on k bits:

* ``x ^= c``                    — XOR with a constant
* ``x = (x * a) & mask, a odd`` — odd multiplier is a unit mod 2^k
* ``x ^= x >> s, s >= 1``       — upper bits unchanged, cascade inverts

This draws from a much smaller family than all ``(2^k)!`` permutations —
irrelevant for SGD epoch shuffling (the reference's ``torch.randperm``
order carries no semantics to preserve), but the knob to force the exact
uniform-permutation behaviour stays (``PPOConfig.shuffle = "sort"``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def is_power_of_two(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


def hash_perm(key: jax.Array, n: int, idx: jnp.ndarray) -> jnp.ndarray:
    """Apply a keyed bijection on ``[0, n)`` to ``idx`` (any shape,
    integer dtype).  ``n`` must be a power of two.  For a fixed ``key``
    the map is a permutation: ``sort(hash_perm(key, n, arange(n))) ==
    arange(n)`` exactly.
    """
    if not is_power_of_two(n):
        raise ValueError(f"hash_perm needs a power-of-two domain, got {n}")
    k = n.bit_length() - 1
    if k == 0:
        return jnp.zeros_like(idx)
    mask = jnp.uint32(n - 1)
    c = jax.random.bits(key, (4,), jnp.uint32)
    a1 = c[0] | jnp.uint32(1)
    a2 = c[1] | jnp.uint32(1)
    s1 = max(1, k // 2)
    s2 = max(1, (k + 1) // 2)

    x = idx.astype(jnp.uint32)
    x = (x ^ c[2]) & mask
    x = (x * a1) & mask
    x = x ^ (x >> s1)
    x = (x * a2) & mask
    x = x ^ (x >> s2)
    x = (x ^ c[3]) & mask
    return x.astype(jnp.int32)


def minibatch_indices(epoch_key: jax.Array, batch_size: int,
                      mb_idx: jnp.ndarray, mb_size: int) -> jnp.ndarray:
    """Indices of minibatch ``mb_idx`` under the epoch's hash permutation:
    the shuffled positions ``[mb_idx * mb_size, ... + mb_size)`` mapped
    through ``hash_perm`` — equivalent in role to
    ``permutation(key, batch_size)[mb_idx * mb_size:][:mb_size]`` but
    computed pointwise with no sort and no (batch_size,) array.
    """
    j = mb_idx * mb_size + jnp.arange(mb_size, dtype=jnp.int32)
    return hash_perm(epoch_key, batch_size, j)
