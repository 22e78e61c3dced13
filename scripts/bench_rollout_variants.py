"""Cost attribution inside the fused Pallas rollout kernel.

Times kernel variants that stub out one component each, so the per-ply
budget (sampler vs flip flood vs the two legal floods) is measured rather
than guessed.  Variants change ONLY the stubbed component; they are not
semantically valid games (except 'full') — this is a profiling tool.

Usage: python scripts/bench_rollout_variants.py [batch] [chunk]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gymothelloenv_tpu.core.bitboard import legal_mask2, resolve_flips2
from gymothelloenv_tpu.ops.pallas_rollout import (_INIT_C0, _INIT_C1,
                                                  _INIT_L0, _INIT_L1,
                                                  _INIT_O0, _INIT_O1,
                                                  _sample_legal,
                                                  rollout_init)
from gymothelloenv_tpu.utils.tpu import warmup


def _ply_variant(c0, c1, o0, o1, l0, l1, r, variant):
    if variant == "nosample":     # lowest set bit instead of uniform pick
        oh0 = l0 & (~l0 + np.uint32(1))
        oh1 = jnp.where(oh0 == 0, l1 & (~l1 + np.uint32(1)),
                        jnp.zeros_like(l1))
    else:
        oh0, oh1 = _sample_legal(r, l0, l1)

    if variant == "noflips":
        f0, f1 = oh0, oh1
    else:
        f0, f1 = resolve_flips2((oh0, oh1), (c0, c1), (o0, o1))
    nc0, nc1 = c0 | oh0 | f0, c1 | oh1 | f1
    no0, no1 = o0 & ~f0, o1 & ~f1

    lo0, lo1 = legal_mask2((no0, no1), (nc0, nc1))
    if variant == "nopass":       # skip the mover-again legal flood
        ls0 = jnp.zeros_like(lo0)
        ls1 = jnp.zeros_like(lo1)
    else:
        ls0, ls1 = legal_mask2((nc0, nc1), (no0, no1))
    opp_has = (lo0 | lo1) != 0
    same_has = (ls0 | ls1) != 0
    done = ~opp_has & ~same_has

    def pick(sw, a, b, init):
        return jnp.where(done, init, jnp.where(sw, a, b))

    c0n = pick(opp_has, no0, nc0, _INIT_C0)
    c1n = pick(opp_has, no1, nc1, _INIT_C1)
    o0n = pick(opp_has, nc0, no0, _INIT_O0)
    o1n = pick(opp_has, nc1, no1, _INIT_O1)
    l0n = pick(opp_has, lo0, ls0, _INIT_L0)
    l1n = pick(opp_has, lo1, ls1, _INIT_L1)
    return c0n, c1n, o0n, o1n, l0n, l1n, done


def make_chunk(num_steps, variant, grid=None, unroll=1):
    def kernel(seed_ref, c0_ref, c1_ref, o0_ref, o1_ref, l0_ref, l1_ref,
               oc0_ref, oc1_ref, oo0_ref, oo1_ref, ol0_ref, ol1_ref,
               eps_ref):
        seed = seed_ref[0, 0]
        if grid:
            seed = seed + pl.program_id(0)
        pltpu.prng_seed(seed)

        def body(i, carry):
            c0, c1, o0, o1, l0, l1, ep = carry
            r = pltpu.bitcast(pltpu.prng_random_bits(c0.shape), jnp.uint32)
            c0, c1, o0, o1, l0, l1, done = _ply_variant(
                c0, c1, o0, o1, l0, l1, r, variant)
            return c0, c1, o0, o1, l0, l1, ep + done.astype(jnp.int32)

        init = (c0_ref[:], c1_ref[:], o0_ref[:], o1_ref[:],
                l0_ref[:], l1_ref[:], jnp.zeros(c0_ref.shape, jnp.int32))
        c0, c1, o0, o1, l0, l1, ep = jax.lax.fori_loop(
            0, num_steps, body, init, unroll=unroll)
        oc0_ref[:], oc1_ref[:] = c0, c1
        oo0_ref[:], oo1_ref[:] = o0, o1
        ol0_ref[:], ol1_ref[:] = l0, l1
        eps_ref[0, 0] = jnp.sum(ep)

    def chunk(state, seed):
        shape = state.cur[0].shape
        word = jax.ShapeDtypeStruct(shape, jnp.uint32)
        if grid:
            cols = shape[1] // grid
            vmem = pl.BlockSpec((shape[0], cols), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
            smem_in = pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM)
            smem_out = pl.BlockSpec((1, 1), lambda i: (0, i),
                                    memory_space=pltpu.SMEM)
            eps_shape = jax.ShapeDtypeStruct((1, grid), jnp.int32)
            grid_kw = {"grid": (grid,)}
        else:
            vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
            smem_in = pl.BlockSpec(memory_space=pltpu.SMEM)
            smem_out = pl.BlockSpec(memory_space=pltpu.SMEM)
            eps_shape = jax.ShapeDtypeStruct((1, 1), jnp.int32)
            grid_kw = {}
        outs = pl.pallas_call(
            kernel,
            in_specs=[smem_in] + [vmem] * 6,
            out_specs=tuple([vmem] * 6 + [smem_out]),
            out_shape=tuple([word] * 6 + [eps_shape]),
            **grid_kw,
        )(jnp.asarray(seed, jnp.int32).reshape(1, 1),
          state.cur[0], state.cur[1], state.opp[0], state.opp[1],
          state.legal[0], state.legal[1])
        return outs[-1].sum()

    return jax.jit(chunk)


def main():
    warmup()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    chunk_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    reps = 256  # chunks chained in ONE jitted scan: a Python-level kernel
    #             dispatch costs ~3-4 ms through the tunnel and would
    #             otherwise dominate the ~0.5 ms kernel
    configs = (
        ("full", {}), ("nosample", {}), ("noflips", {}), ("nopass", {}),
        ("full-grid2", {"grid": 2}), ("full-grid4", {"grid": 4}),
        ("full-unroll2", {"unroll": 2}), ("full-unroll4", {"unroll": 4}),
    )
    for name, kw in configs:
        variant = name.split("-")[0]
        try:
            run_config(name, variant, kw, batch, chunk_steps, reps)
        except Exception as e:  # noqa: BLE001 — experimental configs may
            #                     not lower (e.g. grid BlockSpecs)
            first_line = str(e).splitlines()[0] if str(e) else ""
            print(f"{name:13s}: failed ({type(e).__name__}: "
                  f"{first_line[:120]})", flush=True)


def run_config(name, variant, kw, batch, chunk_steps, reps):
    fn = make_chunk(chunk_steps, variant, **kw)

    @jax.jit
    def many(state, seed0):
        def body(total, seed):
            return total + fn(state, seed), None
        total, _ = jax.lax.scan(
            body, jnp.int32(0),
            seed0 + jnp.arange(reps, dtype=jnp.int32))
        return total

    state = rollout_init(batch)
    int(many(state, jnp.int32(1)))        # compile + sync
    t0 = time.perf_counter()
    eps = many(state, jnp.int32(1000))
    int(eps)
    dt = (time.perf_counter() - t0) / reps
    rate = batch * chunk_steps / dt
    print(f"{name:13s}: {dt * 1e3:7.2f} ms/chunk -> "
          f"{rate / 1e6:7.1f} M plies/s", flush=True)


if __name__ == "__main__":
    main()
