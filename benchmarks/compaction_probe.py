#!/usr/bin/env python
"""Probe the V=10 sort-compaction lever before integrating it (VERDICT r5 #5).

At the V=10 bench workload ~73% of sorted slots are invalid candidates
(INVALID keys that ride both the binning sort and the backward inverse-perm
sort). Compacting valid candidates into a static C = pair-budget buffer
BEFORE sorting trades one linear cumsum + two 1-D unique scatters for a
~2x shorter sort each way. This probe measures each piece on the real chip
at bench shapes so the integration decision is measurement-driven (PERF.md
measurement hygiene: microbenches only trusted as xprof op self-times —
run with --trace and read the op table).

    python benchmarks/compaction_probe.py --trace /tmp/probe_trace
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50000)
    ap.add_argument("--views", type=int, default=10)
    ap.add_argument("--a_slots", type=int, default=9)
    ap.add_argument("--big_frac", type=int, default=32)
    ap.add_argument("--b_slots", type=int, default=36)
    ap.add_argument("--valid_frac", type=float, default=0.27)
    ap.add_argument("--budget_factor", type=int, default=5)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--trace", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    N, V = args.n, args.views
    K = max(-(-N // args.big_frac), 8)
    P = V * N * args.a_slots + V * K * args.b_slots
    C = -(-args.budget_factor * N * V // 128) * 128
    INVALID = jnp.uint32(0xFFFFFFFF)

    rng = np.random.default_rng(0)
    valid = rng.random(P) < args.valid_frac
    keys_np = rng.integers(0, 2**31, P, dtype=np.uint32)
    keys_np[~valid] = 0xFFFFFFFF
    keys = jnp.asarray(keys_np)
    pay = jnp.arange(P, dtype=jnp.int32)

    def baseline(keys, pay):
        ks, ps = lax.sort((keys, pay), is_stable=False, num_keys=1)
        # backward inverse-perm sort (the second sort of the real pipeline)
        _, pos = lax.sort((ps, jnp.arange(P, dtype=jnp.int32)),
                          is_stable=False, num_keys=1)
        return ks[0] + jnp.uint32(ps[0]) + jnp.uint32(pos[0])

    def compacted(keys, pay):
        pred = keys != INVALID
        cs = jnp.cumsum(pred.astype(jnp.int32))
        dst = jnp.where(pred, cs - 1, P + pay)       # globally unique
        keys_c = jnp.full((C,), INVALID, jnp.uint32).at[dst].set(
            keys, unique_indices=True, mode="drop")
        pay_c = jnp.zeros((C,), jnp.int32).at[dst].set(
            pay, unique_indices=True, mode="drop")
        ks, ps = lax.sort((keys_c, pay_c), is_stable=False, num_keys=1)
        # backward: sort C, then scatter positions back to [P]
        pay_asc, pos_c = lax.sort((ps, jnp.arange(C, dtype=jnp.int32)),
                                  is_stable=False, num_keys=1)
        pos_full = jnp.full((P,), C, jnp.int32).at[pay_asc].set(
            pos_c, unique_indices=True, mode="drop")
        return ks[0] + jnp.uint32(ps[0]) + jnp.uint32(pos_full[0])

    def pieces(keys, pay):
        # each stage isolated for the xprof op table
        pred = keys != INVALID
        cs = jnp.cumsum(pred.astype(jnp.int32))
        dst = jnp.where(pred, cs - 1, P + pay)
        keys_c = jnp.full((C,), INVALID, jnp.uint32).at[dst].set(
            keys, unique_indices=True, mode="drop")
        return cs[-1] + jnp.int32(keys_c[0])

    fns = {"baseline_2sorts_P": jax.jit(baseline),
           "compacted_2sorts_C": jax.jit(compacted),
           "pieces_cumsum_scatter": jax.jit(pieces)}

    results = {"P": P, "C": C, "valid": int(valid.sum())}
    for name, fn in fns.items():
        out = fn(keys, pay)
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            for _ in range(args.iters):
                out = fn(keys, pay)
            jax.block_until_ready(out)
            best = min(best, (time.time() - t0) / args.iters)
        results[name + "_ms"] = round(best * 1e3, 2)

    if args.trace:
        with jax.profiler.trace(args.trace):
            for fn in fns.values():
                for _ in range(3):
                    out = fn(keys, pay)
            jax.block_until_ready(out)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
