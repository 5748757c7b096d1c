"""Which access PATTERN makes TPU gathers slow? Chained loop, fixed shapes.

 a) random base per lane                      (142 M/s in probe_exact)
 b) pixel-coherent: adjacent lanes ~1 row apart (the real march pattern)
 c) duplicated: groups of 16 lanes share one address
 d) coherent but 64-row strided (same region, distinct bursts)
 e) pixel-coherent indices, bit-mixed address (the permuted-table candidate)
"""

import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from perf_probe import synthetic_mosaic_device

from functools import partial


def main():
    print("devices:", jax.devices(), flush=True)
    H, W, ROUNDS = 456, 800, 24
    G = H * W * ROUNDS
    mosaic = synthetic_mosaic_device(n=12001)
    cell = mosaic.cell_heights_flat
    jax.block_until_ready(cell)
    n_rows = cell.shape[0]
    print(f"table {n_rows*16//2**20} MB", flush=True)

    @partial(jax.jit, static_argnames=("mix",))
    def run(tbl, base, step, mix):
        def body(k, acc):
            jit_ = (jnp.abs(acc) % 3.0).astype(jnp.int32)  # chain dependency
            idx = (base + k * step + jit_) % n_rows
            if mix:
                # group permutation: scatter 128-row groups across the table
                # (what a permuted cell-table layout would do); bijective on
                # the group domain when gcd(1021, n_groups) == 1.
                n_groups = n_rows // 128
                g = idx >> 7
                idx = (((g * jnp.int32(1021)) % jnp.int32(n_groups)) << 7) | (idx & 127)
            rows = tbl[idx]
            return acc + rows[..., 0] + rows[..., 3]

        return jax.lax.fori_loop(0, ROUNDS, body, jnp.zeros_like(base, jnp.float32)).sum()

    def bench(label, base, step, mix=False):
        out = run(cell, base, step, mix)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        outs = [run(cell, base, step, mix) for _ in range(8)]
        jax.block_until_ready(outs)
        ms = (time.perf_counter() - t0) / 8 * 1e3
        print(f"{label:<46s} {ms:8.2f} ms  -> {G/ms/1e3:7.1f} M gathers/s", flush=True)

    key = jax.random.PRNGKey(0)
    py = jnp.arange(H, dtype=jnp.int32)[:, None]
    px = jnp.arange(W, dtype=jnp.int32)[None, :]

    base_rand = jax.random.randint(key, (H, W), 0, n_rows - ROUNDS * 8, jnp.int32)
    bench("a) random base, step 3", base_rand, jnp.int32(3))

    base_coh = (py * 12001 + px) + 6000 * 12001  # a compact 2-D block mid-table
    bench("b) coherent block, step 1 row (march-like)", base_coh, jnp.int32(12001))
    bench("b2) coherent block, step 3", base_coh, jnp.int32(3))

    base_dup = (py * 12001 + (px // 16) * 16) + 6000 * 12001
    bench("c) 16-lane duplicated addresses", base_dup, jnp.int32(12001))

    base_str = (py * 12001 + px * 64) % (n_rows // 2)
    bench("d) 64-row lane stride", base_str, jnp.int32(12001))

    bench("e) coherent + group-perm (permuted-table sim)", base_coh, jnp.int32(12001), mix=True)

    # f) sparser march-like set: pixels share cells (warp-dup), region ~100k
    base_dup2 = (py * 12001 + px // 4 + 3000) + 6000 * 12001
    bench("f) dense+duplicated (near-field march)", base_dup2, jnp.int32(12001))
    bench("f2) same + group-perm", base_dup2, jnp.int32(12001), mix=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
