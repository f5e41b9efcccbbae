"""Device microbenchmark: scalar-COO-tail SpMV vs BSR block-tail SpMV
at pikachu-refine-2 scale (synthetic indices with the measured block
statistics).  Validates the core claim of the block tail — one gather
index moving b contiguous values beats b scalar gathers — ON the TPU,
before committing the production pikachu run to it.

Honest timing: data-dependent chains (y feeds the next x), scalar
readback, differential chain lengths (PERFORMANCE.md methodology).
"""
import sys


import numpy as np

sys.path.insert(0, "/root/repo")


from _timing import chain_time  # noqa: E402  (shared timing helper)


def main(n=1_360_000, nnz=50_000_000, fill=9.1, b=8):
    import jax
    import jax.numpy as jnp

    nbr = -(-n // b)
    nb = int(nnz * fill / (b * b))
    print(f"n={n} nnz={nnz} b={b} nb={nb} "
          f"(block storage {nb*b*b*4/1e9:.2f} GB)", flush=True)

    # generate ON DEVICE: shipping ~2.4 GB of synthetic host arrays
    # through the remote transport dominated the wall clock
    keys = jax.random.split(jax.random.PRNGKey(0), 6)

    # scalar tail
    rows = jnp.sort(jax.random.randint(keys[0], (nnz,), 0, n, jnp.int32))
    cols = jax.random.randint(keys[1], (nnz,), 0, n, jnp.int32)
    vals = jax.random.normal(keys[2], (nnz,), jnp.float32)

    def scalar_mv(x, c):
        vals_, rows_, cols_ = c
        y = jax.ops.segment_sum(vals_ * x[cols_], rows_, num_segments=n)
        return y / jnp.linalg.norm(y)

    x0 = jax.random.normal(keys[3], (n,), jnp.float32)
    t = chain_time(scalar_mv, x0, (vals, rows, cols), n=10)
    print(f"scalar tail : {t*1e3:8.2f} ms  "
          f"({nnz/t/1e9:.2f} G gathers/s)", flush=True)

    # block tail (locality-ish block cols: near the block row)
    brows = jnp.sort(jax.random.randint(keys[4], (nb,), 0, nbr,
                                        jnp.int32))
    bcols = jnp.clip(brows + jax.random.randint(keys[5], (nb,), -2000,
                                                2000), 0,
                     nbr - 1).astype(jnp.int32)
    # COMPONENT-MAJOR block storage [b, b, nb] — the production layout
    # (block_offset.py): the block-major [nb, b, b] view gets T(8,128)
    # tiling on the trailing (8, 8) dims = 16x HBM padding (measured
    # compile OOM at this scale, 29 GB for 7.1M blocks)
    B = jax.random.normal(keys[5], (b, b, nb), jnp.float32)

    def blk_mv(x, c):
        B_, brows_, bcols_ = c
        xp = jnp.pad(x, (0, nbr * b - n)).reshape(nbr, b)
        xg = xp[bcols_]                              # [nb, b] row gather
        contribT = jnp.einsum("ijk,jk->ik", B_, xg.T)    # [b, nb]
        y = jax.ops.segment_sum(contribT.T, brows_,
                                num_segments=nbr).reshape(-1)[:n]
        return y / jnp.linalg.norm(y)

    t_b = chain_time(blk_mv, x0, (B, brows, bcols), n=10)
    print(f"block tail  : {t_b*1e3:8.2f} ms  "
          f"({nb/t_b/1e9:.3f} G block-gathers/s, "
          f"{nb*b*b*4/t_b/1e9:.0f} GB/s storage read)", flush=True)
    print(f"speedup: {t/t_b:.1f}x", flush=True)


if __name__ == "__main__":
    main(b=int(sys.argv[1]) if len(sys.argv) > 1 else 8)
