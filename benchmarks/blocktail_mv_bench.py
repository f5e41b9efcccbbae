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

    rng = np.random.default_rng(0)
    nbr = -(-n // b)
    nb = int(nnz * fill / (b * b))
    print(f"n={n} nnz={nnz} b={b} nb={nb} "
          f"(block storage {nb*b*b*4/1e9:.2f} GB)", flush=True)

    # scalar tail
    rows = jnp.asarray(np.sort(rng.integers(0, n, nnz)).astype(np.int32))
    cols = jnp.asarray(rng.integers(0, n, nnz).astype(np.int32))
    vals = jnp.asarray(rng.standard_normal(nnz).astype(np.float32))

    def scalar_mv(x, c):
        vals_, rows_, cols_ = c
        y = jax.ops.segment_sum(vals_ * x[cols_], rows_, num_segments=n)
        return y / jnp.linalg.norm(y)

    x0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    t = chain_time(scalar_mv, x0, (vals, rows, cols), n=10)
    print(f"scalar tail : {t*1e3:8.2f} ms  "
          f"({nnz/t/1e9:.2f} G gathers/s)", flush=True)

    # block tail (locality-ish block cols: near the block row)
    brows = jnp.asarray(np.sort(rng.integers(0, nbr, nb)).astype(np.int32))
    spread = rng.integers(-2000, 2000, nb)
    bcols = jnp.asarray(np.clip(np.asarray(brows) + spread, 0,
                                nbr - 1).astype(np.int32))
    B = jnp.asarray(rng.standard_normal((nb, b, b)).astype(np.float32))

    def blk_mv(x, c):
        B_, brows_, bcols_ = c
        xp = jnp.pad(x, (0, nbr * b - n)).reshape(nbr, b)
        xg = xp[bcols_]
        contrib = jnp.einsum("kij,kj->ki", B_, xg)
        y = jax.ops.segment_sum(contrib, brows_,
                                num_segments=nbr).reshape(-1)[:n]
        return y / jnp.linalg.norm(y)

    t_b = chain_time(blk_mv, x0, (B, brows, bcols), n=10)
    print(f"block tail  : {t_b*1e3:8.2f} ms  "
          f"({nb/t_b/1e9:.3f} G block-gathers/s, "
          f"{nb*b*b*4/t_b/1e9:.0f} GB/s storage read)", flush=True)
    print(f"speedup: {t/t_b:.1f}x", flush=True)


if __name__ == "__main__":
    main(b=int(sys.argv[1]) if len(sys.argv) > 1 else 8)
