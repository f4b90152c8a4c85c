"""Within-session A/B: XLA one-hot tile gather vs the Pallas kernel, at the
flagship level-0 shapes, forward and forward+backward. Queue-N-steps,
block-once, best-of-rounds (CLAUDE.md measurement discipline)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from contrastboundary_tpu.utils.cache import setup_compile_cache
setup_compile_cache()

from contrastboundary_tpu.ops.tile_gather import tile_window_gather
from contrastboundary_tpu.ops.pallas.tile_gather_pl import tile_window_gather_pl


def bench(fn, args, iters=20, rounds=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.time() - t0) / iters)
    return best * 1e3


def main():
    rng = np.random.RandomState(0)
    cases = [
        # (name, b, m, tile, width, k, cl, dtype)
        ("L0-kv b4 n16384 k8 c64 bf16", 4, 16384, 256, 3, 8, 64, jnp.bfloat16),
        ("L0-cbl b4 n16384 k35 c45 bf16", 4, 16384, 256, 3, 35, 45, jnp.bfloat16),
        ("L0-kv f32", 4, 16384, 256, 3, 8, 64, jnp.float32),
        ("L1-kv b4 n4096 k16 c128 bf16", 4, 4096, 256, 3, 16, 128, jnp.bfloat16),
    ]
    for name, b, m, tile, width, k, cl, dtype in cases:
        x = jnp.asarray(rng.randn(b, m, cl).astype(np.float32)).astype(dtype)
        w = width * tile
        li = jnp.asarray(rng.randint(0, w + 1, (b, m, k)).astype(np.int32))

        xla_f = jax.jit(lambda x, li: tile_window_gather(x, li, tile, width))
        pl_f = jax.jit(lambda x, li: tile_window_gather_pl(x, li, tile, width))

        def mk_grad(impl):
            def loss(x, li):
                o = impl(x, li, tile, width)
                return jnp.sum(o.astype(jnp.float32) * 0.001)
            return jax.jit(jax.grad(loss, argnums=0))

        xla_g = mk_grad(tile_window_gather)
        pl_g = mk_grad(tile_window_gather_pl)

        try:
            o_pl = pl_f(x, li)
            o_x = xla_f(x, li)
            err = float(
                jnp.max(jnp.abs(o_pl.astype(jnp.float32) - o_x.astype(jnp.float32)))
            )
            g_pl = pl_g(x, li)
            g_x = xla_g(x, li)
            gerr = float(
                jnp.max(jnp.abs(g_pl.astype(jnp.float32) - g_x.astype(jnp.float32)))
            )
        except Exception as e:
            print(f"{name}: PALLAS FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue

        t_xf = bench(xla_f, (x, li))
        t_pf = bench(pl_f, (x, li))
        t_xg = bench(xla_g, (x, li))
        t_pg = bench(pl_g, (x, li))
        print(
            f"{name}: fwd xla {t_xf:.2f}ms pallas {t_pf:.2f}ms "
            f"({t_xf/t_pf:.2f}x) | fwd+bwd xla {t_xg:.2f}ms pallas "
            f"{t_pg:.2f}ms ({t_xg/t_pg:.2f}x) | err {err:.2e} gerr {gerr:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
