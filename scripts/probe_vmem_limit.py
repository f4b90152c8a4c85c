"""Does --xla_tpu_scoped_vmem_limit_kib reach this deployment's remote
compiler, and does it unblock the fused attention kernel at the REAL grid
shape (the one pt_attn_ok's tiny probe missed)? Round-4 follow-up to the
enc0 scoped-VMEM OOM (17.02M vs 16M) in /tmp/ab_attn_r4.log."""
import os
import sys

os.environ["LIBTPU_INIT_ARGS"] = (
    os.environ.get("LIBTPU_INIT_ARGS", "")
    + " --xla_tpu_scoped_vmem_limit_kib=65536"
).strip()

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from contrastboundary_tpu.utils.cache import setup_compile_cache

setup_compile_cache()

from contrastboundary_tpu.ops.pallas.pt_attn import pt_attn, _probe_params

# enc0 failing shape: B=4, M=16384 (64 tiles of 256), C=32, K=8, width=3
TILE, WIDTH, WINDOW = 256, 3, 1
B, M, C, K, S = 4, 16384, 32, 8, 8
cs = C // S
params = _probe_params(C, cs)
rng = np.random.RandomState(0)
q = jnp.asarray(rng.randn(B, M, C).astype(np.float32), jnp.bfloat16)
kv = jnp.asarray(rng.randn(B, M, 2 * C).astype(np.float32), jnp.bfloat16)
rel = jnp.asarray(rng.randn(B, M, K, 3).astype(np.float32))
li = jnp.asarray(rng.randint(0, TILE * WIDTH, (B, M, K)).astype(np.int32))

out, _, _ = pt_attn(q, kv, rel, li, TILE, WIDTH, WINDOW, S, False, *params)
jax.block_until_ready(out)
print("FWD OK", out.shape, flush=True)
g = jax.grad(
    lambda qq, kvv: jnp.sum(
        pt_attn(qq, kvv, rel, li, TILE, WIDTH, WINDOW, S, False, *params)[0]
        .astype(jnp.float32)
    ),
    argnums=(0, 1),
)(q, kv)
jax.block_until_ready(g)
print("BWD OK", flush=True)
