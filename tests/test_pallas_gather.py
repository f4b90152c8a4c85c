import numpy as np
import jax.numpy as jnp
import pytest

from contrastboundary_tpu.ops.pallas import gather_rows_dma


def test_gather_rows_dma_interpret(rng):
    """Correctness in interpreter mode (CPU); TPU timing lives in PERF.md."""
    n, c, m = 64, 128, 2048
    x = jnp.asarray(rng.randn(n, c).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, n, (m,)).astype(np.int32))
    out = gather_rows_dma(x, idx, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x)[np.asarray(idx)])


def test_gather_rows_dma_validates_shapes(rng):
    x = jnp.zeros((8, 64), jnp.float32)  # C not 128-aligned
    idx = jnp.zeros((1024,), jnp.int32)
    with pytest.raises(ValueError, match="multiple of 128"):
        gather_rows_dma(x, idx, interpret=True)
    x = jnp.zeros((8, 128), jnp.float32)
    idx = jnp.zeros((1000,), jnp.int32)  # M not tile-aligned
    with pytest.raises(ValueError, match="multiple of tile"):
        gather_rows_dma(x, idx, interpret=True)
