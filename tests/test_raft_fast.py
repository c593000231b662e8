"""Pin the fused update-block inference path (models/raft/fast_update.py)
to the flax graph: exact output-channel conv fusions must reproduce the
UpdateBlock and full-RAFT outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdvc_tpu.models.raft.fast_update import fused_update_step
from rdvc_tpu.models.raft.raft import RAFT
from rdvc_tpu.models.raft.update import UpdateBlock

B, H8, W8 = 2, 6, 8
CORR_CH = 4 * 81


@pytest.fixture(scope="module")
def update_vars():
    blk = UpdateBlock(compute_dtype=jnp.float32)
    rng = np.random.RandomState(0)
    args = (
        jnp.asarray(rng.randn(B, H8, W8, 128), jnp.float32) * 0.1,
        jnp.asarray(rng.rand(B, H8, W8, 128), jnp.float32),
        jnp.asarray(rng.randn(B, H8, W8, CORR_CH), jnp.float32) * 0.1,
        jnp.asarray(rng.randn(B, H8, W8, 2), jnp.float32),
    )
    variables = blk.init(jax.random.PRNGKey(1), *args)
    return blk, variables, args


def test_fused_update_matches_flax_f32(update_vars):
    blk, variables, args = update_vars
    h0, d0, m0 = blk.apply(variables, *args)
    h1, d1, m1 = fused_update_step(variables["params"], *args, jnp.float32)
    np.testing.assert_allclose(h1, h0, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(d1, d0, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(m1, m0, atol=2e-5, rtol=1e-5)


def test_fused_update_bf16_close(update_vars):
    """bf16 fused path stays within bf16 accumulation noise of flax bf16."""
    blk, variables, args = update_vars
    blk16 = UpdateBlock(compute_dtype=jnp.bfloat16)
    h0, d0, m0 = blk16.apply(variables, *args)
    h1, d1, m1 = fused_update_step(variables["params"], *args, jnp.bfloat16)
    np.testing.assert_allclose(
        np.float32(h1), np.float32(h0), atol=3e-2, rtol=3e-2
    )
    np.testing.assert_allclose(np.float32(d1), np.float32(d0), atol=3e-2)
    np.testing.assert_allclose(np.float32(m1), np.float32(m0), atol=6e-2)


def test_raft_fused_flag_end_to_end():
    """Full RAFT forward: fused_update=True reproduces the flax flow."""
    rng = np.random.RandomState(2)
    a = jnp.asarray(rng.rand(1, 48, 64, 3), jnp.float32)
    b = jnp.asarray(rng.rand(1, 48, 64, 3), jnp.float32)
    ref = RAFT(iters=2, compute_dtype=jnp.float32)
    variables = ref.init(jax.random.PRNGKey(3), a, b)
    f0 = ref.apply(variables, a, b, train=False)
    fast = RAFT(iters=2, compute_dtype=jnp.float32, fused_update=True)
    f1 = fast.apply(variables, a, b, train=False)
    np.testing.assert_allclose(f1, f0, atol=5e-4, rtol=1e-4)
