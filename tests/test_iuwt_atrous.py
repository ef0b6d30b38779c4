"""Fused Pallas à-trous kernel (ops/pallas/iuwt_atrous.py) against the XLA
decompose — interpret mode on CPU; the same program runs compiled on TPU
(routed by ops/iuwt._atrous_pallas_scales)."""

import numpy as np
import jax.numpy as jnp
import pytest

from radler_tpu.ops.iuwt import decompose, iuwt_convolve
from radler_tpu.ops.pallas.iuwt_atrous import (
    atrous_decompose_lo,
    cascade_reach,
)


def test_cascade_reach_values():
    # Reach of scales 0..n-1: carried 2d chain + 4d at the deepest scale.
    assert cascade_reach(1) == 4
    assert cascade_reach(3) == 36
    assert cascade_reach(4) == 82
    assert cascade_reach(5) == 176


@pytest.mark.parametrize("n_lo", [1, 3, 5])
@pytest.mark.parametrize(
    "shape,block",
    [((200, 300), (64, 128)), ((256, 256), (128, 128))],
)
def test_atrous_matches_decompose(n_lo, shape, block):
    rng = np.random.default_rng(3)
    H, W = shape
    img = rng.standard_normal((H, W)).astype(np.float32)
    ref = np.asarray(decompose(jnp.asarray(img), 8))
    w, smooth = atrous_decompose_lo(
        jnp.asarray(img), n_lo, block_h=block[0], block_w=block[1],
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(w), ref[:n_lo], atol=2e-6)
    cur = jnp.asarray(img)
    for s in range(n_lo):
        cur = iuwt_convolve(cur, s + 1)
    np.testing.assert_allclose(
        np.asarray(smooth), np.asarray(cur), atol=2e-6
    )
