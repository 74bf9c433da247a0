"""Pallas stem weight-gradient kernel (ops/pallas_conv.py): dW parity vs
jax.vjp of the plain XLA conv, in f32 on small shapes (interpret mode on
CPU), plus the custom_vjp wrapper's full gradient parity. Follows the
f64-oracle guidance of tests/test_s2d_stem.py: comparisons run in f32
inputs where both sides use identical accumulation, so tolerances are
tight."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dd3d_tpu.ops.pallas_conv import conv2d_s1_same, conv_dw_s1_same_pallas

INTERPRET = jax.default_backend() != "tpu"


def _ref_dw(x, wt, dy):
    def f(w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(wt.shape[0] // 2,) * 2, (wt.shape[0] // 2,) * 2],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    _, vjp = jax.vjp(f, wt)
    return vjp(dy)[0]


@pytest.mark.parametrize("shape,k,co", [
    ((2, 16, 24, 12), 5, 16),   # stem-like: CI=12, 5x5
    ((2, 16, 24, 8), 3, 8),     # level0-like
    ((1, 8, 16, 4), 7, 4),      # odd size, k=7
])
def test_dw_matches_xla_vjp(shape, k, co):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    dy = jnp.asarray(rng.randn(shape[0], shape[1], shape[2], co).astype(np.float32))
    wt = jnp.asarray(rng.randn(k, k, shape[3], co).astype(np.float32) * 0.1)
    ref = np.asarray(_ref_dw(x, wt, dy))
    got = np.asarray(conv_dw_s1_same_pallas(x, dy, k, interpret=INTERPRET))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-4)


def test_custom_vjp_full_parity():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 24, 12).astype(np.float32))
    wt = jnp.asarray(rng.randn(5, 5, 12, 16).astype(np.float32) * 0.1)

    def loss_pallas(x, w):
        y = conv2d_s1_same(x, w, INTERPRET)
        return jnp.sum(jnp.sin(y))

    def loss_ref(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(2, 2), (2, 2)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(jnp.sin(y))

    (va, (gxa, gwa)) = jax.value_and_grad(loss_pallas, argnums=(0, 1))(x, wt)
    (vb, (gxb, gwb)) = jax.value_and_grad(loss_ref, argnums=(0, 1))(x, wt)
    np.testing.assert_allclose(float(va), float(vb), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gxa), np.asarray(gxb), rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gwa), np.asarray(gwb), rtol=2e-5, atol=2e-4)


def test_dw_bf16_inputs_accumulate_f32():
    """bf16 activations/cotangents (the train dtype) accumulate in f32:
    parity vs the f32 XLA vjp of the SAME bf16 inputs."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 16, 24, 12), jnp.bfloat16)
    dy = jnp.asarray(rng.randn(2, 16, 24, 16), jnp.bfloat16)
    wt = jnp.zeros((5, 5, 12, 16), jnp.bfloat16)
    ref = np.asarray(_ref_dw(x.astype(jnp.float32), wt.astype(jnp.float32),
                             dy.astype(jnp.float32)))
    got = np.asarray(conv_dw_s1_same_pallas(x, dy, 5, interpret=INTERPRET))
    np.testing.assert_allclose(got, ref, rtol=1e-2, atol=2e-2)  # bf16 input rounding only
