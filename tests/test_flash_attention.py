"""Fused VMEM-resident attention kernel (pallas/flash_attention.py).

Interpret-mode parity against the jnp twin with the kernel's own numerics
(f32 logits / f32 softmax / bf16 AV), shape gating, and the custom-VJP
gradient path the null-text optimization depends on
(reference inversion.py:184-212 backprops through every attention)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from comfystereo_tpu.pallas import flash_attention as fa

INTERP = jax.default_backend() != "tpu"


@pytest.mark.parametrize("bh,nq,nk,d", [
    (4, 1024, 1024, 40),    # SD1.5 level-0 head shape (q-blocked)
    (2, 1024, 2048, 40),    # BN 'bi' stereo: kv = both views
    (2, 1024, 1024, 80),    # SD level-1 head dim (pads to 128 lanes)
    (2, 1024, 1024, 64),    # exact lane fit
])
def test_kernel_matches_reference(bh, nq, nk, d):
    q = jax.random.normal(jax.random.PRNGKey(0), (bh, nq, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (bh, nk, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (bh, nk, d), jnp.bfloat16)
    assert fa.supports(nq, nk, d, jnp.bfloat16)
    out = fa.flash_attention(q, k, v, d ** -0.5, INTERP)
    ref = fa._reference(q, k, v, d ** -0.5)
    assert out.dtype == jnp.bfloat16
    # Softmax-weighted averages of O(1) values; 1-2 bf16 ulps, plus ~1 ulp
    # from the online-softmax rescale reordering the same f32 sums.
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=4e-3)


def test_supports_gating():
    ok = fa.supports
    assert not ok(1024, 1024, 40, jnp.float32)       # f32 -> XLA path
    assert not ok(512, 1024, 40, jnp.bfloat16)       # short q
    assert not ok(1024, 1000, 40, jnp.bfloat16)      # kv not lane-aligned
    assert not ok(1024, 1024, 160, jnp.bfloat16)     # head_dim > 128
    assert not ok(1056, 1024, 40, jnp.bfloat16)      # no feasible q block
    assert ok(4096, 4096, 40, jnp.bfloat16)
    assert ok(4096, 8192, 40, jnp.bfloat16)          # bi-stereo shape


def test_grad_flows_and_matches_bf16_reference():
    q = jax.random.normal(jax.random.PRNGKey(3), (2, 1024, 40),
                          jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(4), (2, 1024, 40),
                          jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(5), (2, 1024, 40),
                          jnp.bfloat16)

    def loss_flash(q_):
        o = fa.flash_attention(q_, k, v, 40 ** -0.5, INTERP)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_ref(q_):
        o = fa._reference_bf16(q_, k, v, 40 ** -0.5)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g = jax.grad(loss_flash)(q)
    g_ref = jax.grad(loss_ref)(q)
    gf = np.asarray(g, np.float32)
    assert np.isfinite(gf).all()
    # The VJP recomputes through the bf16-logit formulation; the only
    # divergence from that path's own grad is the incoming cotangent
    # (2*o uses the kernel's output, ~1 bf16 ulp from the reference's).
    np.testing.assert_allclose(gf, np.asarray(g_ref, np.float32),
                               atol=4e-3)
