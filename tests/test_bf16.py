"""End-to-end bf16 compute path for the score network.

The profile (BENCH.md) shows the Langevin workload dominated by
elementwise/norm fusions — HBM traffic, which bf16 activations halve.
These tests pin the two properties that make the bf16 path real:

1. every convolution in the traced forward actually runs on bf16 operands
   (round 1's "bf16" run silently promoted back to f32 at the first
   InstanceNorm++ because its f32 affine params promoted the activations);
2. the bf16 forward tracks the f32 forward within a small relative error,
   and the σ-scaled output is returned in f32 for the f32 Langevin state.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from score_based_channels_tpu.config import ModelConfig
from score_based_channels_tpu.eval.estimate import score_fn_from_params
from score_based_channels_tpu.models import make_score_model


@pytest.fixture(scope="module")
def model_and_params():
    model = make_score_model(ModelConfig(ngf=8, num_classes=50))
    x = jnp.zeros((2, 64, 16, 2), jnp.float32)
    params = model.init(jax.random.key(0), x, jnp.float32(1.0))["params"]
    return model, params


def _conv_dtypes(jaxpr):
    dts = []

    def walk(jp):
        for eqn in jp.eqns:
            if eqn.primitive.name == "conv_general_dilated":
                dts.extend(v.aval.dtype for v in eqn.invars)
            for sub in eqn.params.values():
                if hasattr(sub, "jaxpr"):
                    walk(sub.jaxpr)
                elif isinstance(sub, (list, tuple)):
                    for s in sub:
                        if hasattr(s, "jaxpr"):
                            walk(s.jaxpr)
    walk(jaxpr)
    return dts


def test_bf16_convs_stay_bf16(model_and_params):
    model, params = model_and_params
    score_fn = score_fn_from_params(model, params, dtype=jnp.bfloat16)
    x = jnp.ones((2, 64, 16, 2), jnp.float32)
    jaxpr = jax.make_jaxpr(lambda a: score_fn(a, jnp.float32(0.5)))(x).jaxpr
    dts = _conv_dtypes(jaxpr)
    assert dts, "no convolutions traced"
    assert all(dt == jnp.bfloat16 for dt in dts), (
        f"convs promoted off bf16: {sorted(set(map(str, dts)))}")


def test_bf16_forward_tracks_f32(model_and_params):
    model, params = model_and_params
    x = jax.random.normal(jax.random.key(1), (4, 64, 16, 2), jnp.float32)
    sigma = jnp.float32(0.7)
    f32 = score_fn_from_params(model, params)(x, sigma)
    b16 = score_fn_from_params(model, params, dtype=jnp.bfloat16)(x, sigma)
    assert b16.dtype == jnp.float32  # σ-scaling tail returns f32
    rel = np.linalg.norm(np.asarray(b16 - f32)) / np.linalg.norm(np.asarray(f32))
    assert rel < 0.05, f"bf16 forward deviates {rel:.3%} from f32"


def test_f32_path_unchanged(model_and_params):
    """dtype=float32 must be the identity wiring (parity tests rely on it)."""
    model, params = model_and_params
    x = jax.random.normal(jax.random.key(2), (2, 64, 16, 2), jnp.float32)
    sigma = jnp.float32(0.3)
    direct = model.apply({"params": params}, x, sigma)
    wrapped = score_fn_from_params(model, params, dtype=jnp.float32)(x, sigma)
    np.testing.assert_array_equal(np.asarray(direct), np.asarray(wrapped))
