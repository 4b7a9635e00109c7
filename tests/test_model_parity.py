"""Numerical parity vs the reference PyTorch NCSNv2 implementation.

Strategy (SURVEY.md §4): the reference repo is importable read-only at
/root/reference; we instantiate its torch model with random weights,
translate the state_dict with models/torch_compat.py, and require the flax
forward to match the torch forward to f32 tolerance. This validates every
subtle semantic (InstanceNorm++ statistics, align_corners resize,
ConvMeanPool phases, ELU, 2x−1 transform, ÷σ output) end to end, and the
checkpoint-key contract in both directions.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
torch = pytest.importorskip("torch")
if not os.path.isdir(os.path.join(REF, "ncsnv2")):
    pytest.skip("reference repo not available", allow_module_level=True)
sys.path.insert(0, REF)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from score_based_channels_tpu.config import ModelConfig  # noqa: E402
from score_based_channels_tpu.diffusion.sigmas import get_sigmas  # noqa: E402
from score_based_channels_tpu.models import make_score_model  # noqa: E402
from score_based_channels_tpu.models.torch_compat import (  # noqa: E402
    flax_params_to_torch_state_dict,
    torch_state_dict_to_flax,
)


class _NS:
    """Minimal attribute-bag standing in for the reference's DotMap config."""

    def __init__(self, **kw):
        self.__dict__.update(kw)


def _ref_config(ngf=8, num_classes=50):
    cfg = _NS()
    cfg.device = "cpu"
    cfg.data = _NS(logit_transform=False, rescaled=False, channels=2,
                   image_size=[16, 64])
    cfg.model = _NS(ngf=ngf, num_classes=num_classes,
                    nonlinearity="elu", normalization="InstanceNorm++",
                    sigma_dist="geometric", sigma_begin=39.15,
                    sigma_end=39.15 * 0.995 ** (num_classes - 1))
    return cfg


def _our_config(ngf=8, num_classes=50):
    return ModelConfig(ngf=ngf, num_classes=num_classes)


@pytest.mark.parametrize("arch", ["deepest", "deeper", "base"])
def test_forward_parity_random_weights(arch):
    from ncsnv2.models import ncsnv2 as ref_models

    torch.manual_seed(0)
    ngf, num_classes = 8, 50
    ref_cfg = _ref_config(ngf, num_classes)
    klass = {"deepest": ref_models.NCSNv2Deepest,
             "deeper": ref_models.NCSNv2Deeper,
             "base": ref_models.NCSNv2}[arch]
    ref_model = klass(ref_cfg).eval()

    arch_name = {"deepest": "ncsnv2_deepest", "deeper": "ncsnv2_deeper",
                 "base": "ncsnv2"}[arch]
    our_cfg = ModelConfig(arch=arch_name, ngf=ngf, num_classes=num_classes)
    model = make_score_model(our_cfg)

    params, sigmas = torch_state_dict_to_flax(ref_model.state_dict())
    assert sigmas is not None and sigmas.shape == (num_classes,)

    rng = np.random.RandomState(1)
    x = rng.randn(4, 2, 64, 16).astype(np.float32)  # torch NCHW
    labels = np.array([0, 10, 25, 49])

    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(x),
                            torch.from_numpy(labels)).numpy()

    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    used_sigmas = jnp.asarray(sigmas)[jnp.asarray(labels)]
    out = model.apply({"params": params}, x_nhwc, used_sigmas)
    out_nchw = np.transpose(np.asarray(out), (0, 3, 1, 2))

    scale = np.max(np.abs(ref_out))
    err = np.max(np.abs(out_nchw - ref_out)) / scale
    assert err < 2e-4, f"relative forward mismatch {err:.2e} for {arch}"


def test_param_tree_bijection():
    """flax→torch→flax round-trips the full Deepest parameter tree."""
    from ncsnv2.models import ncsnv2 as ref_models

    torch.manual_seed(0)
    ref_model = ref_models.NCSNv2Deepest(_ref_config()).eval()
    params, _ = torch_state_dict_to_flax(ref_model.state_dict())
    back = flax_params_to_torch_state_dict(params)
    ref_sd = {k: v.numpy() for k, v in ref_model.state_dict().items()
              if k != "sigmas"}
    assert set(back) == set(ref_sd)
    for k in ref_sd:
        np.testing.assert_array_equal(back[k], ref_sd[k], err_msg=k)


def test_sigma_buffer_matches_reference_schedule():
    from ncsnv2.models import ncsnv2 as ref_models

    ref_model = ref_models.NCSNv2Deepest(_ref_config(num_classes=64))
    ours = np.asarray(get_sigmas(39.15, 39.15 * 0.995**63, 64))
    np.testing.assert_allclose(ref_model.sigmas.numpy(), ours, rtol=1e-6)


def test_deepest_param_count_full_size():
    model = make_score_model(ModelConfig())
    x = jnp.zeros((1, 64, 16, 2))
    params = model.init(jax.random.key(0), x, jnp.float32(1.0))["params"]
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    assert n == 5_890_082  # measured on the reference (SURVEY.md §6)


@pytest.mark.parametrize("norm", ["InstanceNorm", "VarianceNorm", "None"])
def test_norm_variants_parity(norm):
    """The alternative norm factories match the reference semantics."""
    from ncsnv2.models import normalization as ref_norm

    torch.manual_seed(3)
    if norm == "InstanceNorm":
        # reference maps 'InstanceNorm' to torch nn.InstanceNorm2d with
        # affine=True (normalization.py get_normalization)
        ref = torch.nn.InstanceNorm2d(8, affine=True)
        with torch.no_grad():
            ref.weight.normal_(1.0, 0.3)
            ref.bias.normal_(0.0, 0.3)
        params = {"gamma": ref.weight.detach().numpy(),
                  "beta": ref.bias.detach().numpy()}
    elif norm == "VarianceNorm":
        ref = ref_norm.VarianceNorm2d(8)
        params = {"alpha": ref.alpha.detach().numpy()}
    else:
        ref = ref_norm.NoneNorm2d(8)
        params = {}

    from score_based_channels_tpu.models.layers import get_normalization

    ours = get_normalization(norm)(8)
    x = np.random.RandomState(0).randn(3, 8, 6, 4).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    got = ours.apply({"params": params}, x_nhwc)
    got_nchw = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got_nchw, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("act", ["elu", "relu", "lrelu", "swish"])
def test_activation_parity(act):
    from ncsnv2.models.layers import get_act as ref_get_act
    from score_based_channels_tpu.models.layers import get_act

    cfg = _NS()
    cfg.model = _NS(nonlinearity=act)
    ref = ref_get_act(cfg)
    ours = get_act(act)
    x = np.linspace(-3, 3, 101).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(ours(jnp.asarray(x))), want,
                               rtol=1e-5, atol=1e-6)
