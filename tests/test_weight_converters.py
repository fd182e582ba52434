"""Structural validation of the torch->flax weight converters.

The real pt_inception / lpips weights are unavailable offline; these tests
build synthetic torch state dicts with the exact upstream key layouts
(derived from the flax param tree), run the converters, and check that the
converted trees load and run through the flax models.  This pins the
key-mapping and BN-folding logic so only numerics remain to validate when
weights are present.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from conditional_score_diffusion_tpu.eval.inception import (
    create_inception,
    fold_batchnorm,
    load_fid_inception_params,
)


def _torch_state_dict_from_flax(params):
    """Emit a pt_inception-style state dict covering every BasicConv2d."""
    sd = {}

    def walk(tree, path):
        if set(tree.keys()) == {"conv"}:
            k = tree["conv"]["kernel"]  # HWIO
            kh, kw, cin, cout = k.shape
            prefix = ".".join(path)
            rng = np.random.RandomState(abs(hash(prefix)) % 2**31)
            sd[f"{prefix}.conv.weight"] = torch.from_numpy(
                rng.randn(cout, cin, kh, kw).astype(np.float32) * 0.05
            )
            sd[f"{prefix}.bn.weight"] = torch.from_numpy(
                (1 + 0.1 * rng.randn(cout)).astype(np.float32)
            )
            sd[f"{prefix}.bn.bias"] = torch.from_numpy(
                (0.1 * rng.randn(cout)).astype(np.float32)
            )
            sd[f"{prefix}.bn.running_mean"] = torch.from_numpy(
                (0.1 * rng.randn(cout)).astype(np.float32)
            )
            sd[f"{prefix}.bn.running_var"] = torch.from_numpy(
                (1 + 0.1 * rng.rand(cout)).astype(np.float32)
            )
            return
        for name, sub in tree.items():
            walk(sub, path + [name])

    walk(params, [])
    return sd


def test_fold_batchnorm_math():
    rng = np.random.RandomState(0)
    w = rng.randn(3, 3, 4, 8).astype(np.float32)
    gamma, beta = rng.randn(8).astype(np.float32), rng.randn(8).astype(np.float32)
    mean, var = rng.randn(8).astype(np.float32), rng.rand(8).astype(np.float32) + 0.5
    wf, bf = fold_batchnorm(w, gamma, beta, mean, var, eps=1e-3)
    # conv(x, wf) + bf == BN(conv(x, w)) for a random input
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    conv = lambda k: jax.lax.conv_general_dilated(
        x, jnp.asarray(k), (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    want = (conv(w) - mean) / np.sqrt(var + 1e-3) * gamma + beta
    got = conv(wf) + bf
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_inception_converter_round_trip(tmp_path):
    _, ref_params = create_inception((0, 1, 2, 3))
    sd = _torch_state_dict_from_flax(ref_params)
    path = str(tmp_path / "pt_inception_fake.pth")
    torch.save(sd, path)

    params = load_fid_inception_params(path)
    # identical tree structure
    ref_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_leaves_with_path(ref_params)}
    got_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_leaves_with_path(params)}
    assert got_paths == ref_paths

    # converted params run through the model
    apply_fn, _ = create_inception((3,), params=None)
    from conditional_score_diffusion_tpu.eval.inception import InceptionV3FID

    module = InceptionV3FID(output_blocks=(3,))
    out = module.apply({"params": params}, jnp.zeros((1, 64, 64, 3)))
    assert out[0].shape == (1, 2048)
    assert np.isfinite(np.asarray(out[0])).all()


def test_inception_converter_missing_file():
    with pytest.raises(FileNotFoundError, match="CSDT_INCEPTION_WEIGHTS"):
        load_fid_inception_params("/nonexistent/path.pth")


def test_lpips_converter_round_trip(tmp_path):
    from conditional_score_diffusion_tpu.eval.lpips import _ALEX_CONVS, load_lpips

    rng = np.random.RandomState(0)
    sd = {}
    in_ch = 3
    # torchvision alexnet features indices: conv layers at 0,3,6,8,10
    for idx, (out_ch, k, s, p) in zip([0, 3, 6, 8, 10], _ALEX_CONVS):
        sd[f"features.{idx}.weight"] = torch.from_numpy(
            rng.randn(out_ch, in_ch, k, k).astype(np.float32) * 0.02
        )
        sd[f"features.{idx}.bias"] = torch.from_numpy(
            np.zeros(out_ch, np.float32)
        )
        in_ch = out_ch
    alex_path = str(tmp_path / "alexnet.pth")
    torch.save(sd, alex_path)

    lin_sd = {}
    for i, (out_ch, *_rest) in enumerate(_ALEX_CONVS):
        lin_sd[f"lin{i}.model.1.weight"] = torch.from_numpy(
            np.abs(rng.randn(1, out_ch, 1, 1)).astype(np.float32)
        )
    lin_path = str(tmp_path / "lpips_alex.pth")
    torch.save(lin_sd, lin_path)

    fn = load_lpips(alex_path, lin_path)
    a = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    d_ab = np.asarray(fn(a, b))
    d_aa = np.asarray(fn(a, a))
    assert d_ab.shape == (2,)
    np.testing.assert_allclose(d_aa, 0.0, atol=1e-6)  # identical images
    assert (d_ab > 0).all()
