"""Fused GN+SiLU+conv resblock-tail dispatch: exactness + checkpoint
compatibility.

The ``norm1 -> act -> dropout -> conv1`` tail of every resblock can lower to
the Pallas fused kernel (`ops/fused_block_pallas.py`) under
`layers.set_fused_gn_conv_dispatch`.  These tests pin that the fused path
(interpret mode on CPU) matches the unfused XLA composition bit-for-bit
within float tolerance and declares the identical parameter tree, so the
policy is a pure lowering choice (reference behavior being fused:
`models/layers.py:637-641`, `models/layerspp.py:181-183`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conditional_score_diffusion_tpu.models import layers, layerspp


@pytest.fixture(autouse=True)
def _reset_policy():
    yield
    layers.set_fused_gn_conv_dispatch(None)
    layers.set_fused_block_dispatch(None)


def _randomize(params, seed=1):
    leaves, treedef = jax.tree.flatten(params)
    rng = np.random.RandomState(seed)
    leaves = [jnp.asarray(rng.randn(*leaf.shape).astype(np.float32) * 0.2) for leaf in leaves]
    return jax.tree.unflatten(treedef, leaves)


def _blocks():
    return {
        "ddpm_legacy": layers.ResnetBlockDDPM(act=jax.nn.silu, out_ch=32, dropout=0.1),
        "ddpmpp": layerspp.ResnetBlockDDPMpp(act=jax.nn.silu, out_ch=32, dropout=0.1),
        "biggan": layerspp.ResnetBlockBigGANpp(act=jax.nn.silu, out_ch=32, dropout=0.1),
    }


@pytest.mark.parametrize("kind", ["ddpm_legacy", "ddpmpp", "biggan"])
def test_fused_tail_matches_unfused(kind):
    block = _blocks()[kind]
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 6, 6, 32).astype(np.float32))
    temb = jnp.asarray(rng.randn(2, 16).astype(np.float32))

    layers.set_fused_gn_conv_dispatch(None)
    params = _randomize(block.init(jax.random.key(0), x, temb)["params"])
    ref = block.apply({"params": params}, x, temb)

    layers.set_fused_gn_conv_dispatch(lambda shape, out: True)
    got = block.apply({"params": params}, x, temb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_param_tree_identical_under_policy():
    block = _blocks()["ddpmpp"]
    x = jnp.zeros((1, 6, 6, 32))
    temb = jnp.zeros((1, 16))

    layers.set_fused_gn_conv_dispatch(None)
    off = jax.tree.map(lambda p: (p.shape, p.dtype), block.init(jax.random.key(0), x, temb))
    layers.set_fused_gn_conv_dispatch(lambda shape, out: True)
    on = jax.tree.map(lambda p: (p.shape, p.dtype), block.init(jax.random.key(0), x, temb))
    assert jax.tree.structure(off) == jax.tree.structure(on)
    assert jax.tree.leaves(off) == jax.tree.leaves(on)


def test_train_mode_stays_unfused():
    """Training must never hit the fused path (no VJP): with the policy on,
    train=True still runs the XLA composition, so gradients flow."""
    block = _blocks()["ddpmpp"]
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 6, 6, 32).astype(np.float32))
    temb = jnp.asarray(rng.randn(2, 16).astype(np.float32))
    params = _randomize(block.init(jax.random.key(0), x, temb)["params"])

    layers.set_fused_gn_conv_dispatch(lambda shape, out: True)

    def loss(p):
        out = block.apply(
            {"params": p}, x, temb, train=True, rngs={"dropout": jax.random.key(1)}
        )
        return jnp.sum(out**2)

    g = jax.grad(loss)(params)
    assert all(np.all(np.isfinite(np.asarray(leaf))) for leaf in jax.tree.leaves(g))


def test_policy_gates_by_shape():
    """Only shapes the policy selects lower to the fused path; others run
    unfused in the same model — mixed dispatch inside one apply."""
    seen = []

    def policy(shape, out):
        seen.append(tuple(shape))
        return False

    block = _blocks()["ddpmpp"]
    x = jnp.zeros((1, 6, 6, 32))
    temb = jnp.zeros((1, 16))
    layers.set_fused_gn_conv_dispatch(policy)
    params = block.init(jax.random.key(0), x, temb)["params"]
    block.apply({"params": params}, x, temb)
    assert seen and all(s == (1, 6, 6, 32) for s in seen)


def test_apply_dispatch_config_knobs():
    """`model.conv_dispatch` / `model.fused_tail` config knobs set the
    global policies (and default to off), so recipes can pin winners."""
    import ml_collections

    mc = ml_collections.ConfigDict()
    layers.apply_dispatch_config(mc)
    assert layers._CONV_DISPATCH["policy"] is None
    assert layers._FUSED_GN_DISPATCH["policy"] is None

    mc.conv_dispatch = "tuned"
    mc.fused_tail = True
    layers.apply_dispatch_config(mc)
    assert layers._CONV_DISPATCH["policy"] is layers.NAMED_CONV_POLICIES["tuned"]
    assert layers._FUSED_GN_DISPATCH["policy"] is layers.fused_tail_candidate_policy
    layers.set_conv_dispatch(None)


@pytest.mark.parametrize(
    "kind,out_ch",
    [
        ("ddpm_legacy", 32),   # identity shortcut
        ("ddpm_legacy", 48),   # NIN shortcut
        ("ddpmpp", 32),
        ("ddpmpp", 48),
        ("biggan", 32),        # identity (skip_rescale=True default)
        ("biggan", 48),        # conv1x1 shortcut
    ],
)
def test_whole_block_fusion_matches_unfused(kind, out_ch):
    """The whole-resblock kernel, wired through the module under
    set_fused_block_dispatch, reproduces the unfused block with the SAME
    parameters (checkpoint interchangeability at the module level)."""
    block = {
        "ddpm_legacy": layers.ResnetBlockDDPM(act=jax.nn.silu, out_ch=out_ch),
        "ddpmpp": layerspp.ResnetBlockDDPMpp(act=jax.nn.silu, out_ch=out_ch),
        "biggan": layerspp.ResnetBlockBigGANpp(act=jax.nn.silu, out_ch=out_ch),
    }[kind]
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 6, 6, 32).astype(np.float32))
    temb = jnp.asarray(rng.randn(2, 16).astype(np.float32))

    layers.set_fused_block_dispatch(None)
    params = _randomize(block.init(jax.random.key(0), x, temb)["params"])
    ref = block.apply({"params": params}, x, temb)

    layers.set_fused_block_dispatch(lambda shape, out: True)
    got = block.apply({"params": params}, x, temb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize(
    "kind,out_ch",
    [
        ("ddpm_legacy", 64),   # identity residual over the concat (32+32)
        ("ddpm_legacy", 48),   # SplitNIN shortcut
        ("ddpmpp", 64),
        ("ddpmpp", 48),
        ("biggan", 64),
        ("biggan", 48),        # split conv1x1 shortcut
    ],
)
def test_split_block_fusion_matches_unfused(kind, out_ch):
    """Decoder split-skip blocks lower to the split whole-block kernel and
    reproduce the unfused virtual-concat path with the SAME parameters."""
    block = {
        "ddpm_legacy": layers.ResnetBlockDDPM(act=jax.nn.silu, out_ch=out_ch, split_skip=True),
        "ddpmpp": layerspp.ResnetBlockDDPMpp(act=jax.nn.silu, out_ch=out_ch, split_skip=True),
        "biggan": layerspp.ResnetBlockBigGANpp(act=jax.nn.silu, out_ch=out_ch, split_skip=True),
    }[kind]
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 6, 6, 32).astype(np.float32))
    skip = jnp.asarray(rng.randn(2, 6, 6, 32).astype(np.float32))
    temb = jnp.asarray(rng.randn(2, 16).astype(np.float32))

    layers.set_fused_block_dispatch(None)
    params = _randomize(block.init(jax.random.key(0), x, temb, skip=skip)["params"])
    ref = block.apply({"params": params}, x, temb, skip=skip)

    layers.set_fused_block_dispatch(lambda shape, out: True)
    got = block.apply({"params": params}, x, temb, skip=skip)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-5, atol=3e-5)


def test_whole_block_param_tree_identical():
    for out_ch in (32, 48):
        block = layerspp.ResnetBlockDDPMpp(act=jax.nn.silu, out_ch=out_ch)
        x = jnp.zeros((1, 6, 6, 32))
        temb = jnp.zeros((1, 16))
        layers.set_fused_block_dispatch(None)
        off = jax.tree.map(lambda p: (p.shape, p.dtype), block.init(jax.random.key(0), x, temb))
        layers.set_fused_block_dispatch(lambda shape, out: True)
        on = jax.tree.map(lambda p: (p.shape, p.dtype), block.init(jax.random.key(0), x, temb))
        assert jax.tree.structure(off) == jax.tree.structure(on)
        assert jax.tree.leaves(off) == jax.tree.leaves(on)


def test_whole_block_train_and_updown_stay_unfused():
    """train=True and BigGAN up/down blocks never hit the kernel."""
    layers.set_fused_block_dispatch(lambda shape, out: True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 6, 6, 32).astype(np.float32))
    temb = jnp.asarray(rng.randn(2, 16).astype(np.float32))

    block = layerspp.ResnetBlockDDPMpp(act=jax.nn.silu, out_ch=32, dropout=0.0)
    params = _randomize(block.init(jax.random.key(0), x, temb)["params"])

    def loss(p):
        out = block.apply(
            {"params": p}, x, temb, train=True, rngs={"dropout": jax.random.key(1)}
        )
        return jnp.sum(out**2)

    g = jax.grad(loss)(params)
    assert all(np.all(np.isfinite(np.asarray(leaf))) for leaf in jax.tree.leaves(g))

    up = layerspp.ResnetBlockBigGANpp(act=jax.nn.silu, out_ch=32, up=True, fir=False)
    p_up = up.init(jax.random.key(0), x, temb)["params"]
    out = up.apply({"params": p_up}, x, temb)
    assert out.shape == (2, 12, 12, 32)


def test_non_silu_act_stays_unfused():
    block = layerspp.ResnetBlockDDPMpp(act=jax.nn.relu, out_ch=32, dropout=0.0)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 6, 6, 32).astype(np.float32))

    layers.set_fused_gn_conv_dispatch(None)
    params = _randomize(block.init(jax.random.key(0), x)["params"])
    ref = block.apply({"params": params}, x)

    layers.set_fused_gn_conv_dispatch(lambda shape, out: True)
    got = block.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0, atol=0)


def test_measured_policy_fallback(tmp_path, monkeypatch):
    """artifacts/measured_policy.json (written by the on-TPU ladder) becomes
    the production default for recipes without explicit knobs; explicit
    recipe values always win; invalid files fall back to built-ins
    (VERDICT r4 item 1: the winning policy flips via data, not a code edit)."""
    import json

    import ml_collections

    pol = tmp_path / "measured_policy.json"
    pol.write_text(json.dumps(
        {"conv_dispatch": "s2d_highres", "fused_tail": True,
         "fused_block": False, "winner": "fused20+s2d"}))
    monkeypatch.setenv("CSDT_POLICY_FILE", str(pol))
    monkeypatch.setenv("CSDT_MEASURED_POLICY", "1")  # conftest pins it off

    # no explicit knobs -> measured default applies
    mc = ml_collections.ConfigDict()
    layers.apply_dispatch_config(mc)
    assert layers._CONV_DISPATCH["policy"] is layers.NAMED_CONV_POLICIES["s2d_highres"]
    assert layers._FUSED_GN_DISPATCH["policy"] is layers.fused_tail_candidate_policy
    assert layers._FUSED_BLOCK_DISPATCH["policy"] is None

    # explicit recipe knobs beat the measured default
    mc.conv_dispatch = "none"
    mc.fused_tail = False
    layers.apply_dispatch_config(mc)
    assert layers._CONV_DISPATCH["policy"] is None
    assert layers._FUSED_GN_DISPATCH["policy"] is None

    # CSDT_MEASURED_POLICY=0 disables the fallback entirely
    monkeypatch.setenv("CSDT_MEASURED_POLICY", "0")
    layers.apply_dispatch_config(ml_collections.ConfigDict())
    assert layers._CONV_DISPATCH["policy"] is None

    # an invalid file (unknown policy name) is ignored, not fatal
    monkeypatch.setenv("CSDT_MEASURED_POLICY", "1")
    bad = tmp_path / "bad_policy.json"
    bad.write_text(json.dumps({"conv_dispatch": "not_a_policy"}))
    monkeypatch.setenv("CSDT_POLICY_FILE", str(bad))
    layers.apply_dispatch_config(ml_collections.ConfigDict())
    assert layers._CONV_DISPATCH["policy"] is None

    layers.set_conv_dispatch(None)
    layers.set_fused_gn_conv_dispatch(None)
    layers.set_fused_block_dispatch(None)


def test_measured_policy_writer_smoke(tmp_path, monkeypatch):
    """bench_eval_policy's winner-writer emits a file the fallback accepts,
    and refuses to write from a CPU/non-flagship run unless forced."""
    import json
    import sys as _sys

    sys_path_added = "/root/repo/scripts" not in _sys.path
    _sys.path.insert(0, "/root/repo/scripts")
    try:
        import bench_eval_policy as bep
    finally:
        if sys_path_added:
            _sys.path.remove("/root/repo/scripts")

    results = {"xla": 0.010, "fused20+s2d": 0.008, "fblock20": 0.007}
    out = tmp_path / "measured_policy.json"
    monkeypatch.setenv("CSDT_POLICY_FILE", str(out))

    # CPU + non-flagship shape: refuses without the force knob
    monkeypatch.delenv("BENCH_POLICY_WRITE", raising=False)
    bep._write_measured_policy(results)
    assert not out.exists()

    monkeypatch.setenv("BENCH_POLICY_WRITE", "1")
    bep._write_measured_policy(results)
    data = json.loads(out.read_text())
    # fblock20 is a stress row: fused20+s2d must win despite being slower
    assert data["winner"] == "fused20+s2d"
    assert data["conv_dispatch"] == "s2d_highres"
    assert data["fused_tail"] is True and data["fused_block"] is False
    assert data["speedup_vs_xla"] == 1.25

    # and the fallback accepts what the writer wrote
    monkeypatch.setenv("CSDT_MEASURED_POLICY", "1")
    assert layers.measured_policy_default()["winner"] == "fused20+s2d"
    layers._MEASURED_POLICY_CACHE.clear()
