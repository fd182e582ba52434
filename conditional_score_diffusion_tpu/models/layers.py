"""Shared score-network layers (Flax, NHWC).

Reference: `models/layers.py` (DDPM-era conv helpers, `variance_scaling` /
`default_init`, `get_timestep_embedding`, `NIN`, `AttnBlock`, legacy
`Upsample`/`Downsample`, `ResnetBlockDDPM` with 2D/3D support).

The reference's `variance_scaling` docstring says "Ported from JAX" — here it
simply *is* `jax.nn.initializers.variance_scaling`.
"""

from __future__ import annotations

import json
import math
import os
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def default_init(scale: float = 1.0):
    """DDPM initialization (reference `models/layers.py:88-91`)."""
    scale = 1e-10 if scale == 0 else scale
    return jax.nn.initializers.variance_scaling(scale, "fan_avg", "uniform")


def get_act(config) -> Callable:
    """Activation from config (reference `models/layers.py:29-41`)."""
    name = config.model.nonlinearity.lower()
    if name == "elu":
        return jax.nn.elu
    if name == "relu":
        return jax.nn.relu
    if name == "lrelu":
        return lambda x: jax.nn.leaky_relu(x, negative_slope=0.2)
    if name == "swish":
        return jax.nn.silu
    raise NotImplementedError(f"activation {name!r} does not exist")


def get_timestep_embedding(timesteps: jnp.ndarray, embedding_dim: int, max_positions: int = 10000):
    """Transformer sinusoidal embedding (reference `models/layers.py:524-539`)."""
    assert timesteps.ndim == 1
    half_dim = embedding_dim // 2
    emb = math.log(max_positions) / (half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    assert emb.shape == (timesteps.shape[0], embedding_dim)
    return emb


#: Global shape-gated lowering policy for stride-1 SAME 3x3 convs.
#: ``None`` -> always XLA's native conv.  Otherwise a callable
#: ``policy(x_shape, out_ch) -> {'xla','im2col','s2d4','s2d_dense'}``.
#: Set via :func:`set_conv_dispatch` (configs are static, so the policy is
#: resolved at trace time; every mode is an exact-math rewrite of the same
#: convolution — see `ops/im2col.py` and `ops/space_to_depth.py`).
_CONV_DISPATCH: dict = {"policy": None}


def set_conv_dispatch(policy: Optional[Callable]) -> None:
    _CONV_DISPATCH["policy"] = policy


def default_tpu_conv_policy(x_shape, out_ch: int) -> str:
    """Candidate policy for the latency-bound low-resolution tail; only
    becomes the production default where BENCH_NOTES round 3 records a
    measured win (see `scripts/bench_lowres_conv.py`)."""
    B, H, W, C = x_shape
    if H * W <= 400:  # the 5x5-20x20 tail
        return "im2col"
    return "xla"


#: Shape-gated dispatch for the fused GroupNorm+SiLU+3x3-conv Pallas kernel
#: (`ops/fused_block_pallas.py`) on the ``norm1 -> act -> dropout -> conv1``
#: tail every resblock ends with.  ``None`` -> always the unfused XLA
#: composition.  Otherwise ``policy(h_shape, out_ch) -> bool``.  The fused
#: path is eval-only (dropout is identity, no VJP needed) and keeps the
#: parameter tree identical to the unfused modules, so it is a pure
#: lowering choice like ``_CONV_DISPATCH``.
_FUSED_GN_DISPATCH: dict = {"policy": None}


def set_fused_gn_conv_dispatch(policy: Optional[Callable]) -> None:
    _FUSED_GN_DISPATCH["policy"] = policy


def fused_tail_candidate_policy(h_shape, out_ch: int) -> bool:
    """Candidate gate: the latency-bound low-resolution tail where the fused
    kernel measured a win standalone (B16 20x20x288: 1.15x, BENCH_NOTES
    round-2 lever 4).  Production default only where BENCH_NOTES records an
    end-to-end win."""
    B, H, W, C = h_shape
    return H * W <= 400


def fused_block_candidate_policy(h_shape, out_ch: int) -> bool:
    """Candidate gate for the WHOLE-block kernel: 10x10 and smaller.

    VMEM accounting at ~16 MB/core: the block working set (padded input +
    two activation buffers + f32 conv accumulator + both weight tensors)
    fits comfortably at 10x10/5x5 with C<=384 (~13 MB worst case) but
    overflows at 20x20 with C>=192 once sublane padding is counted — the
    20x20 level keeps the single-conv tail kernel instead.  The gate is
    ``max(H, W) <= 10``: exactly the shapes the accounting covered; widen
    only with an on-TPU measurement (BENCH_NOTES measurement queue)."""
    B, H, W, C = h_shape
    return max(H, W) <= 10


#: Named conv-lowering policies selectable from config
#: (``config.model.conv_dispatch``).  Every entry is an exact-math rewrite;
#: names are stable so recipes can pin a measured winner.
NAMED_CONV_POLICIES: dict = {
    "none": None,
    "lowres_im2col": lambda s, o: "im2col" if s[1] * s[2] <= 400 else "xla",
    # s2d halves H and W, so it only applies to even spatial sizes.
    "s2d_highres": lambda s, o: (
        "s2d4" if s[1] >= 80 and s[1] == s[2] and s[1] % 2 == 0 else "xla"
    ),
    "tuned": lambda s, o: (
        "im2col"
        if s[1] * s[2] <= 400
        else ("s2d4" if s[1] >= 80 and s[1] == s[2] and s[1] % 2 == 0 else "xla")
    ),
}


#: cache of loaded measured-policy files, keyed by path (tests point
#: CSDT_POLICY_FILE at several temp files within one process)
_MEASURED_POLICY_CACHE: dict = {}


def measured_policy_default() -> Optional[dict]:
    """The measured production lowering default, if one has been recorded.

    `scripts/bench_eval_policy.py` writes ``artifacts/measured_policy.json``
    after the on-TPU policy ladder; its winning row then becomes the
    production default for every recipe that does not set
    ``model.conv_dispatch`` / ``fused_tail`` / ``fused_block`` explicitly.
    This makes "flip the measured winner to the production default" a data
    change the measurement queue performs automatically, not a code edit.

    ``CSDT_MEASURED_POLICY=0`` disables the fallback (the test suite pins
    it off so parity tests always exercise the paths their explicit knobs
    name); ``CSDT_POLICY_FILE`` overrides the file location.  Invalid or
    missing files silently fall back to the built-in defaults — a stale or
    corrupt measurement must never break training.
    """
    if os.environ.get("CSDT_MEASURED_POLICY", "1") == "0":
        return None
    path = os.environ.get("CSDT_POLICY_FILE") or os.path.join(
        os.path.dirname(__file__), "..", "..", "artifacts", "measured_policy.json"
    )
    if path not in _MEASURED_POLICY_CACHE:
        value = None
        try:
            with open(path) as f:
                data = json.load(f)
            if (
                isinstance(data, dict)
                and data.get("conv_dispatch", "none") in NAMED_CONV_POLICIES
            ):
                value = data
        except (OSError, ValueError):
            value = None
        _MEASURED_POLICY_CACHE[path] = value
    return _MEASURED_POLICY_CACHE[path]


def apply_dispatch_config(model_config) -> None:
    """Set the global lowering policies from optional config knobs.

    ``model.conv_dispatch``: a :data:`NAMED_CONV_POLICIES` name (default
    ``'none'``).  ``model.fused_tail``: bool, enables
    :func:`fused_tail_candidate_policy` for the resblock tails (default
    False).  ``model.fused_block``: bool, same gate for the whole-resblock
    kernel (wins over the tail where both apply).
    Called by ``models.create_model`` so every entry mode (train /
    test / multi_scale_test / bench) honors the recipe's choice.  The
    policies are process-global trace-time state: with several models in one
    process, whoever called this last before a trace wins, so multi-model
    flows must re-apply their config right before tracing (multi-scale
    chains do — `eval/multiscale.py` re-applies per scale before each
    sampler build).  All policies are exact math up to float associativity:
    the fused kernels keep GN statistics in f32 but accumulate in a
    different order, matching the unfused path to ~2e-5 — a lowering choice
    can therefore perturb a long sampling chain bit-wise, never
    statistically.
    """
    measured = measured_policy_default() or {}

    def knob(key, builtin):
        # explicit recipe value > measured production default > builtin
        if hasattr(model_config, "get") and key in model_config:
            return model_config.get(key)
        return measured.get(key, builtin)

    set_conv_dispatch(NAMED_CONV_POLICIES[knob("conv_dispatch", "none")])
    set_fused_gn_conv_dispatch(
        fused_tail_candidate_policy if knob("fused_tail", False) else None
    )
    set_fused_block_dispatch(
        fused_block_candidate_policy if knob("fused_block", False) else None
    )


class _GNParamBank(nn.Module):
    """Declares ``nn.GroupNorm``-compatible params (scale/bias over C)
    without computing the norm — the fused kernel consumes them raw."""

    ch: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", jax.nn.initializers.ones, (self.ch,)),
            self.param("bias", jax.nn.initializers.zeros, (self.ch,)),
        )


class _ConvParamBank(nn.Module):
    """Declares ``conv3x3``-compatible params (kernel HWIO + bias)."""

    in_ch: int
    out_ch: int
    init_scale: float = 1.0

    @nn.compact
    def __call__(self):
        return (
            self.param(
                "kernel", default_init(self.init_scale), (3, 3, self.in_ch, self.out_ch)
            ),
            self.param("bias", jax.nn.initializers.zeros, (self.out_ch,)),
        )


#: Shape-gated dispatch for the WHOLE-resblock fused Pallas kernel
#: (`ops/fused_block_pallas.resblock_fused_lowres`): eval-only, skip-free
#: 2D SiLU blocks whose full body fits VMEM.  ``None`` -> never; otherwise
#: ``policy(x_shape, out_ch) -> bool``.  Strictly stronger fusion than the
#: tail dispatch: where both apply, the block dispatch wins.
_FUSED_BLOCK_DISPATCH: dict = {"policy": None}


def set_fused_block_dispatch(policy: Optional[Callable]) -> None:
    _FUSED_BLOCK_DISPATCH["policy"] = policy


class _DenseParamBank(nn.Module):
    """Declares ``nn.Dense``-compatible params without computing it."""

    in_dim: int
    out_dim: int
    init_scale: float = 0.1

    @nn.compact
    def __call__(self):
        return (
            self.param("kernel", default_init(self.init_scale), (self.in_dim, self.out_dim)),
            self.param("bias", jax.nn.initializers.zeros, (self.out_dim,)),
        )


class _NINParamBank(nn.Module):
    """Param layout of :class:`NIN` (shortcut/dense/{kernel,bias})."""

    in_dim: int
    out_dim: int
    init_scale: float = 0.1

    @nn.compact
    def __call__(self):
        return _DenseParamBank(self.in_dim, self.out_dim, self.init_scale, name="dense")()


class _Conv1x1ParamBank(nn.Module):
    """Param layout of :func:`conv1x1` (kernel (1,1,C,out) + bias),
    returned squeezed to a channel-mix matrix."""

    in_ch: int
    out_ch: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", default_init(1.0), (1, 1, self.in_ch, self.out_ch))
        b = self.param("bias", jax.nn.initializers.zeros, (self.out_ch,))
        return k.reshape(self.in_ch, self.out_ch), b


def fused_resblock(
    x,
    temb,
    *,
    act: Callable,
    out_ch: int,
    groups_in: int,
    groups_out: int,
    conv1_init_scale: float,
    skip_rescale: bool,
    shortcut_kind: str,  # 'nin' | 'conv1x1'
):
    """Whole resblock as ONE Pallas call (see `resblock_fused_lowres`).

    Declares the exact parameter tree of the unfused block
    (norm0/conv0/temb_proj/norm1/conv1/shortcut), so checkpoints are
    interchangeable; the temb projection stays in XLA (per-batch vector).
    """
    in_ch = x.shape[-1]
    gamma0, beta0 = _GNParamBank(in_ch, name="norm0")()
    w0, b0 = _ConvParamBank(in_ch, out_ch, 1.0, name="conv0")()
    temb_proj = None
    if temb is not None:
        temb_proj = nn.Dense(
            out_ch,
            kernel_init=default_init(),
            bias_init=jax.nn.initializers.zeros,
            name="temb_proj",
        )(act(temb))
    gamma1, beta1 = _GNParamBank(out_ch, name="norm1")()
    w1, b1 = _ConvParamBank(out_ch, out_ch, conv1_init_scale, name="conv1")()
    ws = bs = None
    if in_ch != out_ch:
        if shortcut_kind == "nin":
            ws, bs = _NINParamBank(in_ch, out_ch, name="shortcut")()
        else:
            ws, bs = _Conv1x1ParamBank(in_ch, out_ch, name="shortcut")()
    from ..ops.fused_block_pallas import resblock_fused_lowres

    dt = x.dtype
    return resblock_fused_lowres(
        x,
        gamma0=gamma0, beta0=beta0, num_groups0=groups_in,
        w0=w0.astype(dt), b0=b0, temb_proj=temb_proj,
        gamma1=gamma1, beta1=beta1, num_groups1=groups_out,
        w1=w1.astype(dt), b1=b1,
        shortcut_w=None if ws is None else ws.astype(dt),
        shortcut_b=bs,
        skip_rescale=skip_rescale,
        interpret=jax.default_backend() == "cpu",
    )


def fused_block_applicable(x, temb, act, train, skip, dim, out_ch) -> bool:
    """Static gate shared by the resblock call sites."""
    policy = _FUSED_BLOCK_DISPATCH["policy"]
    return (
        policy is not None
        and not train
        and skip is None
        and dim == 2
        and act is jax.nn.silu
        and policy(x.shape, out_ch)
    )


def fused_split_block_applicable(x, skip, act, train, dim, out_ch) -> bool:
    """Same gate for the split-skip (virtual-concat decoder) blocks."""
    policy = _FUSED_BLOCK_DISPATCH["policy"]
    if policy is None or train or skip is None or dim != 2 or act is not jax.nn.silu:
        return False
    concat_shape = x.shape[:-1] + (x.shape[-1] + skip.shape[-1],)
    return policy(concat_shape, out_ch)


def fused_resblock_split(
    x,
    skip,
    temb,
    *,
    act: Callable,
    out_ch: int,
    groups_in: int,
    groups_out: int,
    conv1_init_scale: float,
    skip_rescale: bool,
    shortcut_kind: str,  # 'nin' | 'conv1x1'
):
    """Split-skip whole-resblock fusion (see `resblock_fused_lowres_split`):
    the decoder block on the virtual concat in one Pallas call.  Declares
    the identical parameter tree to the SplitGroupNorm/SplitConv3x3/
    SplitNIN path (all params are over the concat width)."""
    cin = x.shape[-1] + skip.shape[-1]
    gamma0, beta0 = _GNParamBank(cin, name="norm0")()
    w0, b0 = _ConvParamBank(cin, out_ch, 1.0, name="conv0")()
    temb_proj = None
    if temb is not None:
        temb_proj = nn.Dense(
            out_ch,
            kernel_init=default_init(),
            bias_init=jax.nn.initializers.zeros,
            name="temb_proj",
        )(act(temb))
    gamma1, beta1 = _GNParamBank(out_ch, name="norm1")()
    w1, b1 = _ConvParamBank(out_ch, out_ch, conv1_init_scale, name="conv1")()
    ws = bs = None
    if cin != out_ch:
        if shortcut_kind == "nin":
            ws, bs = _NINParamBank(cin, out_ch, name="shortcut")()
        else:
            ws, bs = _Conv1x1ParamBank(cin, out_ch, name="shortcut")()
    from ..ops.fused_block_pallas import resblock_fused_lowres_split

    dt = x.dtype
    return resblock_fused_lowres_split(
        x, skip,
        gamma0=gamma0, beta0=beta0, num_groups0=groups_in,
        w0=w0.astype(dt), b0=b0, temb_proj=temb_proj,
        gamma1=gamma1, beta1=beta1, num_groups1=groups_out,
        w1=w1.astype(dt), b1=b1,
        shortcut_w=None if ws is None else ws.astype(dt),
        shortcut_b=bs,
        skip_rescale=skip_rescale,
        interpret=jax.default_backend() == "cpu",
    )


def gn_act_conv_tail(
    h,
    out_ch: int,
    num_groups: int,
    act: Callable,
    train: bool,
    dropout_rate: float,
    init_scale: float,
    dim: int = 2,
):
    """The ``norm1 -> act -> dropout -> conv1`` tail shared by every resblock
    (reference `models/layers.py:637-641`, `models/layerspp.py:181-183`).

    When the fused dispatch policy enables it (eval only, SiLU only, 2D),
    the whole tail lowers to one Pallas VMEM pass
    (`ops/fused_block_pallas.gn_silu_conv3x3_nhwc`); otherwise the standard
    XLA composition.  Both paths declare the identical parameter tree
    (``norm1/{scale,bias}``, ``conv1/{kernel,bias}``), so checkpoints and
    the two lowerings are interchangeable.
    """
    policy = _FUSED_GN_DISPATCH["policy"]
    if (
        policy is not None
        and not train
        and dim == 2
        and act is jax.nn.silu
        and policy(h.shape, out_ch)
    ):
        gamma, beta = _GNParamBank(h.shape[-1], name="norm1")()
        kernel, cbias = _ConvParamBank(
            h.shape[-1], out_ch, init_scale, name="conv1"
        )()
        from ..ops.fused_block_pallas import gn_silu_conv3x3_nhwc

        return gn_silu_conv3x3_nhwc(
            h,
            kernel.astype(h.dtype),
            gamma,
            beta,
            num_groups,
            bias=cbias,
            interpret=jax.default_backend() == "cpu",
        )
    h = act(nn.GroupNorm(num_groups=num_groups, epsilon=1e-6, name="norm1")(h))
    h = nn.Dropout(dropout_rate, deterministic=not train)(h)
    return conv3x3(out_ch, init_scale=init_scale, dim=dim, name="conv1")(h)


class DispatchConv3x3(nn.Module):
    """`nn.Conv`-param-compatible stride-1 SAME 3x3 conv whose lowering is
    chosen by the global dispatch policy.  Parameter layout (``kernel``
    (3,3,C,out), ``bias`` (out,)) is identical to the `nn.Conv` returned by
    :func:`conv3x3`, so checkpoints are interchangeable."""

    features: int
    init_scale: float = 1.0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        kernel = self.param(
            "kernel", default_init(self.init_scale), (3, 3, C, self.features)
        )
        k = kernel.astype(x.dtype)
        policy = _CONV_DISPATCH["policy"]
        mode = policy(x.shape, self.features) if policy is not None else "xla"
        if mode == "im2col":
            from ..ops.im2col import conv3x3_im2col

            y = conv3x3_im2col(x, k)
        elif mode == "s2d4":
            from ..ops.space_to_depth import conv3x3_via_s2d_4way

            y = conv3x3_via_s2d_4way(x, k)
        elif mode == "s2d_dense":
            from ..ops.space_to_depth import conv3x3_via_s2d_dense

            y = conv3x3_via_s2d_dense(x, k)
        else:
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param("bias", jax.nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


def conv3x3(
    out_ch: int,
    stride: int = 1,
    bias: bool = True,
    dilation: int = 1,
    init_scale: float = 1.0,
    padding: Any = 1,
    dim: int = 2,
    name: Optional[str] = None,
) -> nn.Module:
    """3x3 conv with DDPM init (reference `models/layers.py:119-133`). NHWC/NDHWC."""
    if (
        dim == 2
        and stride == 1
        and dilation == 1
        and padding == 1
        and _CONV_DISPATCH["policy"] is not None
    ):
        return DispatchConv3x3(out_ch, init_scale=init_scale, use_bias=bias, name=name)
    if isinstance(padding, int):
        padding = [(padding, padding)] * dim
    return nn.Conv(
        out_ch,
        kernel_size=(3,) * dim,
        strides=(stride,) * dim,
        padding=padding,
        kernel_dilation=(dilation,) * dim,
        use_bias=bias,
        kernel_init=default_init(init_scale),
        bias_init=jax.nn.initializers.zeros,
        name=name,
    )


def conv1x1(
    out_ch: int,
    stride: int = 1,
    bias: bool = True,
    init_scale: float = 1.0,
    dim: int = 2,
    name: Optional[str] = None,
) -> nn.Conv:
    """1x1 conv with DDPM init (reference `models/layers.py:100-105`)."""
    return nn.Conv(
        out_ch,
        kernel_size=(1,) * dim,
        strides=(stride,) * dim,
        padding="VALID",
        use_bias=bias,
        kernel_init=default_init(init_scale),
        bias_init=jax.nn.initializers.zeros,
        name=name,
    )


class NIN(nn.Module):
    """Network-in-network: a dense layer over the channel axis.

    Reference `models/layers.py:555-564` — in NHWC this is just a Dense.
    """

    num_units: int
    init_scale: float = 0.1

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.num_units,
            kernel_init=default_init(self.init_scale),
            bias_init=jax.nn.initializers.zeros,
            name="dense",
        )(x)


def default_num_groups(ch: int) -> int:
    """NCSN++ GroupNorm group heuristic (reference models/layerspp.py:67).

    Shared by ``group_norm`` and the split-skip SplitGroupNorm call sites so
    the joint and split paths can never diverge numerically.
    """
    return min(ch // 4, 32)


def legacy_num_groups(ch: int) -> int:
    """DDPM-era GroupNorm(32) with a gcd fallback for tiny channel counts."""
    return 32 if ch % 32 == 0 else math.gcd(ch, 32)


def group_norm(ch: int, num_groups: Optional[int] = None, name: Optional[str] = None) -> nn.GroupNorm:
    """GroupNorm with the NCSN++ group heuristic and eps=1e-6."""
    if num_groups is None:
        num_groups = default_num_groups(ch)
    return nn.GroupNorm(num_groups=num_groups, epsilon=1e-6, name=name)


class _SplitDense(nn.Module):
    """Dense over cat(a, b) without materializing the concat.

    ``kernel``/``bias`` params are laid out exactly like ``nn.Dense`` over
    the concatenated width, so checkpoints are interchangeable with the
    joint path.
    """

    features: int
    init_scale: float = 0.1

    @nn.compact
    def __call__(self, a, b):
        ca = a.shape[-1]
        c = ca + b.shape[-1]
        kernel = self.param("kernel", default_init(self.init_scale), (c, self.features))
        bias = self.param("bias", jax.nn.initializers.zeros, (self.features,))
        k = kernel.astype(a.dtype)
        return a @ k[:ca] + b @ k[ca:] + bias.astype(a.dtype)


class SplitNIN(nn.Module):
    """`NIN` over cat(a, b) as two matmuls + add (param layout matches NIN)."""

    num_units: int
    init_scale: float = 0.1

    @nn.compact
    def __call__(self, a, b):
        return _SplitDense(self.num_units, self.init_scale, name="dense")(a, b)


class SplitConv3x3(nn.Module):
    """KxK conv over cat(a, b): ``conv(a, W[:, :, :Ca]) + conv(b, W[:, :, Ca:])``.

    Mathematically exact (channel split distributes over the contraction)
    and avoids materializing the concatenated activation — on TPU the
    concat's `pad_maximum` fusion and the misaligned-lane copy are gone.
    Param layout matches ``conv3x3``/``conv1x1``'s ``nn.Conv``
    (kernel (K,K,C,out), bias (out,)).
    """

    features: int
    init_scale: float = 1.0
    dim: int = 2
    kernel_size: int = 3

    @nn.compact
    def __call__(self, a, b):
        ca = a.shape[-1]
        c = ca + b.shape[-1]
        kernel = self.param(
            "kernel",
            default_init(self.init_scale),
            (self.kernel_size,) * self.dim + (c, self.features),
        )
        bias = self.param("bias", jax.nn.initializers.zeros, (self.features,))
        spec = {2: ("NHWC", "HWIO", "NHWC"), 3: ("NDHWC", "DHWIO", "NDHWC")}[self.dim]
        dn = jax.lax.conv_dimension_numbers(a.shape, kernel.shape, spec)
        k = kernel.astype(a.dtype)

        policy = _CONV_DISPATCH["policy"]
        mode = (
            policy(a.shape, self.features)
            if policy is not None and self.dim == 2 and self.kernel_size == 3
            else "xla"
        )

        def cv(x, w):
            if mode == "im2col":
                from ..ops.im2col import conv3x3_im2col

                return conv3x3_im2col(x, w)
            if mode == "s2d4":
                from ..ops.space_to_depth import conv3x3_via_s2d_4way

                return conv3x3_via_s2d_4way(x, w)
            return jax.lax.conv_general_dilated(
                x, w, (1,) * self.dim, "SAME", dimension_numbers=dn
            )

        out = cv(a, k[..., :ca, :]) + cv(b, k[..., ca:, :])
        return out + bias.astype(a.dtype)


class SplitGroupNorm(nn.Module):
    """GroupNorm over cat(a, b) without materializing the concat.

    Group statistics are assembled from per-channel partial moments of each
    half — exact even when a group straddles the concat boundary (one-pass
    mean/mean-of-squares, the same formulation ``nn.GroupNorm`` lowers to).
    Params (scale/bias over the concatenated width) are interchangeable
    with ``nn.GroupNorm``.  Returns the two normalized halves.
    """

    num_groups: int
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, a, b):
        ca, cb = a.shape[-1], b.shape[-1]
        c = ca + cb
        g = self.num_groups
        gs = c // g
        scale = self.param("scale", jax.nn.initializers.ones, (c,))
        bias = self.param("bias", jax.nn.initializers.zeros, (c,))

        red = tuple(range(1, a.ndim - 1))  # spatial axes
        n = float(math.prod(a.shape[1:-1]) * gs)

        def moments(x):
            xf = x.astype(jnp.float32)
            return xf.sum(axis=red), (xf * xf).sum(axis=red)  # (B, Cx)

        sa, qa = moments(a)
        sb, qb = moments(b)
        s = jnp.concatenate([sa, sb], -1).reshape(sa.shape[0], g, gs).sum(-1)
        q = jnp.concatenate([qa, qb], -1).reshape(sa.shape[0], g, gs).sum(-1)
        mu = s / n
        var = q / n - mu * mu
        inv = jax.lax.rsqrt(var + self.epsilon)
        mu_c = jnp.repeat(mu, gs, axis=-1)  # (B, C)
        inv_c = jnp.repeat(inv, gs, axis=-1)

        bcast = (slice(None),) + (None,) * len(red)

        def norm(x, lo, hi):
            m = mu_c[:, lo:hi][bcast + (slice(None),)]
            iv = inv_c[:, lo:hi][bcast + (slice(None),)]
            y = (x.astype(jnp.float32) - m) * iv * scale[lo:hi] + bias[lo:hi]
            return y.astype(x.dtype)

        return norm(a, 0, ca), norm(b, ca, c)


def legacy_group_norm(ch: int, name: Optional[str] = None) -> nn.GroupNorm:
    """DDPM-era GroupNorm: 32 groups (reference `models/layers.py:637`).

    Identical to the reference whenever ``ch % 32 == 0`` (true for every real
    config); falls back to gcd(ch, 32) groups for tiny channel counts that
    would crash the reference outright.
    """
    return nn.GroupNorm(num_groups=legacy_num_groups(ch), epsilon=1e-6, name=name)


def _spatial_attention(q, k, v):
    """Pixels-as-tokens self-attention (reference `models/layers.py:577-590`).

    q,k,v: (B, H, W, C).  Contracted over C, softmax over source pixels.
    Computed in f32 on the MXU regardless of input dtype.
    """
    B, H, W, C = q.shape
    q = q.reshape(B, H * W, C)
    k = k.reshape(B, H * W, C)
    v = v.reshape(B, H * W, C)
    w = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
    w = w * (int(C) ** (-0.5))
    w = jax.nn.softmax(w, axis=-1)
    h = jnp.einsum("bqk,bkc->bqc", w, v.astype(w.dtype), preferred_element_type=jnp.float32)
    return h.astype(q.dtype).reshape(B, H, W, C)


class AttnBlock(nn.Module):
    """DDPM channel-wise self-attention (reference `models/layers.py:569-591`)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        h = legacy_group_norm(x.shape[-1], name="norm")(x)
        q = NIN(self.channels, name="q")(h)
        k = NIN(self.channels, name="k")(h)
        v = NIN(self.channels, name="v")(h)
        h = _spatial_attention(q, k, v)
        h = NIN(self.channels, init_scale=0.0, name="out")(h)
        return x + h


class Upsample(nn.Module):
    """Nearest x2 upsample + optional conv (reference `models/layers.py:593-604`)."""

    channels: int
    with_conv: bool = False

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
        if self.with_conv:
            h = conv3x3(self.channels, name="conv")(h)
        return h


class Downsample(nn.Module):
    """Stride-2 conv (with SAME-emulating pad) or 2x2 avg-pool
    (reference `models/layers.py:606-629`)."""

    channels: int
    with_conv: bool = False

    @nn.compact
    def __call__(self, x):
        if self.with_conv:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = conv3x3(self.channels, stride=2, padding=0, name="conv")(x)
        else:
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return x


class ResnetBlockDDPM(nn.Module):
    """Legacy DDPM ResNet block, 2D/3D (reference `models/layers.py:631-674`)."""

    act: Callable
    out_ch: Optional[int] = None
    conv_shortcut: bool = False
    dropout: float = 0.1
    dim: int = 2
    #: When True and a ``skip`` tensor is passed, compute the block on the
    #: *virtual* concatenation cat(x, skip) without materializing it: the
    #: input GroupNorm, first conv and NIN shortcut all distribute over the
    #: channel split (see SplitGroupNorm/SplitConv3x3/SplitNIN).  Exact math,
    #: identical parameter layout — a TPU layout optimization, not a new
    #: architecture.
    split_skip: bool = False

    @nn.compact
    def __call__(self, x, temb=None, train: bool = False, skip=None):
        if skip is not None and not self.split_skip:
            x = jnp.concatenate([x, skip], axis=-1)
            skip = None
        in_ch = x.shape[-1] + (skip.shape[-1] if skip is not None else 0)
        out_ch = self.out_ch if self.out_ch is not None else in_ch
        if fused_block_applicable(x, temb, self.act, train, skip, self.dim, out_ch) and (
            in_ch == out_ch or not self.conv_shortcut
        ):
            return fused_resblock(
                x, temb, act=self.act, out_ch=out_ch,
                groups_in=legacy_num_groups(in_ch),
                groups_out=legacy_num_groups(out_ch),
                conv1_init_scale=0.0, skip_rescale=False, shortcut_kind="nin",
            )
        if (
            self.dim == 2
            and fused_split_block_applicable(x, skip, self.act, train, 2, out_ch)
            and (in_ch == out_ch or not self.conv_shortcut)
        ):
            return fused_resblock_split(
                x, skip, temb, act=self.act, out_ch=out_ch,
                groups_in=legacy_num_groups(in_ch),
                groups_out=legacy_num_groups(out_ch),
                conv1_init_scale=0.0, skip_rescale=False, shortcut_kind="nin",
            )
        if skip is None:
            h = self.act(legacy_group_norm(in_ch, name="norm0")(x))
            h = conv3x3(out_ch, dim=self.dim, name="conv0")(h)
        else:
            na, nb = SplitGroupNorm(legacy_num_groups(in_ch), name="norm0")(x, skip)
            h = SplitConv3x3(out_ch, dim=self.dim, name="conv0")(
                self.act(na), self.act(nb)
            )
        if temb is not None:
            temb_proj = nn.Dense(
                out_ch,
                kernel_init=default_init(),
                bias_init=jax.nn.initializers.zeros,
                name="temb_proj",
            )(self.act(temb))
            h = h + temb_proj.reshape(temb_proj.shape[:1] + (1,) * self.dim + temb_proj.shape[1:])
        h = gn_act_conv_tail(
            h, out_ch, legacy_num_groups(out_ch), self.act, train,
            self.dropout, init_scale=0.0, dim=self.dim,
        )
        if in_ch != out_ch:
            if self.conv_shortcut:
                if skip is not None:
                    x = SplitConv3x3(out_ch, dim=self.dim, name="shortcut")(x, skip)
                    skip = None
                else:
                    x = conv3x3(out_ch, dim=self.dim, name="shortcut")(x)
            elif skip is not None:
                x = SplitNIN(out_ch, name="shortcut")(x, skip)
                skip = None
            else:
                x = NIN(out_ch, name="shortcut")(x)
        elif skip is not None:  # identity residual needs the real concat
            x = jnp.concatenate([x, skip], axis=-1)
            skip = None
        return x + h
