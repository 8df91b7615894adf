"""Folded-BN matmul-form inference executor for FusionNet v3.

Why this exists (measured on the v5e relay, tools/probe_nets.py /
probe_conv_layout.py): FusionNet v3 gf6 is ~85 SMALL-channel convs
(C = 19..570 at 256^2), and XLA's conv op pays a ~200-250 us/op floor at
these widths regardless of formulation (NHWC / NCHW / conv-as-matmul all
equal) -- the stage costs ~18.5 ms while its arithmetic is ~33 G MACs
(~0.3 ms at MXU peak). This executor re-expresses the whole inference
forward as a chain of lax.dot_general matmuls over flat (P, C)
activation matrices with all BatchNorm/bias/activation epilogues FOLDED:

* inference BatchNorm is an affine map, folded into the conv weights at
  build time: W' = W * s, b' = (b - mean) * s + beta with
  s = gamma / sqrt(var + eps) -- zero runtime cost, removes ~80
  elementwise ops and their relayouts;
* 1x1 convs (47 of the 85 -- including every FLOP-heavy op) become single
  (P, Cin) x (Cin, Cout) matmuls;
* 3x3 convs (dilated rates 1/3/9/27) become either 9 shift-sliced
  matmuls accumulated in f32 ("dots9") or one im2col matmul with the 9
  taps concatenated into the contracted dim ("im2col", amortising the
  K-dim 128-padding: K = 9*19 = 171 instead of 19) -- pick by
  measurement (tools/probe_fastnet.py);
* activations stay bf16 end-to-end with f32 matmul accumulation
  (preferred_element_type), epilogues (bias + leaky_relu/relu/tanh) run
  in f32 on the accumulator before the bf16 cast -- numerically at least
  as precise as the Flax bf16 path (which rounds to bf16 between conv,
  bias and BN).

The executor consumes extraction outputs DIRECTLY in their native
(P, C) column layout (tsdf values/weights are (n_rays, n_points) from
rowvol.extract_rows) -- no NHWC reshape / relayout between extraction
and the net (the input-prep gap flagged in round 2's review).

Training keeps the Flax module (autodiff, dropout, BN stat updates);
this path is inference-only and is verified against the Flax forward by
tests/test_fastnet.py (f32: near-exact; bf16: both paths are bf16
roundings of the same math).

Reference semantics reproduced: modules/model.py:219-282 (FusionNet_v3),
modules/model.py:100-161 (VortexPooling), modules/model.py:4-52
(Block/Pred) of /root/reference.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

__all__ = ["fold_v3", "apply_v3", "FastV3", "V3Meta"]


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class V3Meta:
    """Static (treedef-side) model facts: the folded tree is passed INTO
    jitted fuse steps as an argument, so these must not become traced
    leaves (they drive Python control flow in apply_v3)."""
    gf: int
    use_semantics: bool
    n_points: int
    output_scale: float

_LEAKY_SLOPE = 0.01
_BN_EPS = 1e-5


# -- BN folding ---------------------------------------------------------------

def _fold_conv_bn(conv, bn=None, eps=_BN_EPS, bn_stats=None):
    """(kernel, bias) with inference-BN folded in. ``conv`` is the Flax
    param dict {kernel (kh, kw, Cin, Cout), bias}; ``bn``/``bn_stats``
    the BatchNorm params {scale, bias} / stats {mean, var}."""
    k = jnp.asarray(conv["kernel"], jnp.float32)
    b = jnp.asarray(conv["bias"], jnp.float32)
    if bn is not None:
        s = jnp.asarray(bn["scale"], jnp.float32) / jnp.sqrt(
            jnp.asarray(bn_stats["var"], jnp.float32) + eps)
        k = k * s                                   # broadcast over Cout
        b = (b - jnp.asarray(bn_stats["mean"], jnp.float32)) * s \
            + jnp.asarray(bn["bias"], jnp.float32)
    if k.ndim == 4 and k.shape[0] == 1 and k.shape[1] == 1:
        k = k[0, 0]                                 # 1x1 conv -> (Cin, Cout)
    return k, b


def _w2d(kernel):
    """(kh, kw, Cin, Cout) -> per-tap (Cin, Cout) list (row-major taps)."""
    kh, kw = kernel.shape[0], kernel.shape[1]
    return [kernel[i, j] for i in range(kh) for j in range(kw)]


# -- runtime ops --------------------------------------------------------------

def _dot(x, w):
    """(..., Cin) x (Cin, Cout) matmul with f32 accumulation."""
    return jax.lax.dot_general(x, w, (((x.ndim - 1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _epilogue(acc, b, act, dtype):
    y = acc + b
    if act == "leaky":
        y = jnp.where(y >= 0, y, _LEAKY_SLOPE * y)
    elif act == "relu":
        y = jnp.maximum(y, 0.0)
    elif act == "tanh":
        return jnp.tanh(y)                          # stays f32 (output)
    return y.astype(dtype)


def _conv1x1(x, wb, act, dtype):
    w, b = wb
    return _epilogue(_dot(x, w.astype(x.dtype)), b, act, dtype)


def _conv3x3(x, wb, rate, act, dtype, mode):
    """x: (H, W, Cin). Zero-padded SAME conv with kernel dilation
    ``rate``; taps row-major like the Flax/torch kernel."""
    w, b = wb
    H, W, Cin = x.shape
    d = rate
    xp = jnp.pad(x, ((d, d), (d, d), (0, 0)))
    taps = [xp[i * d:i * d + H, j * d:j * d + W]
            for i in range(3) for j in range(3)]
    if mode == "im2col":
        t = jnp.concatenate(taps, axis=-1)          # (H, W, 9*Cin)
        wt = w.reshape(9 * Cin, -1)
        acc = _dot(t, wt.astype(x.dtype))
    else:                                           # "dots9"
        wt = _w2d(w)
        acc = _dot(taps[0], wt[0].astype(x.dtype))
        for t, wk in zip(taps[1:], wt[1:]):
            acc = acc + _dot(t, wk.astype(x.dtype))
    return _epilogue(acc, b, act, dtype)


def _avg_pool_3x3(x):
    """count_include_pad 3x3/1/1 average (matches models.fusionnet)."""
    s = jax.lax.reduce_window(x, jnp.zeros((), x.dtype), jax.lax.add,
                              (3, 3, 1), (1, 1, 1), "SAME")
    return s / jnp.asarray(9.0, x.dtype)


def _avg_pool_3x3_train(x):
    """Same pool as separable padded slice-sums: ``lax.reduce_window``
    with a generic add closure has no reverse-mode rule (the train
    executor differentiates through this; the zero pad reproduces
    count_include_pad)."""
    H, W, _ = x.shape
    xp = jnp.pad(x, ((1, 1), (0, 0), (0, 0)))
    v = xp[0:H] + xp[1:H + 1] + xp[2:H + 2]
    vp = jnp.pad(v, ((0, 0), (1, 1), (0, 0)))
    s = vp[:, 0:W] + vp[:, 1:W + 1] + vp[:, 2:W + 2]
    return s / jnp.asarray(9.0, x.dtype)


# -- folding the full model ---------------------------------------------------

def _fold_block(p, s, name):
    """Block: 2 x (conv3x3 -> BN -> leaky -> dropout)."""
    return [
        _fold_conv_bn(p[name][f"Conv_{i}"], p[name][f"BatchNorm_{i}"],
                      bn_stats=s[name][f"BatchNorm_{i}"])
        for i in range(2)
    ]


def _block_diag(mats):
    """Block-diagonal (sum Kin, sum Kout) from per-branch (Kin, Kout)."""
    kins = [m.shape[0] for m in mats]
    kouts = [m.shape[1] for m in mats]
    out = jnp.zeros((sum(kins), sum(kouts)), jnp.float32)
    ri = ci = 0
    for m in mats:
        out = out.at[ri:ri + m.shape[0], ci:ci + m.shape[1]].set(m)
        ri += m.shape[0]
        ci += m.shape[1]
    return out


def _pack_vortex(br):
    """Branch-batched weights: the 4 branches' same-position convs fused
    into block-diagonal matmuls (executed as ONE dot per position --
    fewest ops, biggest contractions; 'packed' vortex mode)."""
    ins, d0s, d1s, outs = zip(*br)

    def taps_of(ws):
        per = [_w2d(w) for w, _ in ws]          # 4 x [9 x (19, 19)]
        return [_block_diag([per[b][t] for b in range(4)])
                for t in range(9)]              # 9 x (76, 76)

    return {
        "in": (_block_diag([w for w, _ in ins]),
               jnp.concatenate([b for _, b in ins])),
        "d0": (taps_of(d0s), jnp.concatenate([b for _, b in d0s])),
        "d1": (taps_of(d1s), jnp.concatenate([b for _, b in d1s])),
        "out": (_block_diag([w for w, _ in outs]),
                jnp.concatenate([b for _, b in outs])),
    }


def _fold_vortex(p, s, name, pack=False):
    pv, sv = p[name], s[name]

    def cb(i):
        return _fold_conv_bn(pv[f"Conv_{i}"], pv[f"BatchNorm_{i}"],
                             bn_stats=sv[f"BatchNorm_{i}"])

    br = [[cb(4 * bi + 1), cb(4 * bi + 2), cb(4 * bi + 3),
           cb(4 * bi + 4)] for bi in range(4)]
    out = {"global": cb(0), "branches": br, "final": cb(17)}
    if pack:
        out["packed"] = _pack_vortex(br)
        out["branches"] = None        # drop the unpacked copies
    return out


def _fold_pred(p, s, name, last):
    pp, sp = p[name], s[name]
    if not last:
        return [_fold_conv_bn(pp[f"Conv_{i}"], pp[f"BatchNorm_{i}"],
                              bn_stats=sp[f"BatchNorm_{i}"])
                for i in range(2)]
    return [_fold_conv_bn(pp["Conv_0"], pp["BatchNorm_0"],
                          bn_stats=sp["BatchNorm_0"]),
            _fold_conv_bn(pp["Conv_1"]),
            _fold_conv_bn(pp["Conv_2"])]


def fold_v3(params, batch_stats, *, growth_factor: int = 6,
            use_semantics: bool = True, n_points: int = 9,
            output_scale: float = 1.0,
            pack_vortex: bool = False) -> Dict[str, Any]:
    """Fold a FusionNetV3 (unstacked heads) param/batch-stats tree into
    the executor's weight pytree. All folded weights are f32 leaves;
    ``apply_v3`` casts per-matmul to the compute dtype. ``pack_vortex``
    builds branch-batched block-diagonal vortex weights (6 dots per
    vortex instead of 18 convs; same math)."""
    gf = growth_factor - 1
    p, s = params, batch_stats
    heads = {}
    names = (["head_tsdf", "head_sem"] if use_semantics
             else ["FusionHead_0"])
    for hn in names:
        heads[hn] = {
            "blocks": [_fold_block(p[hn], s[hn], f"Block_{i}")
                       for i in range(gf)],
            "vortex": _fold_vortex(p[hn], s[hn], "VortexPooling_0",
                                   pack=pack_vortex),
        }
    preds = [_fold_pred(p, s, f"Pred_{i}", last=(i == gf - 1))
             for i in range(gf)]
    return {
        "heads": heads,
        "vortex": _fold_vortex(p, s, "VortexPooling_0",
                               pack=pack_vortex),
        "preds": preds,
        "meta": V3Meta(gf=gf, use_semantics=use_semantics,
                       n_points=n_points, output_scale=output_scale),
    }


# -- forward ------------------------------------------------------------------

def _shift(xp, H, W, i, j, d, pad):
    """(H, W, C) tap slice of ``xp`` padded by ``pad``: tap (i, j) in
    {0,1,2}^2 at dilation d."""
    r0 = pad + (i - 1) * d
    c0 = pad + (j - 1) * d
    return xp[r0:r0 + H, c0:c0 + W]


def _run_vortex_packed(x, fw, rates, dtype, mode):
    """Branch-batched vortex: the 4 branch stacks run as block-diagonal
    matmuls over group-concatenated activations -- 6 dots total instead
    of 18 convs. Bit-equivalent math to _run_vortex (the off-diagonal
    zero blocks contribute exact zeros)."""
    H, W, _ = x.shape
    pk = fw["packed"]
    g = jnp.mean(x.astype(jnp.float32), axis=(0, 1),
                 keepdims=True).astype(dtype)
    g = _conv1x1(g, fw["global"], None, dtype)
    g = jnp.broadcast_to(g, (H, W, g.shape[-1]))

    pools = [x]
    for _ in range(len(rates) - 1):
        pools.append(_avg_pool_3x3(pools[-1]))
    xin = jnp.concatenate(pools, axis=-1)          # (H, W, 4*C)
    y = _conv1x1(xin, pk["in"], "relu", dtype)     # (H, W, 4*mid)
    mid = y.shape[-1] // len(rates)

    pad = max(rates)
    for key in ("d0", "d1"):
        taps, bias = pk[key]
        yp = jnp.pad(y, ((pad, pad), (pad, pad), (0, 0)))
        shifted = []
        for t in range(9):
            i, j = divmod(t, 3)
            s = jnp.concatenate(
                [_shift(yp[..., b * mid:(b + 1) * mid], H, W, i, j, d,
                        pad) for b, d in enumerate(rates)], axis=-1)
            shifted.append(s)
        if mode == "im2col":
            tmat = jnp.concatenate(shifted, axis=-1)   # (H, W, 9*4*mid)
            wt = jnp.concatenate([w for w in taps], axis=0)
            acc = _dot(tmat, wt.astype(dtype))
        else:
            acc = _dot(shifted[0], taps[0].astype(dtype))
            for s, wk in zip(shifted[1:], taps[1:]):
                acc = acc + _dot(s, wk.astype(dtype))
        y = _epilogue(acc, bias, "relu", dtype)
    b = _conv1x1(y, pk["out"], "relu", dtype)      # (H, W, 4*out)
    out = jnp.concatenate([g, b], axis=-1)
    return _conv1x1(out, fw["final"], None, dtype)


def _run_vortex(x, fw, rates, dtype, mode):
    if fw.get("packed") is not None:
        return _run_vortex_packed(x, fw, rates, dtype, mode)
    H, W, _ = x.shape
    g = jnp.mean(x.astype(jnp.float32), axis=(0, 1),
                 keepdims=True).astype(dtype)        # (1, 1, C)
    g = _conv1x1(g, fw["global"], None, dtype)
    g = jnp.broadcast_to(g, (H, W, g.shape[-1]))

    branches = [g]
    xp = x
    for bi, rate in enumerate(rates):
        inp = xp if bi == 0 else (xp := _avg_pool_3x3(xp))
        c_in, c_d0, c_d1, c_out = fw["branches"][bi]
        b = _conv1x1(inp, c_in, "relu", dtype)
        b = _conv3x3(b, c_d0, rate, "relu", dtype, mode)
        b = _conv3x3(b, c_d1, rate, "relu", dtype, mode)
        b = _conv1x1(b, c_out, "relu", dtype)
        branches.append(b)
    out = jnp.concatenate(branches, axis=-1)
    return _conv1x1(out, fw["final"], None, dtype)


def _run_head(x, fh, dtype, mode):
    for c0, c1 in fh["blocks"]:
        y = _conv3x3(x, c0, 1, "leaky", dtype, mode)
        y = _conv3x3(y, c1, 1, "leaky", dtype, mode)
        x = jnp.concatenate([x, y], axis=-1)
    return _run_vortex(x, fh["vortex"], (1, 3, 9, 27), dtype, mode)


def apply_v3(folded, inputs: Dict[str, jnp.ndarray], *,
             dtype=jnp.bfloat16, conv3x3: str = "dots9") -> jnp.ndarray:
    """Inference forward. ``inputs`` like the Flax model's dict --
    (1, H, W, C) NHWC or (H, W, C) -- returns (1, H*W, n_points) f32
    (tanh output, scaled), matching Pipeline._network_estimate's shape.
    """
    meta = folded["meta"]

    def hw(a):
        a = jnp.asarray(a)
        if a.ndim == 4:
            a = a[0]
        return a.astype(dtype)

    vals = hw(inputs["tsdf_values"])
    wts = hw(inputs["tsdf_weights"])
    dep = hw(inputs["tsdf_frame"])
    x_t = jnp.concatenate([vals, wts, dep], axis=-1)

    if meta.use_semantics:
        sem = hw(inputs["semantic_frame"])
        x_s = jnp.concatenate([vals, wts, sem], axis=-1)
        y_t = _run_head(x_t, folded["heads"]["head_tsdf"], dtype, conv3x3)
        y_s = _run_head(x_s, folded["heads"]["head_sem"], dtype, conv3x3)
        y = jnp.concatenate([y_t, y_s], axis=-1)
    else:
        y = _run_head(x_t, folded["heads"]["FusionHead_0"], dtype, conv3x3)

    y = _run_vortex(y, folded["vortex"], (1, 3, 9, 27), dtype, conv3x3)

    for i, pred in enumerate(folded["preds"]):
        y = _conv1x1(y, pred[0], "leaky", dtype)
        y = _conv1x1(y, pred[1], "leaky", dtype)
        if i == len(folded["preds"]) - 1:
            y = _conv1x1(y, pred[2], "tanh", dtype)     # f32 out

    H, W, _ = y.shape
    est = meta.output_scale * y
    return est.reshape(1, H * W, meta.n_points)


# -- training forward ---------------------------------------------------------
#
# The same matmul-form lowering for TRAINING: raw Flax param trees (no BN
# folding -- grads must flow to the original parameters), train-mode
# BatchNorm with explicit batch statistics + running-average updates, and
# channel-broadcast dropout. Works directly on the Flax {params,
# batch_stats} trees so jax.grad produces gradients in the Flax tree
# structure (drop-in for Pipeline._network_estimate's train path); the
# returned new batch_stats mirror Flax's mutable["batch_stats"] updates
# (momentum 0.99, float32 stats, use_fast_variance semantics).
# Measured motivation: the Flax conv forward costs 16.55 ms/frame at
# 256^2 gf6 vs 6.36 for the matmul form (tools/probe_fastnet.py); in
# training the conv-op floor is paid again in the backward pass.

_BN_MOMENTUM = 0.99


class _TrainCtx:
    """Per-apply mutable bookkeeping: dropout rng counter and the
    updated running stats collected along the walk."""

    def __init__(self, rng, dropout_rate):
        self.rng = rng
        self.rate = dropout_rate
        self.n = 0
        self.new_stats = {}

    def next_rng(self):
        self.n += 1
        return jax.random.fold_in(self.rng, self.n)

    def put_stats(self, path, mean, var):
        d = self.new_stats
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = {"mean": mean, "var": var}


def _bn_train(x, bn_p, stats, path, ctx, dtype):
    """Flax nn.BatchNorm(train): batch stats over all non-feature axes
    in f32 (fast variance, clamped), normalize, affine; running averages
    updated with momentum 0.99."""
    xf = x.astype(jnp.float32)
    axes = tuple(range(xf.ndim - 1))
    mean = jnp.mean(xf, axis=axes)
    mean2 = jnp.mean(jnp.square(xf), axis=axes)
    var = jnp.maximum(0.0, mean2 - jnp.square(mean))
    ra_m = jnp.asarray(stats["mean"], jnp.float32)
    ra_v = jnp.asarray(stats["var"], jnp.float32)
    ctx.put_stats(path, _BN_MOMENTUM * ra_m + (1 - _BN_MOMENTUM) * mean,
                  _BN_MOMENTUM * ra_v + (1 - _BN_MOMENTUM) * var)
    y = (xf - mean) * jax.lax.rsqrt(var + _BN_EPS)
    y = y * jnp.asarray(bn_p["scale"], jnp.float32) \
        + jnp.asarray(bn_p["bias"], jnp.float32)
    return y.astype(dtype)


def _dropout(x, ctx, dtype):
    """nn.Dropout(rate, broadcast_dims=(1, 2)) on (H, W, C): one
    (1, 1, C) keep mask, inverted scaling."""
    if ctx.rate <= 0.0:
        return x
    keep = 1.0 - ctx.rate
    mask = jax.random.bernoulli(ctx.next_rng(), keep, (1, 1, x.shape[-1]))
    return jnp.where(mask, x / jnp.asarray(keep, x.dtype),
                     jnp.zeros((), x.dtype)).astype(dtype)


def _t_conv1x1(x, conv, act, dtype):
    w = jnp.asarray(conv["kernel"])
    if w.ndim == 4:
        w = w[0, 0]
    acc = _dot(x, w.astype(x.dtype)) + jnp.asarray(conv["bias"],
                                                   jnp.float32)
    if act == "leaky":
        acc = jnp.where(acc >= 0, acc, _LEAKY_SLOPE * acc)
    elif act == "relu":
        acc = jnp.maximum(acc, 0.0)
    elif act == "tanh":
        return jnp.tanh(acc)
    return acc.astype(dtype)


def _t_conv3x3(x, conv, rate, dtype, mode):
    w = jnp.asarray(conv["kernel"])
    H, W, Cin = x.shape
    d = rate
    xp = jnp.pad(x, ((d, d), (d, d), (0, 0)))
    taps = [xp[i * d:i * d + H, j * d:j * d + W]
            for i in range(3) for j in range(3)]
    if mode == "im2col":
        t = jnp.concatenate(taps, axis=-1)
        acc = _dot(t, w.reshape(9 * Cin, -1).astype(x.dtype))
    else:
        wt = _w2d(w)
        acc = _dot(taps[0], wt[0].astype(x.dtype))
        for tp, wk in zip(taps[1:], wt[1:]):
            acc = acc + _dot(tp, wk.astype(x.dtype))
    return (acc + jnp.asarray(conv["bias"], jnp.float32)).astype(dtype)


def _t_block(x, p, s, path, ctx, dtype, mode):
    """Block: (conv3x3 -> BN -> leaky -> dropout) x2, dense output is
    concatenated by the caller."""
    for i in range(2):
        x = _t_conv3x3(x, p[f"Conv_{i}"], 1, dtype, mode)
        x = _bn_train(x, p[f"BatchNorm_{i}"], s[f"BatchNorm_{i}"],
                      path + (f"BatchNorm_{i}",), ctx, jnp.float32)
        x = jnp.where(x >= 0, x, _LEAKY_SLOPE * x).astype(dtype)
        x = _dropout(x, ctx, dtype)
    return x


def _t_vortex(x, p, s, path, ctx, dtype, mode, rates=(1, 3, 9, 27)):
    H, W, _ = x.shape

    def cbn(i, inp, act):
        y = (_t_conv1x1(inp, p[f"Conv_{i}"], None, jnp.float32)
             if p[f"Conv_{i}"]["kernel"].shape[:2] == (1, 1)
             else _t_conv3x3(inp, p[f"Conv_{i}"],
                             rates[(i - 1) // 4], jnp.float32, mode))
        y = _bn_train(y, p[f"BatchNorm_{i}"], s[f"BatchNorm_{i}"],
                      path + (f"BatchNorm_{i}",), ctx, jnp.float32)
        if act == "relu":
            y = jnp.maximum(y, 0.0)
        return y.astype(dtype)

    g = jnp.mean(x.astype(jnp.float32), axis=(0, 1),
                 keepdims=True).astype(dtype)
    g = _t_conv1x1(g, p["Conv_0"], None, dtype)
    g = jnp.broadcast_to(g, (H, W, g.shape[-1]))
    g = _bn_train(g, p["BatchNorm_0"], s["BatchNorm_0"],
                  path + ("BatchNorm_0",), ctx, dtype)

    branches = [g]
    xp = x
    for bi, rate in enumerate(rates):
        inp = xp if bi == 0 else (xp := _avg_pool_3x3_train(xp))
        b = cbn(4 * bi + 1, inp, "relu")
        b = cbn(4 * bi + 2, b, "relu")
        b = cbn(4 * bi + 3, b, "relu")
        b = cbn(4 * bi + 4, b, "relu")
        branches.append(b)
    out = jnp.concatenate(branches, axis=-1)
    out = cbn(17, out, None)
    return _dropout(out, ctx, dtype)


def _t_head(x, p, s, path, ctx, gf, dtype, mode):
    for i in range(gf):
        y = _t_block(x, p[f"Block_{i}"], s[f"Block_{i}"],
                     path + (f"Block_{i}",), ctx, dtype, mode)
        x = jnp.concatenate([x, y], axis=-1)
    return _t_vortex(x, p["VortexPooling_0"], s["VortexPooling_0"],
                     path + ("VortexPooling_0",), ctx, dtype, mode)


def _t_pred(x, p, s, path, ctx, last, dtype, mode):
    if not last:
        for i in range(2):
            x = _t_conv1x1(x, p[f"Conv_{i}"], None, jnp.float32)
            x = _bn_train(x, p[f"BatchNorm_{i}"], s[f"BatchNorm_{i}"],
                          path + (f"BatchNorm_{i}",), ctx, jnp.float32)
            x = jnp.where(x >= 0, x, _LEAKY_SLOPE * x).astype(dtype)
            x = _dropout(x, ctx, dtype)
        return x
    x = _t_conv1x1(x, p["Conv_0"], None, jnp.float32)
    x = _bn_train(x, p["BatchNorm_0"], s["BatchNorm_0"],
                  path + ("BatchNorm_0",), ctx, jnp.float32)
    x = jnp.where(x >= 0, x, _LEAKY_SLOPE * x).astype(dtype)
    x = _dropout(x, ctx, dtype)
    x = _t_conv1x1(x, p["Conv_1"], "leaky", dtype)
    return _t_conv1x1(x, p["Conv_2"], "tanh", dtype)


def _merge_stats(old, new):
    """Updated batch_stats tree: ``new`` overlays the walked BN paths,
    untouched subtrees pass through."""
    if isinstance(new, dict) and "mean" in new \
            and not isinstance(new["mean"], dict):
        return new                                 # BN leaf {mean, var}
    return {k: (_merge_stats(old[k], new[k]) if k in new else old[k])
            for k in old}


def apply_v3_train(params, batch_stats, inputs, rng, *,
                   growth_factor: int = 6, use_semantics: bool = True,
                   n_points: int = 9, output_scale: float = 1.0,
                   dropout_rate: float = 0.2, dtype=jnp.bfloat16,
                   conv3x3: str = "dots9"):
    """Training forward in matmul form on the RAW Flax trees: returns
    (est (1, H*W, n_points) f32, new_batch_stats). Same architecture
    walk as models.fusionnet.FusionNetV3 (unstacked heads); BatchNorm in
    train mode (batch stats, f32), dropout active. ``rng`` seeds the
    dropout masks (its own stream -- NOT bit-identical to Flax's
    per-module rng folding; tests compare with dropout_rate=0)."""
    meta = V3Meta(gf=growth_factor - 1, use_semantics=use_semantics,
                  n_points=n_points, output_scale=output_scale)
    if rng is None and dropout_rate > 0:
        # match the Flax path, which raises on a missing dropout rng in
        # train mode -- a silent PRNGKey(0) fallback would reuse one
        # dropout mask every step
        raise ValueError("apply_v3_train needs an rng when dropout_rate "
                         "> 0 (pass rng or set dropout_rate=0)")
    ctx = _TrainCtx(rng if rng is not None else jax.random.PRNGKey(0),
                    dropout_rate)
    gf = meta.gf

    def hw(a):
        a = jnp.asarray(a)
        if a.ndim == 4:
            a = a[0]
        return a.astype(dtype)

    vals = hw(inputs["tsdf_values"])
    wts = hw(inputs["tsdf_weights"])
    dep = hw(inputs["tsdf_frame"])
    x_t = jnp.concatenate([vals, wts, dep], axis=-1)

    if use_semantics:
        sem = hw(inputs["semantic_frame"])
        x_s = jnp.concatenate([vals, wts, sem], axis=-1)
        y_t = _t_head(x_t, params["head_tsdf"], batch_stats["head_tsdf"],
                      ("head_tsdf",), ctx, gf, dtype, conv3x3)
        y_s = _t_head(x_s, params["head_sem"], batch_stats["head_sem"],
                      ("head_sem",), ctx, gf, dtype, conv3x3)
        y = jnp.concatenate([y_t, y_s], axis=-1)
    else:
        y = _t_head(x_t, params["FusionHead_0"],
                    batch_stats["FusionHead_0"], ("FusionHead_0",), ctx,
                    gf, dtype, conv3x3)

    y = _t_vortex(y, params["VortexPooling_0"],
                  batch_stats["VortexPooling_0"], ("VortexPooling_0",),
                  ctx, dtype, conv3x3)
    for i in range(gf):
        y = _t_pred(y, params[f"Pred_{i}"], batch_stats[f"Pred_{i}"],
                    (f"Pred_{i}",), ctx, last=(i == gf - 1), dtype=dtype,
                    mode=conv3x3)

    H, W, _ = y.shape
    est = (output_scale * y)[..., :n_points]
    return (est.reshape(1, H * W, n_points),
            _merge_stats(batch_stats, ctx.new_stats))


class FastV3:
    """Convenience wrapper: fold once, apply many. Matches the call shape
    Pipeline._network_estimate expects from the Flax net at inference."""

    def __init__(self, params, batch_stats, *, growth_factor=6,
                 use_semantics=True, n_points=9, output_scale=1.0,
                 dtype=jnp.bfloat16, conv3x3="dots9", pack_vortex=False):
        self.folded = fold_v3(params, batch_stats,
                              growth_factor=growth_factor,
                              use_semantics=use_semantics,
                              n_points=n_points, output_scale=output_scale,
                              pack_vortex=pack_vortex)
        self.dtype = dtype
        self.conv3x3 = conv3x3

    def __call__(self, inputs):
        return apply_v3(self.folded, inputs, dtype=self.dtype,
                        conv3x3=self.conv3x3)
