"""Loss functions (JAX): fusion loss + cross-entropy family.

Re-derivation of reference utils/loss.py with static shapes: the reference
filters valid rays by boolean indexing before the loss; here every ray is
kept and a validity mask weights the reductions -- same value, XLA-friendly.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

__all__ = ["fusion_loss", "cross_entropy", "bootstrapped_cross_entropy",
           "multi_scale_cross_entropy", "get_loss_function"]

_EPS = 1e-10


def fusion_loss(est: jnp.ndarray, target: jnp.ndarray,
                mask: Optional[jnp.ndarray] = None,
                w_l1: float = 1.0, w_l2: float = 10.0,
                w_cos: float = 0.1) -> jnp.ndarray:
    """FusionLoss = w_l1*L1 + w_l2*L2 + w_cos*cosine-embedding(sign, sign).

    Reference utils/loss.py:65-103. ``est``/``target`` are (b, n_rays,
    n_points); ``mask`` is (b, n_rays) validity. The cosine term follows the
    reference exactly: *reshape* (not transpose) the sign tensors to
    (b, n_points, n_rays) and take 1 - cosine similarity along axis 1,
    averaged over rays (reference utils/loss.py:84-95 -- the reshape is the
    reference's own quirk, preserved for parity).
    """
    b, n, p = est.shape
    if mask is None:
        mask = jnp.ones((b, n), bool)
    m = mask.astype(jnp.float32)
    m3 = m[:, :, None]
    n_elem = jnp.maximum(jnp.sum(m) * p, _EPS)  # valid elements b*n_valid*p

    diff = (est - target) * m3
    l1 = jnp.sum(jnp.abs(diff)) / n_elem
    l2 = jnp.sum(diff * diff) / n_elem

    x1 = jnp.sign(est).reshape(b, p, n)   # reference reshape semantics
    x2 = jnp.sign(target).reshape(b, p, n)
    mr = jnp.broadcast_to(m3, (b, n, p)).reshape(b, p, n)
    dot = jnp.sum(x1 * x2 * mr, axis=1)
    n1 = jnp.sqrt(jnp.maximum(jnp.sum(x1 * x1 * mr, axis=1), 1e-8))
    n2 = jnp.sqrt(jnp.maximum(jnp.sum(x2 * x2 * mr, axis=1), 1e-8))
    cos = dot / (n1 * n2)
    ray_valid = (jnp.sum(mr, axis=1) > 0).astype(jnp.float32)  # (b, n)
    l3 = jnp.sum((1.0 - cos) * ray_valid) / jnp.maximum(jnp.sum(ray_valid),
                                                        _EPS)
    return w_l1 * l1 + w_l2 * l2 + w_cos * l3


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  weight: Optional[jnp.ndarray] = None,
                  ignore_index: int = 0) -> jnp.ndarray:
    """Mean CE over non-ignored pixels (reference utils/loss.py:6-13; the
    reference ignores class 0). ``logits`` (..., C), ``labels`` (...)."""
    c = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    safe = jnp.clip(labels, 0, c - 1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    if weight is not None:
        nll = nll * jnp.take(weight, safe)
    valid = (labels != ignore_index) & (labels >= 0) & (labels < c)
    vm = valid.astype(jnp.float32)
    return jnp.sum(nll * vm) / jnp.maximum(jnp.sum(vm), _EPS)


def bootstrapped_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                               min_k: int, loss_th: float,
                               weight: Optional[jnp.ndarray] = None,
                               ignore_index: int = -100) -> jnp.ndarray:
    """Top-K hard-pixel CE, bootstrapped per image
    (reference utils/loss.py:16-45): take pixels with loss > threshold, but
    at least the hardest min_k."""
    b = logits.shape[0]
    c = logits.shape[-1]
    logits2 = logits.reshape(b, -1, c)
    labels2 = labels.reshape(b, -1)

    logp = jax.nn.log_softmax(logits2, axis=-1)
    safe = jnp.clip(labels2, 0, c - 1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    if weight is not None:
        nll = nll * jnp.take(weight, safe)
    valid = (labels2 != ignore_index) & (labels2 >= 0) & (labels2 < c)
    nll = jnp.where(valid, nll, -jnp.inf)  # invalid sorts to the bottom

    sorted_loss = -jnp.sort(-nll, axis=1)          # descending
    kth = sorted_loss[:, min_k]                    # (b,)
    use_threshold = kth > loss_th

    finite = jnp.isfinite(sorted_loss)
    above = finite & (sorted_loss > loss_th)
    idx = jax.lax.broadcasted_iota(jnp.int32, sorted_loss.shape, 1)
    topk = finite & (idx < min_k)
    sel = jnp.where(use_threshold[:, None], above, topk)
    s = sel.astype(jnp.float32)
    per_image = jnp.sum(jnp.where(sel, sorted_loss, 0.0), axis=1) \
        / jnp.maximum(jnp.sum(s, axis=1), _EPS)
    return jnp.mean(per_image)


def multi_scale_cross_entropy(outputs: Sequence[jnp.ndarray],
                              labels: jnp.ndarray,
                              weights: Sequence[float] = (1.0, 0.6, 0.5),
                              ignore_index: int = 0,
                              class_weight: Optional[jnp.ndarray] = None
                              ) -> jnp.ndarray:
    """Weighted sum of per-head CE losses -- the segmentation training
    objective ``1.0*CE(res) + 0.6*CE(aux1) + 0.5*CE(aux2)``
    (reference train_segmentation.py:206)."""
    total = 0.0
    for w, out in zip(weights, outputs):
        total = total + w * cross_entropy(out, labels, class_weight,
                                          ignore_index)
    return total


def get_loss_function(loss_cfg, class_weight_path: Optional[str] = None):
    """Name -> loss-callable factory (reference utils/setup.py:196-221).

    Returns fn(est, target, **kw) closures with the config's
    hyperparameters bound; class weights may be loaded from a text file
    like the reference does.
    """
    import functools as _ft

    if loss_cfg is None:
        return cross_entropy
    name = loss_cfg.get("name", "fusion")
    weight = None
    wpath = loss_cfg.get("weight") or class_weight_path
    if wpath:
        import numpy as _np
        weight = jnp.asarray(_np.loadtxt(wpath), jnp.float32)

    if name == "fusion":
        return _ft.partial(fusion_loss,
                           w_l1=float(loss_cfg.get("w_l1", 1.0)),
                           w_l2=float(loss_cfg.get("w_l2", 10.0)),
                           w_cos=float(loss_cfg.get("w_cos", 0.1)))
    if name == "cross_entropy":
        return _ft.partial(cross_entropy, weight=weight)
    if name == "bootstrapped_cross_entropy":
        return _ft.partial(bootstrapped_cross_entropy,
                           min_k=int(loss_cfg.get("min_K",
                                                  loss_cfg.get("min_k",
                                                               4096))),
                           loss_th=float(loss_cfg.get("loss_th", 0.3)),
                           weight=weight)
    if name == "multi_scale_cross_entropy":
        return _ft.partial(multi_scale_cross_entropy, class_weight=weight)
    raise NotImplementedError(f"Loss {name} not implemented")
