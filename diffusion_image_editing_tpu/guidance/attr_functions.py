"""Gradient-guidance attribute functions (colour / segmentation / classifier).

Rebuild of the reference's strategy hierarchy (`src/attr_functions.py:40-257`)
as pytree dataclasses whose `apply` is pure JAX: the guidance gradient is
`-jax.grad` of (decode ∘ loss) w.r.t. x_t, computed *inside* the jitted edit
scan — the TPU-native fold of the reference's per-step
`torch.autograd.grad(...)` (`attr_functions.py:112-118`).

Differences from the reference, by design (SURVEY.md "quirks to fix"):
  * `ClassifierAttrFunc` is the single canonical name (the reference also
    imports it as `AnyGANAttrFunc`, a stale rename that is a latent
    ImportError at `attr_functions_registry.py:6`); an `AnyGANAttrFunc`
    alias is exported for API parity.
  * The background-preservation regulariser compares `(1 - mask) * decoded`
    against `(1 - mask) * x0` (the reference computes `1 - mask*pred` vs
    `x0`, `attr_functions.py:91,94` — an apparent operator-precedence slip).
  * The step window [t1, t2) is a lax-level mask, not Python control flow,
    so it can be swept as a traced value.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..core import schedule as S

Array = jax.Array
DecodeFn = Callable[[Array], Array]  # latent -> image, differentiable


def l2_norm(x: Array, y: Array) -> Array:
    """sqrt of summed squared error (`src/attr_functions.py:11-14`)."""
    return jnp.sqrt(jnp.sum((x - y) ** 2))


def single_color_loss(images: Array, idx: int, target: float | Array) -> Array:
    """Mean absolute error of one channel vs target; NHWC
    (`src/attr_functions.py:22-25`)."""
    return jnp.mean(jnp.abs(images[..., idx] - target))


def color_loss(images: Array, r: Array, g: Array, b: Array) -> Array:
    """Target-weighted per-channel MAE (`src/attr_functions.py:28-37`)."""
    return (
        single_color_loss(images, 0, r) * r
        + single_color_loss(images, 1, g) * g
        + single_color_loss(images, 2, b) * b
    )


class AttrFunc(struct.PyTreeNode):
    """Base guidance strategy. Dynamic leaves (loss_scale, t1, t2, lambda_)
    are sweepable under vmap/pjit; behavioural switches are static."""

    loss_scale: Array = struct.field(default=1.0)
    t1: Array = struct.field(default=0)
    t2: Array = struct.field(default=50)
    lambda_: Array = struct.field(default=0.01)
    nudge_xt: bool = struct.field(pytree_node=False, default=True)
    nudge_zt: bool = struct.field(pytree_node=False, default=False)
    use_mask: bool = struct.field(pytree_node=False, default=False)
    mask_attr_grad: bool = struct.field(pytree_node=False, default=False)
    mask_pred_original_sample: bool = struct.field(pytree_node=False, default=False)
    metric: Optional[str] = struct.field(pytree_node=False, default=None)  # "l2"|"lpips"
    metric_fn: Optional[Callable[[Array, Array], Array]] = struct.field(
        pytree_node=False, default=None
    )
    # rematerialize the decoder in the guidance VJP: trades one extra decode
    # forward per step for not storing decoder activations — required for
    # batched 512px edits (batch >= 2 OOMs a 16GB chip without it)
    remat_decode: bool = struct.field(pytree_node=False, default=False)
    # guidance-VJP chunk for `apply_batched`: 1 = fully serialized per-sample
    # VJPs (the round-2 memory fix); k > 1 vmaps k samples per VJP
    # (`lax.map(..., batch_size=k)`) — per-sample loss normalization is
    # preserved under vmap, only the VJP working set and MXU batch grow
    vjp_chunk: int = struct.field(pytree_node=False, default=1)
    # apply the nudge only every `stride`-th step inside the window (opt-in
    # accel: skipped steps pay ZERO guidance cost via the lax.cond below;
    # stride=1 is exact reference semantics)
    stride: int = struct.field(pytree_node=False, default=1)

    @property
    def name(self) -> str:
        return type(self).__name__

    def loss(self, decoded: Array) -> Array:
        raise NotImplementedError

    def _metric(self, a: Array, b: Array) -> Array:
        if self.metric == "l2":
            return l2_norm(a, b)
        if self.metric == "lpips":
            if self.metric_fn is None:
                raise ValueError("lpips metric requires metric_fn")
            return jnp.sum(self.metric_fn(a, b))
        if self.metric_fn is not None:
            return jnp.sum(self.metric_fn(a, b))
        raise ValueError("No metric specified")

    def calculate_loss(
        self, decoded: Array, mask: Optional[Array], x0: Optional[Array]
    ) -> Array:
        """Masked region loss + lambda * background-preservation regulariser
        (`src/attr_functions.py:78-102`)."""
        if self.mask_pred_original_sample:
            if mask is None or x0 is None:
                raise ValueError("mask_pred_original_sample requires mask and x0")
            bg = 1.0 - mask
            return self.loss(mask * decoded) + self.lambda_ * self._metric(
                bg * decoded, bg * x0
            )
        return self.loss(decoded)

    def apply(
        self,
        xt: Array,
        zt: Optional[Array],
        eps: Array,
        t: Array,
        step_idx: Array,
        sched: S.Schedule,
        decode_fn: DecodeFn,
        mask: Optional[Array] = None,
        x0: Optional[Array] = None,
    ) -> Tuple[Array, Optional[Array]]:
        """One guidance nudge (`src/attr_functions.py:120-163`): recompute
        pred-x0 from x_t (eps detached), decode WITH gradient, nudge by
        -grad(scale * loss) * alpha_bar_t^2 inside the [t1, t2) window."""
        a_t = S.alpha_bar(sched, t).astype(xt.dtype)
        eps_sg = jax.lax.stop_gradient(eps)
        if self.remat_decode:
            # wrap in a plain function: jax.checkpoint hashes its callable and
            # pytree-callables (params leaves) are unhashable
            dec = jax.checkpoint(lambda z: decode_fn(z))
        else:
            dec = decode_fn

        def objective(x):
            px0 = (x - jnp.sqrt(1.0 - a_t) * eps_sg) / jnp.sqrt(a_t)
            decoded = dec(px0)
            m = mask if self.use_mask else None
            return self.calculate_loss(decoded, m, x0) * self.loss_scale

        if self.mask_attr_grad and mask is None:
            raise ValueError("mask_attr_grad requires a mask")

        def compute_grad(x):
            g = -jax.grad(objective)(x)
            return mask * g if self.mask_attr_grad else g

        in_window = jnp.logical_and(step_idx >= self.t1, step_idx < self.t2)
        if self.stride > 1:
            in_window = jnp.logical_and(in_window, step_idx % self.stride == 0)

        if jnp.ndim(in_window) == 0:
            # Scalar window predicate (the common case): lax.cond, so steps
            # outside [t1, t2) — and strided-off steps — pay ZERO guidance
            # cost instead of computing the full decode/loss-net VJP and
            # where-masking it away. Numerically identical to the masked
            # form. (Under vmapped sweeps cond lowers to select — correctness
            # holds, the saving needs the scalar path of `apply_batched`.)
            attr_grad = jax.lax.cond(
                in_window, compute_grad, lambda x: jnp.zeros_like(x), xt
            )
            nudge = attr_grad * a_t**2
        else:
            # batched t1/t2 leaves used directly (outside apply_batched):
            # keep the broadcasting where-mask form
            attr_grad = compute_grad(xt)
            nudge = jnp.where(in_window, 1.0, 0.0).astype(xt.dtype) * attr_grad * a_t**2
        if self.nudge_xt:
            xt = xt + nudge
        if self.nudge_zt and zt is not None:
            zt = zt + nudge
        return xt, zt

    def apply_batched(
        self,
        xt: Array,
        zt: Optional[Array],
        eps: Array,
        t: Array,
        step_idx: Array,
        sched: S.Schedule,
        decode_fn: DecodeFn,
        mask: Optional[Array] = None,
        x0: Optional[Array] = None,
    ) -> Tuple[Array, Optional[Array]]:
        """`apply` with the guidance VJP serialized per sample via `lax.map`
        for batch >= 2. Two reasons this is THE batched entry point:

        * Performance: the BATCHED 512px decode-VJP collapses to ~3.2
          steps/s/sample on a 16GB chip (HBM working set) while per-sample
          VJPs keep the batch-1 rate — 14.67 vs 6.38 aggregate steps/s at
          batch 2 (PARITY.md round 2).
        * Semantics: the reference edits images one at a time
          (`base_diffusion.py:123-141`), so its loss reductions (e.g. the
          colour losses' `mean`) normalize per image. Per-sample application
          reproduces that at any batch size, whereas calling `apply` on a
          batch would fold the batch dim into mean/l2 reductions and dilute
          the guidance strength by 1/B.

        Per-sample `mask` / `x0` arrays (leading dim == batch) are mapped
        alongside the samples; batch-1 broadcast arrays are shared. Swept
        dynamic attr leaves (loss_scale/t1/t2/lambda_ with leading dim ==
        batch, see `parallel.sweep_attr_func`) are mapped too — a guidance-
        scale grid runs as ONE batched single-chip program through the same
        serialized-VJP path (BASELINE config 5)."""
        b = xt.shape[0]
        if b == 1:
            return self.apply(
                xt, zt, eps, t, step_idx, sched, decode_fn, mask=mask, x0=x0
            )
        has_z = zt is not None
        mapped = {"x": xt, "e": eps}
        if has_z:
            mapped["z"] = zt
        per_sample_x0 = x0 is not None and x0.shape[0] == b
        if per_sample_x0:
            mapped["x0"] = x0
        per_sample_mask = mask is not None and mask.shape[0] == b
        if per_sample_mask:
            mapped["m"] = mask
        swept = [
            f for f in ("loss_scale", "t1", "t2", "lambda_")
            if getattr(getattr(self, f), "ndim", 0) >= 1
            and getattr(self, f).shape[0] == b
        ]
        for f in swept:
            mapped["attr_" + f] = getattr(self, f)

        def one(mp):
            af = (
                self.replace(**{f: mp["attr_" + f] for f in swept})
                if swept else self
            )
            x01 = mp["x0"][None] if per_sample_x0 else x0
            m1 = mp["m"][None] if per_sample_mask else mask
            xn, zn = af.apply(
                mp["x"][None],
                mp["z"][None] if has_z else None,
                mp["e"][None],
                t, step_idx, sched, decode_fn, mask=m1, x0=x01,
            )
            out = {"x": xn[0]}
            if has_z:
                out["z"] = zn[0]
            return out

        chunk = max(1, min(int(self.vjp_chunk), b))
        res = jax.lax.map(one, mapped, batch_size=chunk if chunk > 1 else None)
        return res["x"], (res["z"] if has_z else zt)


class SingleColorAttrFunc(AttrFunc):
    """One-channel colour guidance (`src/attr_functions.py:166-175`)."""

    target: Array = struct.field(default=0.5)
    color_idx: int = struct.field(pytree_node=False, default=0)

    def loss(self, decoded: Array) -> Array:
        return single_color_loss(decoded, self.color_idx, self.target)


class MultiColorAttrFunc(AttrFunc):
    """RGB colour guidance (`src/attr_functions.py:178-199`)."""

    r_target: Array = struct.field(default=0.0)
    g_target: Array = struct.field(default=0.0)
    b_target: Array = struct.field(default=0.0)

    def loss(self, decoded: Array) -> Array:
        return color_loss(decoded, self.r_target, self.g_target, self.b_target)


class NetAttrFunc(AttrFunc):
    """Face-parsing (BiSeNet) guidance: softmax class-probability mass of the
    chosen classes (`src/attr_functions.py:202-219`). `seg_apply_fn` maps an
    NHWC image to (B, H, W, 19) logits."""

    seg_params: Any = struct.field(default=None)
    seg_apply_fn: Optional[Callable] = struct.field(pytree_node=False, default=None)
    idx_for_class: Tuple[int, ...] = struct.field(pytree_node=False, default=(17,))

    def loss(self, decoded: Array) -> Array:
        logits = self.seg_apply_fn(self.seg_params, decoded)
        probs = jax.nn.softmax(logits, axis=-1)
        class_mass = jnp.mean(probs, axis=(1, 2))  # (B, n_classes)
        return jnp.sum(class_mass[:, list(self.idx_for_class)])


class ClassifierAttrFunc(AttrFunc):
    """anyGAN attribute-classifier guidance (`src/attr_functions.py:222-257`):
    ResNet-50 logits reshaped (40, 2); pick [idx_for_class][idx_of_interest],
    optional quadratic regulariser against a second attribute."""

    clf_params: Any = struct.field(default=None)
    clf_apply_fn: Optional[Callable] = struct.field(pytree_node=False, default=None)
    idx_for_class: int = struct.field(pytree_node=False, default=0)
    idx_of_interest: int = struct.field(pytree_node=False, default=0)
    regularize_idx: Optional[int] = struct.field(pytree_node=False, default=None)
    regularize_pred_idx: Optional[int] = struct.field(pytree_node=False, default=None)
    regularize_score: Optional[Tuple[float, float]] = struct.field(
        pytree_node=False, default=None
    )

    def loss(self, decoded: Array) -> Array:
        # Per-sample score summed over the batch: each logit row depends only
        # on its own sample, so the gradient stays per-sample at any B (the
        # reference indexes [0] and silently drops samples 1..B-1 if handed a
        # batch, `src/attr_functions.py:247`).
        logits = self.clf_apply_fn(self.clf_params, decoded).reshape(-1, 40, 2)
        value = jnp.sum(logits[:, self.idx_for_class, self.idx_of_interest])
        if self.regularize_idx is not None:
            other = logits[:, self.regularize_idx, self.regularize_pred_idx]
            score = self.regularize_score[self.regularize_pred_idx]
            value = value + jnp.sum((other + score) ** 2)
        return value


# API-parity alias for the reference's stale rename
# (`attr_functions_registry.py:6`, `metrics.py:207`).
AnyGANAttrFunc = ClassifierAttrFunc
