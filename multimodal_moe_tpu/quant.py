"""Post-training int8 quantization for the detector serving path.

The reference serves detectors through Ultralytics' fp16 CUDA path and has
no quantized deployment story; here int8 is a first-class TPU serving mode:
v5e's MXU runs s8×s8→s32 at twice the bf16 rate, and the YOLO forward is
activation-bandwidth-bound (xplane: compute is ~17 of 58 ms at B64,
docs/performance.md), so storing every inter-layer activation as 1 byte
instead of 2 attacks the actual bottleneck.

Scheme (standard w8a8 PTQ):

* weights: BatchNorm folded into the conv, then symmetric **per-output-
  channel** int8 (`w_q = round(w' / s_w[c])`)
* activations: symmetric **per-tensor** int8 with calibrated static scales
  (`s_out = absmax / 127` from a few forward batches) so every scale is a
  compile-time-steady scalar and XLA fuses the dequant→SiLU→requant chain
  into the conv epilogue — the only tensors materialized in HBM between
  convs are int8
* accumulation: int32 on the MXU (`preferred_element_type`), epilogue in
  fp32
* residual adds requantize with their own calibrated scale; concats
  requantize all parts to the max participating scale (exact-range, no
  calibration needed); max-pool / space-to-depth / nearest-upsample act on
  int8 directly (monotone / data-movement only)
* the head's 1×1 prediction convs dequantize to fp32 — decode (DFL
  softmax-expectation) and NMS run unchanged

The quantized forward reads a ``quant`` variable collection whose module
paths mirror the fp ``params`` tree, built offline by
:func:`build_quant_variables` from trained fp variables + calibration
statistics (:func:`calibrate`).
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_BN_EPS = 1e-3  # must match models.layers.ConvBNAct's BatchNorm epsilon
_RESNET_BN_EPS = 1e-5  # must match models.resnet._ConvBN's BatchNorm epsilon
_MIN_SCALE = 1e-12


class QT(NamedTuple):
    """A quantized activation tensor: ``x ≈ q · s``.

    ``q`` is int8, ``s`` a scalar fp32 scale. Flows through the detector
    modules as a pytree; a module receiving a ``QT`` takes its quantized
    branch.
    """

    q: jnp.ndarray
    s: jnp.ndarray


def quantize_to(x: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """fp → int8 with symmetric scale ``s`` (round-to-nearest-even, clip)."""
    return jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)


def dequantize(x: QT) -> jnp.ndarray:
    return x.q.astype(jnp.float32) * x.s


def q_from_images(images: jnp.ndarray) -> QT:
    """Quantize normalized [0, 1] images to int8 with the static scale 1/127."""
    s = jnp.asarray(1.0 / 127.0, jnp.float32)
    q = jnp.clip(jnp.round(images.astype(jnp.float32) * 127.0), -127, 127)
    return QT(q.astype(jnp.int8), s)


def qcat(xs: "list[QT]", axis: int = -1) -> QT:
    """Concatenate QTs, requantizing every part to the max participating
    scale (covers the union of ranges exactly; no calibration needed).

    Parts that share the *same scale object* (e.g. SPPF's chained pools of
    one tensor) skip the rescale pass entirely.
    """
    if all(x.s is xs[0].s for x in xs):
        return QT(jnp.concatenate([x.q for x in xs], axis=axis), xs[0].s)
    s_t = xs[0].s
    for x in xs[1:]:
        s_t = jnp.maximum(s_t, x.s)
    parts = [
        jnp.clip(jnp.round(x.q.astype(jnp.float32) * (x.s / s_t)), -127, 127).astype(
            jnp.int8
        )
        for x in xs
    ]
    return QT(jnp.concatenate(parts, axis=axis), s_t)


def q_split2(x: QT) -> "tuple[QT, QT]":
    a, b = jnp.split(x.q, 2, axis=-1)
    return QT(a, x.s), QT(b, x.s)


# --------------------------------------------------------------------------
# Calibration (fp model, mutable 'qcal' collection)
# --------------------------------------------------------------------------


def absmax_sow_kwargs():
    """Keyword args for ``self.sow('qcal', name, absmax, **these)`` so the
    stored statistic is the elementwise max over every calibration batch."""
    return dict(
        reduce_fn=jnp.maximum, init_fn=lambda: jnp.zeros((), jnp.float32)
    )


def calibrate(
    model, variables, batches: Iterable, mode: str = "absmax", **apply_kwargs
) -> Dict:
    """Run fp forward passes collecting per-module activation statistics.

    ``batches`` yields normalized [0,1] image arrays (or whatever the model's
    ``__call__`` takes first). Returns the accumulated ``qcal`` tree.

    ``mode``:
      absmax — running max of |activation| over all batches (default; the
               conservative choice: nothing ever clips, but one outlier
               activation stretches the scale and costs resolution for
               every other value in the tensor).
      avgmax — mean of the per-batch absmax ("averaging max", TensorRT-style):
               outliers in a single batch are damped by the average, trading
               rare clipping for finer resolution everywhere else — built
               for the hard-corpus finding that per-tensor absmax PTQ costs
               ~0.03 mAP50-95 in the small-object regime (BASELINE.md r4).
    """
    if mode not in ("absmax", "avgmax"):
        raise ValueError(f"unknown calibration mode {mode!r}")

    @jax.jit
    def step(variables, qcal, images):
        vs = dict(variables)
        if qcal is not None:
            vs["qcal"] = qcal
        _, aux = model.apply(vs, images, train=False, mutable=["qcal"], **apply_kwargs)
        return aux["qcal"]

    if mode == "absmax":
        qcal = None
        for images in batches:
            qcal = step(variables, qcal, jnp.asarray(images))
        if qcal is None:
            raise ValueError("calibrate() needs at least one batch")
        return jax.device_get(qcal)

    # avgmax: a fresh qcal per batch (the in-model sow reduces by max, so a
    # None carry yields that batch's absmax), averaged on host.
    per_batch = [
        jax.device_get(step(variables, None, jnp.asarray(images)))
        for images in batches
    ]
    if not per_batch:
        raise ValueError("calibrate() needs at least one batch")
    return jax.tree_util.tree_map(
        lambda *leaves: sum(np.asarray(l, np.float32) for l in leaves) / len(leaves),
        *per_batch,
    )


# --------------------------------------------------------------------------
# Conversion: fp variables + calibration stats → 'quant' collection
# --------------------------------------------------------------------------


def _fold_convbn(pnode, snode, qcal_node):
    """Conv+BN params (+ batch stats, + calibrated out absmax) →
    {w_q, s_w, b, s_out}.

    Handles both block layouts: ``models.layers.ConvBNAct`` names its
    children ``conv``/``bn`` (BN eps 1e-3); ``models.resnet._ConvBN`` keeps
    Flax auto-names ``Conv_0``/``BatchNorm_0`` (BN eps 1e-5) so existing
    ResNet/RT-DETR checkpoints keep their param paths."""
    if "conv" in pnode:
        conv_key, bn_key, eps = "conv", "bn", _BN_EPS
    else:
        conv_key, bn_key, eps = "Conv_0", "BatchNorm_0", _RESNET_BN_EPS
    kernel = np.asarray(pnode[conv_key]["kernel"], np.float64)  # (k,k,cin,cout)
    gamma = np.asarray(pnode[bn_key]["scale"], np.float64)
    beta = np.asarray(pnode[bn_key]["bias"], np.float64)
    mean = np.asarray(snode[bn_key]["mean"], np.float64)
    var = np.asarray(snode[bn_key]["var"], np.float64)
    inv = gamma / np.sqrt(var + eps)
    w = kernel * inv  # fold BN scale into conv (per out-channel)
    b = beta - mean * inv
    s_w = np.maximum(np.abs(w).max(axis=(0, 1, 2)) / 127.0, _MIN_SCALE)
    w_q = np.clip(np.rint(w / s_w), -127, 127).astype(np.int8)
    s_out = np.maximum(float(np.asarray(qcal_node["out_absmax"])) / 127.0, _MIN_SCALE)
    return {
        "w_q": jnp.asarray(w_q),
        "s_w": jnp.asarray(s_w, jnp.float32),
        "b": jnp.asarray(b, jnp.float32),
        "s_out": jnp.asarray(s_out, jnp.float32),
    }


def _fold_predconv(pnode):
    """Plain 1×1 prediction conv params → {w_q, s_w, b} (fp32 output)."""
    kernel = np.asarray(pnode["kernel"], np.float64)
    bias = np.asarray(pnode["bias"], np.float64)
    s_w = np.maximum(np.abs(kernel).max(axis=(0, 1, 2)) / 127.0, _MIN_SCALE)
    w_q = np.clip(np.rint(kernel / s_w), -127, 127).astype(np.int8)
    return {
        "w_q": jnp.asarray(w_q),
        "s_w": jnp.asarray(s_w, jnp.float32),
        "b": jnp.asarray(bias, jnp.float32),
    }


def _fold_moe_ffn(pnode, qcal_node):
    """MoE expert-FFN params (+ calibrated per-expert mid absmax) →
    {w1_q, s_w1, b1, s_mid, w2_q, s_w2, b2} for the w8a8 sweep
    (models/moe.py moe_apply_sweep_int8). Weights quantize per-expert-
    per-output-channel; the fp32 router keeps reading 'params'."""
    w1 = np.asarray(pnode["experts_w1"], np.float64)  # (E, d, h)
    b1 = np.asarray(pnode["experts_b1"], np.float64)
    w2 = np.asarray(pnode["experts_w2"], np.float64)  # (E, h, d)
    b2 = np.asarray(pnode["experts_b2"], np.float64)
    s_w1 = np.maximum(np.abs(w1).max(axis=1) / 127.0, _MIN_SCALE)  # (E, h)
    w1_q = np.clip(np.rint(w1 / s_w1[:, None, :]), -127, 127).astype(np.int8)
    s_w2 = np.maximum(np.abs(w2).max(axis=1) / 127.0, _MIN_SCALE)  # (E, d)
    w2_q = np.clip(np.rint(w2 / s_w2[:, None, :]), -127, 127).astype(np.int8)
    s_mid = np.maximum(
        np.asarray(qcal_node["mid_absmax"], np.float64) / 127.0, _MIN_SCALE
    )  # (E,)
    return {
        "w1_q": jnp.asarray(w1_q),
        "s_w1": jnp.asarray(s_w1, jnp.float32),
        "b1": jnp.asarray(b1, jnp.float32),
        "s_mid": jnp.asarray(s_mid, jnp.float32),
        "w2_q": jnp.asarray(w2_q),
        "s_w2": jnp.asarray(s_w2, jnp.float32),
        "b2": jnp.asarray(b2, jnp.float32),
    }


def build_quant_variables(model_q, fp_variables: Dict, qcal: Dict, sample_images) -> Dict:
    """Build the ``{'quant': ...}`` variables for the int8 model.

    ``model_q`` is the detector constructed with ``int8=True``; its abstract
    init gives the quant-tree *structure* (and shape-checks the conversion),
    while the values come from folding ``fp_variables`` with the calibration
    statistics ``qcal``. Module paths line up by construction: the quantized
    branches declare their variables under the same module names the fp
    branches use for params.
    """
    struct = jax.eval_shape(
        lambda: model_q.init(jax.random.PRNGKey(0), sample_images, train=False)
    )["quant"]
    params = fp_variables["params"]
    stats = fp_variables.get("batch_stats", {})

    def walk(qnode, pnode, snode, cnode, path):
        keys = set(qnode.keys())
        if "w_q" in keys or "w1_q" in keys:
            if "w1_q" in keys:  # MoE expert FFN (w8a8 sweep)
                built = _fold_moe_ffn(pnode, cnode)
            elif "s_out" in keys:  # ConvBNAct
                built = _fold_convbn(pnode, snode, cnode)
            else:  # prediction conv
                built = _fold_predconv(pnode)
            for k, v in built.items():
                want = qnode[k].shape
                if tuple(v.shape) != tuple(want):
                    raise ValueError(
                        f"quant leaf {'/'.join(path + (k,))}: shape {v.shape} "
                        f"!= expected {want}"
                    )
            return built
        out = {}
        for k in qnode:
            if k.startswith("s_") and not isinstance(qnode[k], dict):
                # requant scale ↔ calibrated absmax, by naming convention:
                # quant var 's_<name>_<i>' reads qcal '<name><i>_absmax'
                # (e.g. s_add_0 ↔ add0_absmax, s_moe_out_1 ↔ moe_out1_absmax)
                stem, idx = k[2:].rsplit("_", 1)
                absmax = float(np.asarray(cnode[f"{stem}{idx}_absmax"]))
                out[k] = jnp.asarray(max(absmax / 127.0, _MIN_SCALE), jnp.float32)
            else:
                out[k] = walk(
                    qnode[k],
                    pnode[k],
                    snode.get(k, {}) if isinstance(snode, dict) else {},
                    cnode.get(k, {}) if isinstance(cnode, dict) else {},
                    path + (k,),
                )
        return out

    return {"quant": walk(struct, params, stats, qcal, ())}


def quantize_detector(
    model_fp, model_q, fp_variables, calib_batches, mode: str = "absmax",
    **apply_kwargs,
):
    """One-call PTQ: calibrate on ``calib_batches`` then build quant vars."""
    batches = list(calib_batches)
    qcal = calibrate(model_fp, fp_variables, batches, mode=mode, **apply_kwargs)
    sample = jnp.asarray(batches[0])[:1]
    return build_quant_variables(model_q, fp_variables, qcal, sample)


def merge_serving_variables(quant_vars: Dict, fp_variables: Dict) -> Dict:
    """Serving variables for partially-quantized models: the int8 branches
    read 'quant', the fp islands (MoE routers, RT-DETR AIFI/decoder) keep
    reading 'params'."""
    out = dict(quant_vars)
    out["params"] = fp_variables["params"]
    if "batch_stats" in fp_variables:
        out["batch_stats"] = fp_variables["batch_stats"]
    return out


# --------------------------------------------------------------------------
# Flat (de)serialization for checkpointing the quant tree
# --------------------------------------------------------------------------


def save_quant_npz(path, quant_variables: Dict) -> None:
    flat = jax.tree_util.tree_flatten_with_path(quant_variables)[0]
    arrays = {}
    for kpath, leaf in flat:
        name = "/".join(
            k.key if hasattr(k, "key") else str(k) for k in kpath
        )
        arrays[name] = np.asarray(leaf)
    np.savez(path, **arrays)


def load_quant_npz(path) -> Dict:
    data = np.load(path)
    tree: Dict[str, Any] = {}
    for name in data.files:
        node = tree
        parts = name.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        arr = data[name]
        node[parts[-1]] = jnp.asarray(arr)
    return tree
