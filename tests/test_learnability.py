"""End-to-end learnability: the detector must overfit a tiny synthetic set
and score near-perfect mAP on it. This exercises the full loop the unit
tests can't: assignment → losses → optimizer → decode → NMS → COCO mAP.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from multimodal_moe_tpu.losses.tal import yolo_loss
from multimodal_moe_tpu.models.yolo import YoloDetector
from multimodal_moe_tpu.ops.coco_map import evaluate_detections
from multimodal_moe_tpu.ops.nms import batched_nms

H, W = 64, 128
N_IMG = 8
M = 4


def _make_dataset(seed=0):
    """Dark background, 1-3 bright rectangles per image = 'pedestrians'."""
    rng = np.random.default_rng(seed)
    images = rng.normal(30, 5, (N_IMG, H, W, 3))
    gt_boxes = np.zeros((N_IMG, M, 4), np.float32)
    gt_mask = np.zeros((N_IMG, M), bool)
    for i in range(N_IMG):
        for j in range(int(rng.integers(1, 4))):
            w = float(rng.uniform(10, 24))
            h = float(rng.uniform(16, 36))
            x = float(rng.uniform(0, W - w - 1))
            y = float(rng.uniform(0, H - h - 1))
            images[i, int(y) : int(y + h), int(x) : int(x + w)] = rng.uniform(180, 250)
            gt_boxes[i, j] = [x, y, x + w, y + h]
            gt_mask[i, j] = True
    images = np.clip(images, 0, 255).astype(np.uint8)
    return (
        jnp.asarray(images),
        jnp.asarray(gt_boxes),
        jnp.zeros((N_IMG, M), jnp.int32),
        jnp.asarray(gt_mask),
    )


@pytest.mark.slow
def test_detector_overfits_to_high_map():
    images, gt_boxes, gt_labels, gt_mask = _make_dataset()
    model = YoloDetector(num_classes=1, variant="n")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), train=False)
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    tx = optax.adam(2e-3)
    opt_state = tx.init(params)

    imgs_f = images.astype(jnp.float32) / 255.0

    @jax.jit
    def step(params, batch_stats, opt_state):
        def loss_fn(p):
            out, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats},
                imgs_f,
                train=True,
                mutable=["batch_stats"],
            )
            total, metrics = yolo_loss(out, gt_labels, gt_boxes, gt_mask)
            return total, (metrics, mutated["batch_stats"])

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, new_opt = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), new_stats, new_opt, loss

    loss0 = None
    for i in range(150):
        params, batch_stats, opt_state, loss = step(params, batch_stats, opt_state)
        if loss0 is None:
            loss0 = float(loss)
    assert float(loss) < loss0 * 0.5, f"loss {loss0} → {float(loss)}"

    # Inference on the training set → near-perfect mAP50.
    out = model.apply(
        {"params": params, "batch_stats": batch_stats}, imgs_f, train=False
    )
    scores = jax.nn.sigmoid(out["cls_logits"][..., 0])
    nms = batched_nms(
        out["boxes"], scores, iou_threshold=0.7, score_threshold=0.05, max_det=20
    )
    det_boxes, det_scores, gts = [], [], []
    for i in range(N_IMG):
        keep = np.asarray(nms.valid[i])
        det_boxes.append(np.asarray(nms.boxes[i])[keep])
        det_scores.append(np.asarray(nms.scores[i])[keep])
        gts.append(np.asarray(gt_boxes[i])[np.asarray(gt_mask[i])])
    m = evaluate_detections(det_boxes, det_scores, gts, compute_curves=False)

    assert m.map50 > 0.6, f"map50={m.map50} (ap_per_iou={m.ap_per_iou})"
    assert m.recall > 0.6, f"recall={m.recall}"


@pytest.mark.slow
def test_int8_preserves_learned_map():
    """The w8a8 serving path must preserve a *trained* model's accuracy —
    random-weight correlation tests can't show this. Overfit a tiny
    MoE-YOLO (the family exercising every int8 branch: trunk convs, SPPF,
    s2d stem, expert sweep, requantized MoE outputs), then assert the
    quantized model's mAP50 on the training set is within a small delta of
    fp. dispatch='sweep' on both so fp and int8 run the same dropless math."""
    from multimodal_moe_tpu import quant as Q
    from multimodal_moe_tpu.models.moe_yolo import MoEYoloDetector, moe_yolo_loss

    images, gt_boxes, gt_labels, gt_mask = _make_dataset(seed=1)
    ctx = jnp.zeros((N_IMG,), jnp.int32)
    model = MoEYoloDetector(
        num_classes=1, variant="n", num_experts=2, dispatch="sweep"
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), train=False,
        context_ids=ctx[:1],
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(2e-3)
    opt_state = tx.init(params)
    imgs_f = images.astype(jnp.float32) / 255.0

    @jax.jit
    def step(params, batch_stats, opt_state):
        def loss_fn(p):
            out, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats},
                imgs_f, train=True, mutable=["batch_stats"], context_ids=ctx,
            )
            total, metrics = moe_yolo_loss(out, gt_labels, gt_boxes, gt_mask)
            return total, (metrics, mutated["batch_stats"])

        (loss, (_, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, new_opt = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), new_stats, new_opt, loss

    for _ in range(150):
        params, batch_stats, opt_state, loss = step(params, batch_stats, opt_state)

    trained = {"params": params, "batch_stats": batch_stats}
    model_q = MoEYoloDetector(
        num_classes=1, variant="n", num_experts=2, dispatch="sweep", int8=True
    )
    qvars = Q.quantize_detector(
        model, model_q, trained, [imgs_f], context_ids=ctx
    )
    serving = Q.merge_serving_variables(qvars, trained)

    def eval_map50(m, v):
        out = m.apply(v, imgs_f, train=False, context_ids=ctx)
        scores = jax.nn.sigmoid(out["cls_logits"][..., 0])
        nms = batched_nms(
            out["boxes"], scores, iou_threshold=0.7, score_threshold=0.05,
            max_det=20,
        )
        det_boxes, det_scores, gts = [], [], []
        for i in range(N_IMG):
            keep = np.asarray(nms.valid[i])
            det_boxes.append(np.asarray(nms.boxes[i])[keep])
            det_scores.append(np.asarray(nms.scores[i])[keep])
            gts.append(np.asarray(gt_boxes[i])[np.asarray(gt_mask[i])])
        return evaluate_detections(
            det_boxes, det_scores, gts, compute_curves=False
        ).map50

    map_fp = eval_map50(model, trained)
    map_q = eval_map50(model_q, serving)
    assert map_fp > 0.6, f"fp model failed to overfit: map50={map_fp}"
    assert map_q > map_fp - 0.05, f"int8 map50 {map_q} vs fp {map_fp}"
