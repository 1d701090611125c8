"""int8 PTQ serving path: converter correctness + fp↔int8 parity.

The reference has no quantized deployment story (Ultralytics fp16 CUDA);
the int8 path is a TPU-serving addition (quant.py) targeting the
activation-bandwidth bound. These tests pin:

* the BN-fold + per-channel weight-quant arithmetic on a single ConvBNAct
* end-to-end parity of the full YoloDetector int8 forward vs fp
* that the converter fills every quant leaf (no silent default scales)
* npz round-trip of the quant tree
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_moe_tpu import quant as Q
from multimodal_moe_tpu.models.layers import ConvBNAct
from multimodal_moe_tpu.models.yolo import YoloDetector


def _rand_images(rng, n, h, w, b=2):
    return [jnp.asarray(rng.random((b, h, w, 3), np.float32)) for _ in range(n)]


@pytest.fixture(scope="module")
def tiny_quantized():
    """fp 'n'-variant detector + its converted int8 twin (64×96 input)."""
    h, w = 64, 96
    m = YoloDetector(num_classes=1, variant="n", dtype=jnp.float32)
    mq = YoloDetector(num_classes=1, variant="n", dtype=jnp.float32, int8=True)
    rng = np.random.default_rng(0)
    imgs = _rand_images(rng, 3, h, w)
    variables = m.init(jax.random.PRNGKey(0), imgs[0], train=False)
    qvars = Q.quantize_detector(m, mq, variables, imgs)
    return m, mq, variables, qvars, imgs


def test_convbnact_quant_parity():
    """Single block: int8 path ≈ fp path within per-tensor quant error."""
    m = ConvBNAct(16, 3)
    mq = m  # same module; branch chosen by input type
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8)).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    # give BN stats a non-trivial affine so the fold is actually exercised
    variables = jax.tree.map(lambda v: v, variables)
    bs = dict(variables["batch_stats"]["bn"])
    bs["mean"] = jnp.full_like(bs["mean"], 0.1)
    bs["var"] = jnp.full_like(bs["var"], 0.5)
    variables = {
        "params": variables["params"],
        "batch_stats": {"bn": bs},
    }
    qcal = Q.calibrate(m, variables, [x])
    s_in = jnp.float32(np.abs(x).max() / 127)
    x_q = Q.QT(Q.quantize_to(x, s_in), s_in)
    qvars = Q.build_quant_variables(mq, variables, qcal, x_q)
    y_fp = np.asarray(m.apply(variables, x, train=False))
    out = mq.apply(qvars, x_q, train=False)
    y_q = np.asarray(Q.dequantize(out))
    # error budget: input quant + output quant, each ≤ absmax/127 ≈ 1%
    scale = max(np.abs(y_fp).max(), 1e-6)
    assert np.abs(y_fp - y_q).max() / scale < 0.05
    assert np.corrcoef(y_fp.ravel(), y_q.ravel())[0, 1] > 0.999


def test_full_model_parity(tiny_quantized):
    m, mq, variables, qvars, imgs = tiny_quantized
    out_fp = m.apply(variables, imgs[0], train=False)
    out_q = mq.apply(qvars, imgs[0], train=False)
    cls_fp = np.asarray(out_fp["cls_logits"]).ravel()
    cls_q = np.asarray(out_q["cls_logits"]).ravel()
    box_fp = np.asarray(out_fp["boxes"]).ravel()
    box_q = np.asarray(out_q["boxes"]).ravel()
    assert np.corrcoef(cls_fp, cls_q)[0, 1] > 0.99
    assert np.corrcoef(box_fp, box_q)[0, 1] > 0.999
    # decoded boxes live in pixel units — mean error well under a pixel
    assert np.abs(box_fp - box_q).mean() < 0.5


def test_every_quant_leaf_filled(tiny_quantized):
    _, _, _, qvars, _ = tiny_quantized
    leaves = jax.tree_util.tree_flatten_with_path(qvars["quant"])[0]
    n_conv = 0
    for kpath, leaf in leaves:
        name = "/".join(k.key for k in kpath)
        arr = np.asarray(leaf)
        if name.endswith("s_out") or "s_add" in name:
            # calibrated scales: must be strictly positive and not the
            # 1.0 init default (absmax/127 of real activations never lands
            # exactly on 1.0)
            assert arr.min() > 0 and not np.allclose(arr, 1.0), name
        if name.endswith("w_q"):
            n_conv += 1
            assert arr.dtype == np.int8
            # per-channel symmetric quant saturates at least one weight
            # per channel at ±127
            assert np.abs(arr).max() == 127, name
    assert n_conv > 20  # backbone + neck + head convs all present


def test_int8_activations_flow(tiny_quantized):
    """The quant forward's inter-layer tensors really are int8 QTs: probing
    the backbone submodule output directly."""
    _, mq, _, qvars, imgs = tiny_quantized
    out, mods = mq.apply(
        qvars, imgs[0], train=False,
        capture_intermediates=lambda mdl, _: mdl.name == "backbone",
        mutable=["intermediates"],
    )
    p3, p4, p5 = mods["intermediates"]["backbone"]["__call__"][0]
    for t in (p3, p4, p5):
        assert isinstance(t, Q.QT)
        assert t.q.dtype == jnp.int8
    # final outputs are fp for decode/NMS
    assert out["boxes"].dtype == jnp.float32


def test_npz_roundtrip(tmp_path, tiny_quantized):
    _, mq, _, qvars, imgs = tiny_quantized
    path = tmp_path / "quant.npz"
    Q.save_quant_npz(path, qvars)
    loaded = Q.load_quant_npz(path)
    a = mq.apply(qvars, imgs[0], train=False)
    b = mq.apply(loaded, imgs[0], train=False)
    np.testing.assert_array_equal(np.asarray(a["boxes"]), np.asarray(b["boxes"]))


def test_moe_yolo_int8_parity():
    """MoE-YOLO serving: int8 trunk + w8a8 expert FFNs ≈ fp model.

    Both models pin dispatch='sweep' so fp and int8 run the same dropless
    math (at tiny test token counts 'auto' would give fp the capacity-
    dropping dense path while int8 always sweeps)."""
    from multimodal_moe_tpu.models.moe_yolo import MoEYoloDetector

    h, w = 64, 96
    m = MoEYoloDetector(
        num_classes=1, variant="n", num_experts=2, dispatch="sweep"
    )
    mq = MoEYoloDetector(
        num_classes=1, variant="n", num_experts=2, dispatch="sweep", int8=True
    )
    rng = np.random.default_rng(3)
    imgs = _rand_images(rng, 2, h, w)
    ctx = jnp.zeros((2,), jnp.int32)
    variables = m.init(jax.random.PRNGKey(0), imgs[0], train=False)
    qvars = Q.quantize_detector(m, mq, variables, imgs, context_ids=ctx)
    serving = Q.merge_serving_variables(qvars, variables)
    out_fp = m.apply(variables, imgs[0], train=False, context_ids=ctx)
    out_q = mq.apply(serving, imgs[0], train=False, context_ids=ctx)
    cls_fp = np.asarray(out_fp["cls_logits"]).ravel()
    cls_q = np.asarray(out_q["cls_logits"]).ravel()
    box_fp = np.asarray(out_fp["boxes"]).ravel()
    box_q = np.asarray(out_q["boxes"]).ravel()
    assert np.corrcoef(cls_fp, cls_q)[0, 1] > 0.99
    assert np.corrcoef(box_fp, box_q)[0, 1] > 0.999
    # the MoE requant scales were calibrated (not left at the 1.0 init)
    for i in range(3):
        s = float(np.asarray(qvars["quant"][f"s_moe_out_{i}"]))
        assert s > 0 and s != 1.0
    # the expert FFNs themselves are w8a8: int8 stacked weights + calibrated
    # per-expert mid scales on every level
    for i in range(3):
        ffn = qvars["quant"][f"moe_level{i}"]
        assert ffn["w1_q"].dtype == jnp.int8 and ffn["w2_q"].dtype == jnp.int8
        s_mid = np.asarray(ffn["s_mid"])
        assert s_mid.shape == (2,) and (s_mid > 0).all()
        assert not np.allclose(s_mid, 1.0)


def test_rtdetr_int8_backbone_parity():
    """RT-DETR serving: int8 ResNet-vd backbone ≈ fp backbone stage outputs,
    int8 CCFF encoder ≈ fp encoder maps (AIFI runs as a requantized fp
    island); the full forward (fp decoder via merged serving variables) runs
    and stays finite. Final boxes aren't compared directly — with random
    weights the encoder's top-k query selection can flip under quantization
    noise, which is a selection discontinuity, not a quantization error."""
    from multimodal_moe_tpu.models.rtdetr import RTDETRDetector

    h, w = 64, 96
    kw = dict(
        num_classes=1, hidden_dim=32, num_queries=16, num_decoder_layers=1,
        num_heads=2, backbone_depths=(1, 1, 1, 1), num_denoising_groups=0,
    )
    m = RTDETRDetector(**kw)
    mq = RTDETRDetector(**kw, int8=True)
    rng = np.random.default_rng(4)
    imgs = _rand_images(rng, 2, h, w)
    variables = m.init(jax.random.PRNGKey(0), imgs[0], train=False)
    qvars = Q.quantize_detector(m, mq, variables, imgs)
    serving = Q.merge_serving_variables(qvars, variables)

    cap = lambda mdl, _: mdl.name in ("backbone", "encoder")
    _, mods_fp = m.apply(
        variables, imgs[0], train=False,
        capture_intermediates=cap, mutable=["intermediates"],
    )
    out_q, mods_q = mq.apply(
        serving, imgs[0], train=False,
        capture_intermediates=cap, mutable=["intermediates"],
    )
    feats_fp = mods_fp["intermediates"]["backbone"]["__call__"][0]
    feats_q = mods_q["intermediates"]["backbone"]["__call__"][0]
    assert len(feats_fp) == len(feats_q) == 4
    for f_fp, f_q in zip(feats_fp, feats_q):
        assert isinstance(f_q, Q.QT) and f_q.q.dtype == jnp.int8
        a = np.asarray(f_fp).ravel()
        b = np.asarray(Q.dequantize(f_q)).ravel()
        assert np.corrcoef(a, b)[0, 1] > 0.99
    # int8 CCFF: the three encoder output maps stay int8 end-to-end and
    # track the fp encoder per-map
    enc_fp = mods_fp["intermediates"]["encoder"]["__call__"][0]
    enc_q = mods_q["intermediates"]["encoder"]["__call__"][0]
    assert len(enc_fp) == len(enc_q) == 3
    for f_fp, f_q in zip(enc_fp, enc_q):
        assert isinstance(f_q, Q.QT) and f_q.q.dtype == jnp.int8
        a = np.asarray(f_fp).ravel()
        b = np.asarray(Q.dequantize(f_q)).ravel()
        assert np.corrcoef(a, b)[0, 1] > 0.98
    # fp head consumed the dequantized features without blowing up
    assert out_q["boxes"].dtype == jnp.float32
    assert np.isfinite(np.asarray(out_q["boxes"])).all()
    assert np.isfinite(np.asarray(out_q["cls_logits"])).all()
    # the vd avg-pool downsample + bottleneck requant scales were calibrated,
    # and so were the encoder's AIFI requant + CCFF conv scales
    names = {
        "/".join(k.key for k in kp): v
        for kp, v in jax.tree_util.tree_flatten_with_path(qvars["quant"])[0]
    }
    assert any("BottleneckBlock" in n and n.endswith("s_add_0") for n in names)
    s_aifi = float(np.asarray(names["encoder/s_aifi_0"]))
    assert s_aifi > 0 and s_aifi != 1.0
    enc_souts = [v for n, v in names.items()
                 if n.startswith("encoder/") and n.endswith("s_out")]
    assert enc_souts and all(float(np.asarray(v)) != 1.0 for v in enc_souts)


def test_calibration_accumulates_max():
    """qcal absmax is the max over *all* calibration batches."""
    m = ConvBNAct(8, 1, act=False)
    rng = np.random.default_rng(2)
    x1 = jnp.asarray(rng.standard_normal((1, 4, 4, 4)).astype(np.float32))
    x2 = 10.0 * x1
    variables = m.init(jax.random.PRNGKey(0), x1, train=False)
    qc_small = Q.calibrate(m, variables, [x1])
    qc_both = Q.calibrate(m, variables, [x1, x2])
    a1 = float(np.asarray(qc_small["out_absmax"]))
    a2 = float(np.asarray(qc_both["out_absmax"]))
    assert a2 == pytest.approx(10.0 * a1, rel=1e-5)


def test_calibration_avgmax_damps_outlier_batch():
    """avgmax = mean of per-batch absmax: an outlier batch moves the scale
    by its share of the average instead of capturing it outright, and the
    result is never above the absmax scale (finer or equal resolution)."""
    m = ConvBNAct(8, 1, act=False)
    rng = np.random.default_rng(2)
    x1 = jnp.asarray(rng.standard_normal((1, 4, 4, 4)).astype(np.float32))
    x2 = 10.0 * x1
    variables = m.init(jax.random.PRNGKey(0), x1, train=False)
    a_abs = float(np.asarray(Q.calibrate(m, variables, [x1, x2])["out_absmax"]))
    a_avg = float(np.asarray(
        Q.calibrate(m, variables, [x1, x2], mode="avgmax")["out_absmax"]
    ))
    a_1 = float(np.asarray(Q.calibrate(m, variables, [x1])["out_absmax"]))
    assert a_avg == pytest.approx((a_1 + 10.0 * a_1) / 2.0, rel=1e-5)
    assert a_avg <= a_abs
    with pytest.raises(ValueError):
        Q.calibrate(m, variables, [x1], mode="p999")


def test_quantize_detector_avgmax_end_to_end():
    """The avgmax tree feeds build_quant_variables and the int8 forward
    still tracks the fp forward (same tolerance shape as absmax parity)."""
    h, w = 64, 96
    m = YoloDetector(num_classes=1, variant="n", dtype=jnp.float32)
    mq = YoloDetector(num_classes=1, variant="n", dtype=jnp.float32, int8=True)
    rng = np.random.default_rng(3)
    imgs = _rand_images(rng, 3, h, w)
    variables = m.init(jax.random.PRNGKey(0), imgs[0], train=False)
    qvars = Q.quantize_detector(m, mq, variables, imgs, mode="avgmax")
    out_fp = m.apply(variables, imgs[0], train=False)
    out_q = mq.apply(qvars, imgs[0], train=False)
    p_fp = jax.nn.sigmoid(out_fp["cls_logits"][..., 0])
    p_q = jax.nn.sigmoid(out_q["cls_logits"][..., 0])
    assert float(jnp.max(jnp.abs(p_fp - p_q))) < 0.15
    # score ordering preserved on the top anchor
    assert int(jnp.argmax(p_fp)) == int(jnp.argmax(p_q))


def test_bf16_epilogue_within_quant_noise(tiny_quantized, monkeypatch):
    """MMOE_I8_EPILOGUE=bf16 (dequant+SiLU computed in bf16, the serving
    perf variant — docs/performance.md round-4 epilogue study) must stay
    within int8 quantization noise of the exact fp32-epilogue path: the
    int8 output codes are 8-bit anyway, so a bf16 (8-bit mantissa)
    epilogue perturbs at most ~1 quant step."""
    m, mq, variables, qvars, imgs = tiny_quantized
    monkeypatch.setenv("MMOE_I8_EPILOGUE", "silu")
    ref = jax.jit(lambda v, x: mq.apply(v, x, train=False))(qvars, imgs[0])
    ref = jax.tree.map(np.asarray, ref)  # materialize before the env flips
    monkeypatch.setenv("MMOE_I8_EPILOGUE", "bf16")
    alt = jax.jit(lambda v, x: mq.apply(v, x, train=False))(qvars, imgs[0])
    for key in ("boxes", "cls_logits"):
        a, b = np.asarray(ref[key]), np.asarray(alt[key])
        denom = max(np.abs(a).max(), 1e-6)
        assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.995, key
        assert np.abs(a - b).max() / denom < 0.08, key


def test_int8_fp_box_head(tiny_quantized):
    """--int8-fp-box serving twin: the DFL box branch runs fp off the
    dequantized neck features while cls stays int8. Invariants: (1) cls
    logits are bit-identical to the full-int8 model (same int8 path, same
    quant leaves); (2) box outputs move TOWARD the fp model (the branch's
    own rounding is gone); (3) the full-int8 quant npz serves the fp-box
    model unchanged (superset — fp branch reads params/batch_stats)."""
    m, mq, variables, qvars, imgs = tiny_quantized
    m_fpbox = YoloDetector(
        num_classes=1, variant="n", dtype=jnp.float32, int8=True,
        int8_fp_box=True,
    )
    serving = Q.merge_serving_variables(qvars, variables)

    out_fp = m.apply(variables, imgs[0], train=False)
    out_q = mq.apply(qvars, imgs[0], train=False)
    out_h = m_fpbox.apply(serving, imgs[0], train=False)

    np.testing.assert_array_equal(
        np.asarray(out_h["cls_logits"]), np.asarray(out_q["cls_logits"])
    )
    box_fp = np.asarray(out_fp["boxes"]).ravel()
    err_full = np.abs(np.asarray(out_q["boxes"]).ravel() - box_fp).mean()
    err_fpbox = np.abs(np.asarray(out_h["boxes"]).ravel() - box_fp).mean()
    assert np.isfinite(err_fpbox)
    assert err_fpbox < err_full
