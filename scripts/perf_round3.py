#!/usr/bin/env python3
"""Round-3 on-chip perf session: one process, sequential sections, one JSON
line per measurement (stdout), methodology per docs/performance.md (params
as jit args, scalar-checksum fetch barriers, best-of-N trials).

Sections (select with argv, default all):
  yolo     — B128 fwd+NMS serving config; exact vs approx top-k preselect
  int8     — int8 PTQ serving vs bf16 at B64/128/192 (quant.py)
  moei8    — MoE-YOLO serving A/B: bf16 vs int8 trunk + w8a8 expert sweep
  latency  — single-request serving latency p50/p95 at B1-16, bf16 vs int8
  batches  — RT-DETR fwd and MoE-YOLO fwd/train batch-scaling tables
  rtdetri8 — RT-DETR serving ladder: fp32 / bf16 / int8-backbone × each
  gmm      — sweep/sparse/gmm fwd+bwd at E=32/64 with wider d (gmm's fate)
  trace    — xplane trace of YOLO B64 fwd+NMS (writes trace dir for offline
             per-op stall analysis)

Single-client discipline: run this alone on the tunnel (see memory:
axon-tunnel-wedge-recovery).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from _common import PROJECT_ROOT  # noqa: F401,E402

import numpy as np  # noqa: E402

H, W = 704, 1248


def out(section: str, **kv):
    print(json.dumps({"section": section, **kv}), flush=True)


def timed_scalar(fn, *args, reps=4, trials=3):
    """Seconds/call; fn returns a scalar whose host fetch is the barrier."""
    float(np.asarray(fn(*args)))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(*args)
        float(np.asarray(r))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def section_yolo(jax, jnp):
    from multimodal_moe_tpu.models.yolo import YoloDetector
    from multimodal_moe_tpu.ops.nms import batched_nms

    model = YoloDetector(num_classes=1, variant="s", dtype=jnp.bfloat16)
    variables = jax.jit(lambda r: model.init(r, jnp.zeros((1, H, W, 3)), train=False))(
        jax.random.PRNGKey(0)
    )

    def make(batch, pool, mode):
        def fn(v, img):
            o = model.apply(v, img.astype(jnp.float32) / 255.0, train=False)
            n = batched_nms(
                o["boxes"], jax.nn.sigmoid(o["cls_logits"][..., 0]),
                iou_threshold=0.7, score_threshold=0.001, max_det=300,
                num_candidates=pool, topk_mode=mode,
            )
            return n.valid.sum()
        return jax.jit(fn), jnp.zeros((batch, H, W, 3), jnp.uint8)

    for batch, pool, mode in [
        (128, 1024, "exact"),
        (128, 512, "exact"),
        (128, 512, "approx"),
        (128, 1024, "approx"),
        (64, 512, "approx"),
    ]:
        fn, img = make(batch, pool, mode)
        s = timed_scalar(fn, variables, img, reps=4)
        out("yolo", batch=batch, pool=pool, topk=mode,
            ms_call=round(s * 1e3, 1), img_s=round(batch / s, 1))
        del fn, img


def section_int8(jax, jnp):
    """int8 PTQ serving (w8a8, quant.py) vs bf16 at serving batches."""
    from multimodal_moe_tpu import quant as qz
    from multimodal_moe_tpu.models.yolo import YoloDetector
    from multimodal_moe_tpu.ops.nms import batched_nms

    model = YoloDetector(num_classes=1, variant="s", dtype=jnp.bfloat16)
    variables = jax.jit(lambda r: model.init(r, jnp.zeros((1, H, W, 3)), train=False))(
        jax.random.PRNGKey(0)
    )
    model_i8 = YoloDetector(num_classes=1, variant="s", int8=True)
    rng = np.random.default_rng(0)
    calib = [jnp.asarray(rng.random((2, H, W, 3), np.float32))]
    qvars = qz.quantize_detector(model, model_i8, variables, calib)

    def make(m, v, batch, pool):
        def fn(v, img):
            o = m.apply(v, img.astype(jnp.float32) / 255.0, train=False)
            n = batched_nms(
                o["boxes"], jax.nn.sigmoid(o["cls_logits"][..., 0]),
                iou_threshold=0.7, score_threshold=0.001, max_det=300,
                num_candidates=pool,
            )
            return n.valid.sum()
        return jax.jit(fn), jnp.zeros((batch, H, W, 3), jnp.uint8)

    for batch in (64, 128, 192):
        for name, m, v in (("bf16", model, variables), ("int8", model_i8, qvars)):
            try:
                fn, img = make(m, v, batch, 512)
                s = timed_scalar(fn, v, img, reps=4)
                out("int8", mode=name, batch=batch,
                    ms_call=round(s * 1e3, 1), img_s=round(batch / s, 1))
                del fn, img
            except Exception as e:
                out("int8", mode=name, batch=batch, error=str(e)[:160])


def section_moei8(jax, jnp):
    """MoE-YOLO serving A/B: bf16 vs int8 trunk + w8a8 expert sweep
    (moe_apply_sweep_int8) at serving batches, fwd+NMS."""
    from multimodal_moe_tpu import quant as qz
    from multimodal_moe_tpu.models.moe_yolo import MoEYoloDetector
    from multimodal_moe_tpu.ops.nms import batched_nms

    kw = dict(num_classes=1, variant="s", num_experts=4, dispatch="sweep")
    model = MoEYoloDetector(**kw, dtype=jnp.bfloat16)
    ctx1 = jnp.zeros((1,), jnp.int32)
    variables = jax.jit(
        lambda r: model.init(r, jnp.zeros((1, H, W, 3)), train=False,
                             context_ids=ctx1)
    )(jax.random.PRNGKey(0))
    model_i8 = MoEYoloDetector(**kw, int8=True)
    rng = np.random.default_rng(0)
    calib = [jnp.asarray(rng.random((2, H, W, 3), np.float32))]
    qvars = qz.quantize_detector(
        model, model_i8, variables, calib, context_ids=jnp.zeros((2,), jnp.int32)
    )
    qmerged = qz.merge_serving_variables(qvars, variables)

    def make(m, batch, pool):
        def fn(v, img, ctx):
            o = m.apply(v, img.astype(jnp.float32) / 255.0, train=False,
                        context_ids=ctx)
            n = batched_nms(
                o["boxes"], jax.nn.sigmoid(o["cls_logits"][..., 0]),
                iou_threshold=0.7, score_threshold=0.001, max_det=300,
                num_candidates=pool,
            )
            return n.valid.sum()
        return (jax.jit(fn), jnp.zeros((batch, H, W, 3), jnp.uint8),
                jnp.zeros((batch,), jnp.int32))

    for batch in (64, 128):
        for name, m, v in (("bf16", model, variables), ("int8", model_i8, qmerged)):
            try:
                fn, img, ctx = make(m, batch, 512)
                s = timed_scalar(fn, v, img, ctx, reps=4)
                out("moei8", mode=name, batch=batch,
                    ms_call=round(s * 1e3, 1), img_s=round(batch / s, 1))
                del fn, img
            except Exception as e:
                out("moei8", mode=name, batch=batch, error=str(e)[:160])


def section_latency(jax, jnp, batches=(1, 2, 4, 8, 16), calls=40):
    """Serving latency (not throughput): per-call wall time at small batch,
    one request in flight, p50/p95 over 40 synced calls — the production
    serving metric the throughput tables hide. On this host the number
    includes the tunnel RTT floor (measure it via the reported b1 floor);
    on a local v5e host the device-side component is what remains."""
    from multimodal_moe_tpu import quant as qz
    from multimodal_moe_tpu.models.yolo import YoloDetector
    from multimodal_moe_tpu.ops.nms import batched_nms

    model = YoloDetector(num_classes=1, variant="s", dtype=jnp.bfloat16)
    variables = jax.jit(lambda r: model.init(r, jnp.zeros((1, H, W, 3)), train=False))(
        jax.random.PRNGKey(0)
    )
    model_i8 = YoloDetector(num_classes=1, variant="s", int8=True)
    rng = np.random.default_rng(0)
    qvars = qz.quantize_detector(
        model, model_i8, variables,
        [jnp.asarray(rng.random((2, H, W, 3), np.float32))],
    )

    def make(m, batch):
        def fn(v, img):
            o = m.apply(v, img.astype(jnp.float32) / 255.0, train=False)
            n = batched_nms(
                o["boxes"], jax.nn.sigmoid(o["cls_logits"][..., 0]),
                iou_threshold=0.7, score_threshold=0.001, max_det=300,
                num_candidates=512,
            )
            return n.valid.sum()
        return jax.jit(fn), jnp.zeros((batch, H, W, 3), jnp.uint8)

    for name, m, v in (("bf16", model, variables), ("int8", model_i8, qvars)):
        for batch in batches:
            try:
                fn, img = make(m, batch)
                float(np.asarray(fn(v, img)))  # compile
                lat = []
                for _ in range(calls):
                    t0 = time.perf_counter()
                    float(np.asarray(fn(v, img)))  # full sync per call
                    lat.append(time.perf_counter() - t0)
                lat.sort()
                out("latency", mode=name, batch=batch,
                    p50_ms=round(lat[len(lat) // 2] * 1e3, 2),
                    p95_ms=round(lat[int(len(lat) * 0.95)] * 1e3, 2),
                    min_ms=round(lat[0] * 1e3, 2))
                del fn, img
            except Exception as e:
                out("latency", mode=name, batch=batch, error=str(e)[:160])


def section_batches(jax, jnp):
    from multimodal_moe_tpu.models.moe_yolo import MoEYoloDetector
    from multimodal_moe_tpu.models.rtdetr import RTDETRDetector
    from multimodal_moe_tpu.ops.nms import batched_nms

    rt = RTDETRDetector(num_classes=1)
    rv = jax.jit(lambda r: rt.init(r, jnp.zeros((1, H, W, 3)), train=False))(
        jax.random.PRNGKey(0)
    )

    def rt_fwd(v, img):
        o = rt.apply(v, img.astype(jnp.float32) / 255.0, train=False)
        return o["cls_logits"].sum()

    rt_j = jax.jit(rt_fwd)
    for b in (4, 8, 16, 32, 64):
        try:
            img = jnp.zeros((b, H, W, 3), jnp.uint8)
            s = timed_scalar(rt_j, rv, img, reps=4)
            out("batches", family="rtdetr_fwd", batch=b,
                ms_call=round(s * 1e3, 1), img_s=round(b / s, 1))
            del img
        except Exception as e:
            out("batches", family="rtdetr_fwd", batch=b, error=str(e)[:120])
            break
    del rv, rt_j

    moe = MoEYoloDetector(num_classes=1, variant="s", num_experts=4)
    mv = jax.jit(lambda r: moe.init(r, jnp.zeros((1, H, W, 3)), train=False))(
        jax.random.PRNGKey(0)
    )

    def moe_fwd(v, img, ctx):
        o = moe.apply(v, img.astype(jnp.float32) / 255.0, train=False,
                      context_ids=ctx)
        n = batched_nms(
            o["boxes"], jax.nn.sigmoid(o["cls_logits"][..., 0]),
            iou_threshold=0.7, score_threshold=0.001, max_det=300,
        )
        return n.valid.sum()

    moe_j = jax.jit(moe_fwd)
    for b in (8, 16, 32, 64, 128):
        try:
            img = jnp.zeros((b, H, W, 3), jnp.uint8)
            ctx = jnp.zeros((b,), jnp.int32)
            s = timed_scalar(moe_j, mv, img, ctx, reps=4)
            out("batches", family="moe_yolo_fwd_nms", batch=b,
                ms_call=round(s * 1e3, 1), img_s=round(b / s, 1))
            del img, ctx
        except Exception as e:
            out("batches", family="moe_yolo_fwd_nms", batch=b, error=str(e)[:120])
            break


def section_gmm(jax, jnp):
    """sweep vs sparse vs gmm fwd+bwd at larger E and d (VERDICT r2 #7)."""
    from multimodal_moe_tpu.models.moe import (
        moe_apply_gmm, moe_apply_sparse, moe_apply_sweep,
        route_top_k_dropless, route_top_k_sparse,
    )

    T, K = 55296, 2  # MoE-YOLO P3 tokens at B4; d sweeps below
    for d, e in [(128, 32), (128, 64), (256, 32), (256, 64)]:
        h = 2 * d
        rng = np.random.default_rng(0)
        tokens = jnp.asarray(rng.normal(size=(T, d)).astype(np.float32)).astype(jnp.bfloat16)
        logits = jnp.asarray(rng.normal(size=(T, e)).astype(np.float32))
        w1 = jnp.asarray(rng.normal(size=(e, d, h)).astype(np.float32) * 0.02)
        b1 = jnp.zeros((e, 1, h))
        w2 = jnp.asarray(rng.normal(size=(e, h, d)).astype(np.float32) * 0.02)
        b2 = jnp.zeros((e, 1, d))

        def make(mode):
            def f(tokens, logits, w1, b1, w2, b2):
                if mode == "sparse":
                    cap = max(int(T * K * 1.25 / e), K)
                    rd = route_top_k_sparse(logits, k=K, capacity=cap)
                    y = moe_apply_sparse(tokens, rd, w1, b1, w2, b2, capacity=cap)
                else:
                    idx, gates, aux, load = route_top_k_dropless(logits, k=K)
                    apply = moe_apply_sweep if mode == "sweep" else moe_apply_gmm
                    y = apply(tokens, idx, gates, w1, b1, w2, b2)
                return jnp.sum(y.astype(jnp.float32) ** 2)

            grad = jax.grad(f, argnums=(0, 2, 4))

            def fb(*a):
                g = grad(*a)
                return sum(jnp.sum(x.astype(jnp.float32)) for x in g)

            return jax.jit(fb)

        for mode in ("sweep", "sparse", "gmm"):
            try:
                fn = make(mode)
                s = timed_scalar(fn, tokens, logits, w1, b1, w2, b2, reps=3)
                out("gmm", d=d, experts=e, mode=mode, fwd_bwd_ms=round(s * 1e3, 1))
                del fn
            except Exception as ex:
                out("gmm", d=d, experts=e, mode=mode, error=str(ex)[:120])
        del tokens, logits, w1, b1, w2, b2


def section_serving(jax, jnp):
    """Decode-after-top-k serving tail vs the full-decode path (serving.py),
    bf16 and int8, B128 pool 512; plus the early-exit NMS variant (expected
    neutral on random weights — its win is survivor-count-dependent)."""
    from multimodal_moe_tpu import quant as qz
    from multimodal_moe_tpu.models.yolo import YoloDetector
    from multimodal_moe_tpu.ops.nms import batched_nms
    from multimodal_moe_tpu.serving import yolo_serving_nms

    model = YoloDetector(num_classes=1, variant="s", dtype=jnp.bfloat16)
    variables = jax.jit(lambda r: model.init(r, jnp.zeros((1, H, W, 3)), train=False))(
        jax.random.PRNGKey(0)
    )
    model_i8 = YoloDetector(num_classes=1, variant="s", int8=True)
    rng = np.random.default_rng(0)
    calib = [jnp.asarray(rng.random((2, H, W, 3), np.float32))]
    qvars = qz.quantize_detector(model, model_i8, variables, calib)

    def make(m, tail, early):
        def fn(v, img):
            o = m.apply(v, img.astype(jnp.float32) / 255.0, train=False)
            if tail == "topk":
                n = yolo_serving_nms(o, k=512, early_exit=early)
            else:
                n = batched_nms(
                    o["boxes"], jax.nn.sigmoid(o["cls_logits"][..., 0]),
                    iou_threshold=0.7, score_threshold=0.001, max_det=300,
                    num_candidates=512, early_exit=early,
                )
            return n.valid.sum()
        return jax.jit(fn)

    img = jnp.zeros((128, H, W, 3), jnp.uint8)
    for name, m, v in (("bf16", model, variables), ("int8", model_i8, qvars)):
        for tail, early in (("full", False), ("topk", False), ("topk", True)):
            try:
                fn = make(m, tail, early)
                s = timed_scalar(fn, v, img, reps=4)
                out("serving", mode=name, tail=tail, early_exit=early,
                    ms_call=round(s * 1e3, 1), img_s=round(128 / s, 1))
                del fn
            except Exception as e:
                out("serving", mode=name, tail=tail, early_exit=early,
                    error=str(e)[:160])


def section_deform(jax, jnp):
    """Deformable-attention kernel microbench at protocol level shapes
    ((88,156),(44,78),(22,39), NH=8, D=32, P=4): fwd and fwd+bwd ms/layer.
    Banked round-2 baselines (two-slice slab layout): 7.2 ms fwd /
    12.5 ms fwd+bwd at B4/Q500; round-4 interleaved-slab fwd measured here."""
    from multimodal_moe_tpu.ops.deformable_pallas import (
        ms_deformable_attention_pallas,
    )

    shapes = ((88, 156), (44, 78), (22, 39))
    total = sum(h * w for h, w in shapes)
    nh, d, l, p = 8, 32, 3, 4
    rng = np.random.default_rng(0)

    for b, q, tag in ((4, 500, "train_shape"), (16, 300, "serve_b16"),
                      (64, 300, "serve_b64")):
        values = jnp.asarray(rng.normal(0, 1, (b, total, nh, d)).astype(np.float32))
        loc = jnp.asarray(rng.uniform(0, 1, (b, q, nh, l, p, 2)).astype(np.float32))
        attn = jax.nn.softmax(
            jnp.asarray(rng.normal(0, 1, (b, q, nh, l * p)).astype(np.float32)), -1
        ).reshape(b, q, nh, l, p)

        fwd = jax.jit(
            lambda v, lo, a: ms_deformable_attention_pallas(v, shapes, lo, a).sum()
        )
        s = timed_scalar(fwd, values, loc, attn, reps=8)
        out("deform", config=tag, batch=b, queries=q, what="fwd",
            ms_layer=round(s * 1e3, 2))

        if tag == "train_shape":
            grad = jax.jit(
                jax.grad(
                    lambda v, lo, a: (
                        ms_deformable_attention_pallas(v, shapes, lo, a) ** 2
                    ).sum(),
                    argnums=(0, 1, 2),
                )
            )
            gfn = lambda v, lo, a: grad(v, lo, a)[0].sum()
            s = timed_scalar(gfn, values, loc, attn, reps=4)
            out("deform", config=tag, batch=b, queries=q, what="fwd_bwd",
                ms_layer=round(s * 1e3, 2))
        del values, loc, attn


def section_rtdetri8(jax, jnp):
    """RT-DETR serving dtype/quant ladder: fp32 (the banked baseline
    config — train/eval construct the model at the default dtype), bf16
    encoder/decoder, int8 backbone (quant.py) under each — the two serving
    levers for the slowest family."""
    from multimodal_moe_tpu import quant as qz
    from multimodal_moe_tpu.models.rtdetr import RTDETRDetector

    m_fp = RTDETRDetector(num_classes=1)
    v_fp = jax.jit(lambda r: m_fp.init(r, jnp.zeros((1, H, W, 3)), train=False))(
        jax.random.PRNGKey(0)
    )
    rng = np.random.default_rng(0)
    calib = [jnp.asarray(rng.random((2, H, W, 3), np.float32))]
    qmerged = None

    for name, dt, int8 in (
        ("fp32", jnp.float32, False),
        ("bf16", jnp.bfloat16, False),
        ("i8_fp32", jnp.float32, True),
        ("i8_bf16", jnp.bfloat16, True),
    ):
        try:
            m = RTDETRDetector(num_classes=1, dtype=dt, int8=int8)
            if int8:
                if qmerged is None:
                    qvars = qz.quantize_detector(m_fp, m, v_fp, calib)
                    qmerged = qz.merge_serving_variables(qvars, v_fp)
                v = qmerged
            else:
                v = v_fp

            def fn(v, img, m=m):
                o = m.apply(v, img.astype(jnp.float32) / 255.0, train=False)
                return o["cls_logits"].astype(jnp.float32).sum()

            fn_j = jax.jit(fn)
            for b in (16, 64):
                img = jnp.zeros((b, H, W, 3), jnp.uint8)
                s = timed_scalar(fn_j, v, img, reps=4)
                out("rtdetri8", mode=name, batch=b,
                    ms_call=round(s * 1e3, 1), img_s=round(b / s, 1))
                del img
            del fn_j, m
        except Exception as e:
            out("rtdetri8", mode=name, error=str(e)[:160])


def section_tracei8(jax, jnp):
    """xplane trace of the int8 B128 serving graph (topk tail) for offline
    per-op analysis (scripts/analyze_xplane.py) — where does the remaining
    87ms-class budget live after byte-halving."""
    from multimodal_moe_tpu import quant as qz
    from multimodal_moe_tpu.models.yolo import YoloDetector
    from multimodal_moe_tpu.serving import yolo_serving_nms

    model = YoloDetector(num_classes=1, variant="s", dtype=jnp.bfloat16)
    variables = jax.jit(lambda r: model.init(r, jnp.zeros((1, H, W, 3)), train=False))(
        jax.random.PRNGKey(0)
    )
    model_i8 = YoloDetector(num_classes=1, variant="s", int8=True)
    rng = np.random.default_rng(0)
    calib = [jnp.asarray(rng.random((2, H, W, 3), np.float32))]
    qvars = qz.quantize_detector(model, model_i8, variables, calib)

    @jax.jit
    def fn(v, img):
        o = model_i8.apply(v, img.astype(jnp.float32) / 255.0, train=False)
        return yolo_serving_nms(o, k=512).valid.sum()

    img = jnp.zeros((128, H, W, 3), jnp.uint8)
    float(np.asarray(fn(qvars, img)))  # compile+warm
    trace_dir = "/tmp/xplane_yolo_i8_b128"
    jax.profiler.start_trace(trace_dir)
    for _ in range(4):
        r = fn(qvars, img)
    float(np.asarray(r))
    jax.profiler.stop_trace()
    out("tracei8", trace_dir=trace_dir)


def section_epi(jax, jnp):
    """int8 conv-epilogue microbench (round-4): one representative
    ConvBNAct-shaped int8 conv (3x3 128->128 at P3 spatial, B=32) per
    epilogue variant. The tracei8 trace put 55.5/84.8 ms inside
    conv+epilogue fusions (at B128); this isolates how much of a fusion is
    the VPU epilogue without paying a full-model compile per variant."""
    import os as _os

    from jax import lax

    B, h, w, c = 32, 88, 156, 128
    rng = np.random.default_rng(0)
    xq = jnp.asarray(rng.integers(-127, 127, (B, h, w, c)).astype(np.int8))
    wq = jnp.asarray(rng.integers(-127, 127, (3, 3, c, c)).astype(np.int8))
    scale = jnp.asarray(rng.random(c).astype(np.float32) * 1e-3)
    bias = jnp.asarray(rng.random(c).astype(np.float32))
    s_out = jnp.float32(0.05)

    from multimodal_moe_tpu.models.layers import apply_i8_epilogue

    def make(mode, depth=8):
        def fn(xq, wq, scale, bias, s_out):
            _os.environ["MMOE_I8_EPILOGUE"] = mode
            q = xq
            for _ in range(depth):  # chain so the fusion dominates dispatch
                y32 = lax.conv_general_dilated(
                    q, wq, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32,
                )
                q = apply_i8_epilogue(y32, scale, bias, True, s_out)
            return q.astype(jnp.int32).sum()

        return jax.jit(fn)

    # MXU-only bound: conv chain with a cast-to-int8 epilogue (no scale/act).
    def conv_only(xq, wq, scale, bias, s_out):
        q = xq
        for _ in range(8):
            y32 = lax.conv_general_dilated(
                q, wq, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            q = jnp.clip(y32 // 1024, -127, 127).astype(jnp.int8)
        return q.astype(jnp.int32).sum()

    gflop = 2 * B * h * w * c * c * 9 * 8 / 1e9
    s = timed_scalar(jax.jit(conv_only), xq, wq, scale, bias, s_out, reps=4)
    out("epi", mode="conv_intdiv", ms=round(s * 1e3, 2),
        tops=round(gflop / s / 1e3, 1))
    # make() mutates MMOE_I8_EPILOGUE at trace time — restore afterwards so
    # later sections in the same process trace the default epilogue.
    _prev = _os.environ.get("MMOE_I8_EPILOGUE")
    try:
        for mode in ("silu", "bf16", "hswish", "linear"):
            s = timed_scalar(make(mode), xq, wq, scale, bias, s_out, reps=4)
            out("epi", mode=mode, ms=round(s * 1e3, 2), tops=round(gflop / s / 1e3, 1))
    finally:
        if _prev is None:
            _os.environ.pop("MMOE_I8_EPILOGUE", None)
        else:
            _os.environ["MMOE_I8_EPILOGUE"] = _prev

    # Raw MXU rate probes: where does the int8 ceiling actually sit on this
    # chip/runtime? s8 vs bf16, matmul vs conv.
    M = K = N = 8192
    a8 = jnp.asarray(rng.integers(-127, 127, (M, K)).astype(np.int8))
    b8 = jnp.asarray(rng.integers(-127, 127, (K, N)).astype(np.int8))
    abf = a8.astype(jnp.bfloat16)
    bbf = b8.astype(jnp.bfloat16)
    mm_gflop = 2 * M * K * N / 1e9

    @jax.jit
    def mm_s8(a, b):
        y = jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return (y // 65536).astype(jnp.int32).sum()

    @jax.jit
    def mm_bf16(a, b):
        y = jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return y.sum()

    s = timed_scalar(mm_s8, a8, b8, reps=4)
    out("epi", mode="matmul_s8_8k", ms=round(s * 1e3, 2),
        tops=round(mm_gflop / s / 1e3, 1))
    s = timed_scalar(mm_bf16, abf, bbf, reps=4)
    out("epi", mode="matmul_bf16_8k", ms=round(s * 1e3, 2),
        tops=round(mm_gflop / s / 1e3, 1))

    # Same conv chain in bf16 (is s8 conv actually faster than bf16 conv?).
    xb = xq.astype(jnp.bfloat16)
    wb = wq.astype(jnp.bfloat16)

    @jax.jit
    def conv_bf16(x, w):
        y = x
        for _ in range(8):
            y = lax.conv_general_dilated(
                y, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
            y = (y * 1e-3).astype(jnp.bfloat16)
        return y.astype(jnp.float32).sum()

    s = timed_scalar(conv_bf16, xb, wb, reps=4)
    out("epi", mode="conv_bf16", ms=round(s * 1e3, 2),
        tops=round(gflop / s / 1e3, 1))

    # Wider-channel s8 conv (256ch at P4 spatial): does MXU efficiency rise?
    c2 = 256
    xq2 = jnp.asarray(rng.integers(-127, 127, (B, 44, 78, c2)).astype(np.int8))
    wq2 = jnp.asarray(rng.integers(-127, 127, (3, 3, c2, c2)).astype(np.int8))

    @jax.jit
    def conv_s8_256(x, w):
        q = x
        for _ in range(8):
            y32 = lax.conv_general_dilated(
                q, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            q = jnp.clip(y32 // 1024, -127, 127).astype(jnp.int8)
        return q.astype(jnp.int32).sum()

    gflop2 = 2 * B * 44 * 78 * c2 * c2 * 9 * 8 / 1e9
    s = timed_scalar(conv_s8_256, xq2, wq2, reps=4)
    out("epi", mode="conv_s8_256ch", ms=round(s * 1e3, 2),
        tops=round(gflop2 / s / 1e3, 1))


def section_epifull(jax, jnp):
    """Full int8 B128 serving graph per epilogue variant (compile-heavy;
    run after `epi` picks the winner). Also times forward-only (no NMS) to
    size the serving tail."""
    import os as _os

    from multimodal_moe_tpu import quant as qz
    from multimodal_moe_tpu.models.yolo import YoloDetector
    from multimodal_moe_tpu.ops.nms import batched_nms

    model = YoloDetector(num_classes=1, variant="s", dtype=jnp.bfloat16)
    variables = jax.jit(lambda r: model.init(r, jnp.zeros((1, H, W, 3)), train=False))(
        jax.random.PRNGKey(0)
    )
    model_i8 = YoloDetector(num_classes=1, variant="s", int8=True)
    rng = np.random.default_rng(0)
    calib = [jnp.asarray(rng.random((2, H, W, 3), np.float32))]
    qvars = qz.quantize_detector(model, model_i8, variables, calib)
    img = jnp.zeros((128, H, W, 3), jnp.uint8)

    # Only known epilogue modes count as mode args (main() dispatches every
    # argv token as a section, so stray tokens must not be misread as modes
    # — an unknown string would silently fall through to the silu branch in
    # apply_i8_epilogue while the row claims a different mode).
    _KNOWN = ("silu", "bf16", "hswish", "linear")
    modes = [a for a in sys.argv[2:] if a in _KNOWN] or ["silu", "bf16"]

    def make(mode, with_nms):
        def fn(v, im):
            _os.environ["MMOE_I8_EPILOGUE"] = mode
            o = model_i8.apply(v, im.astype(jnp.float32) / 255.0, train=False)
            if not with_nms:
                return o["cls_logits"].sum() + o["boxes"].sum()
            return batched_nms(
                o["boxes"], jax.nn.sigmoid(o["cls_logits"][..., 0]),
                iou_threshold=0.7, score_threshold=0.001, max_det=300,
                num_candidates=512,
            ).valid.sum()

        return jax.jit(fn)

    # make() mutates MMOE_I8_EPILOGUE at trace time — restore afterwards so
    # later sections in the same process trace the default epilogue.
    _prev = _os.environ.get("MMOE_I8_EPILOGUE")
    try:
        for mode in modes:
            s = timed_scalar(make(mode, True), qvars, img, reps=4)
            out("epifull", mode=mode, nms=True, ms=round(s * 1e3, 1),
                img_s=round(128 / s, 1))
        s = timed_scalar(make(modes[0], False), qvars, img, reps=4)
        out("epifull", mode=modes[0], nms=False, ms=round(s * 1e3, 1),
            img_s=round(128 / s, 1))
    finally:
        if _prev is None:
            _os.environ.pop("MMOE_I8_EPILOGUE", None)
        else:
            _os.environ["MMOE_I8_EPILOGUE"] = _prev


def section_trace(jax, jnp):
    from multimodal_moe_tpu.models.yolo import YoloDetector
    from multimodal_moe_tpu.ops.nms import batched_nms

    model = YoloDetector(num_classes=1, variant="s", dtype=jnp.bfloat16)
    variables = jax.jit(lambda r: model.init(r, jnp.zeros((1, H, W, 3)), train=False))(
        jax.random.PRNGKey(0)
    )

    @jax.jit
    def fn(v, img):
        o = model.apply(v, img.astype(jnp.float32) / 255.0, train=False)
        n = batched_nms(
            o["boxes"], jax.nn.sigmoid(o["cls_logits"][..., 0]),
            iou_threshold=0.7, score_threshold=0.001, max_det=300,
            num_candidates=512,
        )
        return n.valid.sum()

    img = jnp.zeros((64, H, W, 3), jnp.uint8)
    float(np.asarray(fn(variables, img)))  # compile+warm
    trace_dir = "/tmp/xplane_yolo_b64"
    jax.profiler.start_trace(trace_dir)
    for _ in range(6):
        r = fn(variables, img)
    float(np.asarray(r))
    jax.profiler.stop_trace()
    out("trace", trace_dir=trace_dir)


def section_fpbox(jax, jnp):
    """Serving-rate cost of --int8-fp-box (round 5, VERDICT r4 #4): the
    B128 int8 serving graph with the DFL box-regression branch kept fp
    (YoloDetector.int8_fp_box) vs the full-int8 graph, both on the default
    bf16 epilogue. The accuracy side of the A/B lives in
    outputs/eval/yolo/yolo_s_hard_e50_704_int8fpbox*/."""
    from multimodal_moe_tpu import quant as qz
    from multimodal_moe_tpu.models.yolo import YoloDetector
    from multimodal_moe_tpu.ops.nms import batched_nms

    model = YoloDetector(num_classes=1, variant="s", dtype=jnp.bfloat16)
    variables = jax.jit(lambda r: model.init(r, jnp.zeros((1, H, W, 3)), train=False))(
        jax.random.PRNGKey(0)
    )
    rng = np.random.default_rng(0)
    calib = [jnp.asarray(rng.random((2, H, W, 3), np.float32))]
    img = jnp.zeros((128, H, W, 3), jnp.uint8)

    # Calibrate/quantize ONCE against the full int8 model (the same
    # superset npz the eval CLI caches); fp_box only changes apply-time.
    model_full = YoloDetector(num_classes=1, variant="s", int8=True)
    qvars = qz.quantize_detector(model, model_full, variables, calib)

    for fp_box in (False, True):
        if fp_box:
            model_i8 = YoloDetector(
                num_classes=1, variant="s", int8=True, int8_fp_box=True
            )
            # fp box branch keeps reading 'params' beside the quant tree
            # (same assembly as eval_detector --int8-fp-box).
            vars_i8 = qz.merge_serving_variables(qvars, variables)
        else:
            model_i8, vars_i8 = model_full, qvars

        def fn(v, im):
            o = model_i8.apply(v, im.astype(jnp.float32) / 255.0, train=False)
            return batched_nms(
                o["boxes"], jax.nn.sigmoid(o["cls_logits"][..., 0]),
                iou_threshold=0.7, score_threshold=0.001, max_det=300,
                num_candidates=512,
            ).valid.sum()

        s = timed_scalar(jax.jit(fn), vars_i8, img, reps=4)
        out("fpbox", fp_box=fp_box, ms=round(s * 1e3, 1),
            img_s=round(128 / s, 1))


def section_mxu2(jax, jnp):
    """Dispatch-amortized MXU rate probe (round 5).

    The round-4 single-matmul probe (section_epi tail) reported 91.5 TF/s
    bf16 / 117.8 TOPS s8 at 8k³ — but the full YOLO-s serving graph itself
    sustains ~104 TF/s bf16 through its convs, which is impossible if 91.5
    were the ceiling, so that probe must be eating per-call overhead
    (queue/dispatch on the tunneled runtime). Here the matmul repeats
    inside ONE executable via lax.fori_loop (carry = the product, so every
    iteration is a fresh 8k³ matmul), leaving only the loop-carried output
    write between MXU bursts."""
    import numpy as np

    rng = np.random.default_rng(0)
    m = 8192
    iters = 16
    a = jnp.asarray(rng.normal(0, 1, (m, m)).astype(np.float32)).astype(jnp.bfloat16)
    b = jnp.asarray(rng.normal(0, 1, (m, m)).astype(np.float32)).astype(jnp.bfloat16)
    gflop = 2 * m * m * m / 1e9

    @jax.jit
    def chain_bf16(a, b):
        def body(_, y):
            # normalize the carry so the chain can't overflow to inf and
            # the compiler can't fold iterations together
            return (y @ b) * jnp.bfloat16(1.0 / m)

        return jax.lax.fori_loop(0, iters, body, a).astype(jnp.float32).sum()

    s = timed_scalar(chain_bf16, a, b, reps=2) / iters
    out("mxu2", mode="bf16_8k_chain", iters=iters, ms=round(s * 1e3, 3),
        tflops=round(gflop / s / 1e3, 1))

    a8 = jnp.asarray(rng.integers(-127, 127, (m, m)).astype(np.int8))
    b8 = jnp.asarray(rng.integers(-127, 127, (m, m)).astype(np.int8))

    @jax.jit
    def chain_s8(a, b):
        def body(_, y):
            y32 = jax.lax.dot_general(
                y, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            # requant epilogue (shift+clamp+convert) — the realistic s8
            # inter-layer cost
            return jnp.clip(y32 >> 7, -127, 127).astype(jnp.int8)

        return jax.lax.fori_loop(0, iters, body, a).astype(jnp.int32).sum()

    s = timed_scalar(chain_s8, a8, b8, reps=2) / iters
    out("mxu2", mode="s8_8k_chain", iters=iters, ms=round(s * 1e3, 3),
        tops=round(gflop / s / 1e3, 1))

    # Conv variant at detector-like shape: NHWC (8, 88, 156, 256)->256 3x3,
    # chained the same way.
    x = jnp.asarray(
        rng.normal(0, 0.5, (8, 88, 156, 256)).astype(np.float32)
    ).astype(jnp.bfloat16)
    w = jnp.asarray(
        rng.normal(0, 0.05, (3, 3, 256, 256)).astype(np.float32)
    ).astype(jnp.bfloat16)
    conv_gflop = 2 * 8 * 88 * 156 * 256 * 256 * 9 / 1e9

    @jax.jit
    def chain_conv(x, w):
        def body(_, y):
            y = jax.lax.conv_general_dilated(
                y, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return jnp.tanh(y)  # bounded epilogue keeps the chain finite

        return jax.lax.fori_loop(0, iters, body, x).astype(jnp.float32).sum()

    s = timed_scalar(chain_conv, x, w, reps=2) / iters
    out("mxu2", mode="bf16_conv_chain", iters=iters, ms=round(s * 1e3, 3),
        tflops=round(conv_gflop / s / 1e3, 1))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(Path("~/.cache/mmoe/xla_cache").expanduser()))
    import jax.numpy as jnp

    sections = sys.argv[1:] or ["yolo", "int8", "batches", "gmm", "trace"]
    out("meta", devices=str(jax.devices()), sections=sections)
    for s in sections:
        if f"section_{s}" not in globals():
            # Not a section — probably a mode argument consumed by
            # section_epifull (e.g. `perf_round3.py epifull hswish`).
            out("meta", skipped=s, reason="no such section (mode arg?)")
            continue
        t0 = time.perf_counter()
        try:
            globals()[f"section_{s}"](jax, jnp)
        except Exception as e:
            out(s, fatal=str(e)[:200])
        out("meta", done=s, wall_s=round(time.perf_counter() - t0, 1))


if __name__ == "__main__":
    main()
