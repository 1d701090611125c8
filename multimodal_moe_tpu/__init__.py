"""multimodal-MoE TPU — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of scaleoutsystems/multimodal-MoE.

Layer map (mirrors the reference's 4-layer pipeline, SURVEY.md §1):

    paths      — env-overridable path registry            (ref: src/paths.py)
    data       — canonical parquet index, bbox math, splits, exporters,
                 high-throughput input pipeline            (ref: src/data/)
    ops        — TPU compute primitives: fused preprocessing, box ops,
                 batched NMS, COCO mAP, MoE + deformable-attention kernels
    models     — Flax detectors: YOLO family, RT-DETR, context-routed MoE,
                 ResNet baselines                          (ref: src/models/vision/)
    losses     — TAL assigner + YOLO losses, Hungarian matcher + DETR losses
    train      — optax/orbax train loop, evaluator, artifact schema writers
    parallel   — device mesh, sharding rules, expert parallelism

Unlike the reference — which delegates all device compute to Ultralytics /
RT-DETRv2 CUDA third parties (ref: src/models/vision/yolo.py:55,
rtdetr_thirdparty.py:122-129) — every detector, kernel, and the input
pipeline here is first-party and TPU-first.
"""

__version__ = "0.1.0"
