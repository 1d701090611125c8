"""TPU compute primitives: box ops, batched NMS, COCO mAP, preprocessing,
MoE routing kernels, deformable attention."""
