"""Flax model zoo: YOLO family, RT-DETR, context-routed MoE, ResNet baselines."""
