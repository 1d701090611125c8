"""Tests for the tracing/profiling utilities."""

import time

import numpy as np

from multimodal_moe_tpu.utils.profiler import StageTimer, annotate, memory_stats, trace


class TestStageTimer:
    def test_accumulates_and_derives_speeds(self):
        t = StageTimer()
        for _ in range(4):
            with t.stage("preprocess"):
                time.sleep(0.01)
            with t.stage("inference"):
                time.sleep(0.02)
            t.add_images(2)
        speeds = t.speeds_ms_per_img()
        assert set(speeds) == {
            "speed_preprocess_ms_per_img",
            "speed_inference_ms_per_img",
        }
        # 4×10ms over 8 images ≈ 5 ms/img (loose bounds for CI noise)
        assert 3 < speeds["speed_preprocess_ms_per_img"] < 30
        assert speeds["speed_inference_ms_per_img"] > speeds["speed_preprocess_ms_per_img"]

    def test_zero_images_safe(self):
        t = StageTimer()
        with t.stage("x"):
            pass
        assert t.speeds_ms_per_img()["speed_x_ms_per_img"] >= 0


class TestTrace:
    def test_trace_writes_profile(self, tmp_path):
        import jax
        import jax.numpy as jnp

        with trace(tmp_path / "prof"):
            with annotate("matmul"):
                x = jnp.ones((64, 64))
                jax.block_until_ready(x @ x)
        files = list((tmp_path / "prof").rglob("*"))
        assert any(f.is_file() for f in files)  # xplane/trace artifacts exist

    def test_memory_stats_shape(self):
        stats = memory_stats()
        assert set(stats) == {"bytes_in_use", "peak_bytes_in_use", "bytes_limit"}
