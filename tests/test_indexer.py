"""End-to-end indexing pipeline tests over the synthetic ZOD tree
(behavior per ref: scripts/build_ZOD_index.py, scripts/add_bboxes.py)."""

import numpy as np
import pandas as pd
import pytest

from multimodal_moe_tpu.data.indexer import (
    add_xyxy_bboxes,
    find_front_dnat_image,
    normalize_multipoint_coords,
    occlusion_bucket,
    parse_pedestrian_annotations,
    ped_bin_4,
    resize_points_xy,
)


class TestHelpers:
    def test_ped_bin_4(self):
        assert [ped_bin_4(n) for n in (0, 1, 5, 6, 15, 16, 100)] == [0, 1, 1, 2, 2, 3, 3]

    def test_occlusion_bucket(self):
        assert occlusion_bucket(None) == "missing"
        assert occlusion_bucket("None") == "none"
        assert occlusion_bucket(" Light ") == "light"
        assert occlusion_bucket("VeryHeavy") == "veryheavy"
        assert occlusion_bucket("0.75") == "unknown"

    def test_normalize_multipoint_flat(self):
        pts = normalize_multipoint_coords([[1, 2], [3, 4]])
        assert pts == [[1.0, 2.0], [3.0, 4.0]]

    def test_normalize_multipoint_nested(self):
        pts = normalize_multipoint_coords([[[1, 2], [3, 4]]])
        assert pts == [[1.0, 2.0], [3.0, 4.0]]

    def test_normalize_multipoint_garbage(self):
        assert normalize_multipoint_coords(None) == []
        assert normalize_multipoint_coords("junk") == []
        assert normalize_multipoint_coords([[1], ["a", "b"]]) == []

    def test_resize_points(self):
        sx, sy = 1248 / 3848, 704 / 2168
        pts = resize_points_xy([[3848.0, 2168.0], [0.0, 0.0]], sx, sy)
        np.testing.assert_allclose(pts, [[1248.0, 704.0], [0.0, 0.0]], rtol=1e-5)

    def test_find_image_ambiguity_raises(self, tmp_path):
        cam = tmp_path / "camera_front_dnat"
        cam.mkdir()
        (cam / "a.jpg").write_bytes(b"x")
        (cam / "b.jpg").write_bytes(b"x")
        with pytest.raises(ValueError, match="exactly one"):
            find_front_dnat_image(tmp_path)

    def test_find_image_skips_resized(self, tmp_path):
        cam = tmp_path / "camera_front_dnat"
        cam.mkdir()
        (cam / "a.jpg").write_bytes(b"x")
        (cam / "a_resized.jpg").write_bytes(b"x")
        assert find_front_dnat_image(tmp_path).name == "a.jpg"


class TestAnnotationParsing:
    def test_parallel_array_invariant(self):
        """Per frame, points[i]/uuid[i]/unclear[i]/occlusion[i] describe the
        same pedestrian (ref: build_ZOD_index.py:246-295)."""
        anns = [
            {
                "properties": {
                    "class": "Pedestrian",
                    "unclear": False,
                    "occlusion_ratio": "Light",
                    "annotation_uuid": "u0",
                },
                "geometry": {"coordinates": [[0, 0], [10, 0], [10, 20], [0, 20]]},
            },
            # malformed geometry → counted but not in parallel arrays
            {
                "properties": {
                    "class": "Pedestrian",
                    "unclear": True,
                    "occlusion_ratio": "Heavy",
                    "annotation_uuid": "u1",
                },
                "geometry": {"coordinates": [[0, 0], [10, 0]]},
            },
            {"properties": {"class": "Vehicle"}, "geometry": {"coordinates": []}},
        ]
        out = parse_pedestrian_annotations(anns, sx=0.5, sy=0.5)
        assert out["ped_count_clear"] == 1
        assert out["ped_count_unclear"] == 1
        assert len(out["ped_uuid"]) == len(out["ped_unclear_list"]) == 1
        assert len(out["ped_occlusion_list"]) == len(out["ped_points_xy_resized"]) == 1
        assert out["ped_uuid"] == ["u0"]
        assert out["ped_occ_light"] == 1 and out["ped_occ_heavy"] == 1

    def test_dict_wrapped_annotations(self):
        anns = {"annotations": []}
        out = parse_pedestrian_annotations(anns, sx=1.0, sy=1.0)
        assert out["ped_count_clear"] == 0


class TestFullIndex:
    def test_index_schema_and_counts(self, indexed_parquet):
        df = pd.read_parquet(indexed_parquet)
        assert len(df) == 12
        expected_cols = {
            "frame_id", "time", "image_path", "resized_image_path",
            "orig_w", "orig_h", "new_w", "new_h", "sx", "sy",
            "scraped_weather", "time_of_day", "solar_angle_elevation",
            "country_code", "road_type", "road_condition",
            "ped_count_clear", "ped_count_unclear",
            "ped_occ_none", "ped_occ_light", "ped_occ_medium", "ped_occ_heavy",
            "ped_occ_veryheavy", "ped_occ_missing", "ped_occ_unknown",
            "ped_uuid", "ped_unclear_list", "ped_occlusion_list",
            "ped_points_xy_resized", "ped_bin_4", "ped_present",
        }
        assert expected_cols <= set(df.columns)
        # Frame 000006 has 16 clear peds → bin 3; 000002 has none → bin 0.
        by_id = df.set_index("frame_id")
        assert by_id.loc["000006", "ped_bin_4"] == 3
        assert by_id.loc["000002", "ped_bin_4"] == 0
        assert by_id.loc["000002", "ped_present"] == 0
        assert by_id.loc["000001", "ped_present"] == 1

    def test_resized_images_written(self, indexed_parquet):
        from PIL import Image

        df = pd.read_parquet(indexed_parquet)
        path = df.iloc[0]["resized_image_path"]
        with Image.open(path) as img:
            assert img.size == (1248, 704)

    def test_add_xyxy_bboxes(self, indexed_parquet):
        df = pd.read_parquet(indexed_parquet)
        out = add_xyxy_bboxes(df)
        assert "xyxy_bboxes" in out.columns
        by_id = out.set_index("frame_id")
        # box count = clear+unclear peds with valid geometry
        row = by_id.loc["000001"]
        assert len(row["xyxy_bboxes"]) == row["ped_count_clear"] + row["ped_count_unclear"]
        for box in row["xyxy_bboxes"]:
            x1, y1, x2, y2 = box
            assert 0 <= x1 < x2 <= 1247
            assert 0 <= y1 < y2 <= 703
