"""Test configuration.

Tests run on a virtual 8-device CPU mesh so every sharding/collective path is
exercised without TPU hardware (SURVEY.md §4: JAX makes multi-device testing
cheap via ``xla_force_host_platform_device_count``). The env vars must be set
before JAX initializes its backends, hence top-of-module.
"""

import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

# The environment's site startup forces jax_platforms to "axon,cpu" (the
# remote-TPU tunnel), overriding JAX_PLATFORMS. Without this override every
# un-jitted op round-trips the tunnel (~5ms each) and the suite crawls.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import json  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402


# ---------------------------------------------------------------------------
# Synthetic ZOD fixture: a miniature raw dataset tree with the exact layout
# the indexer walks (metadata.json, annotations/object_detection.json,
# camera_front_dnat/*.jpg per frame dir).
# ---------------------------------------------------------------------------

def _make_frame(
    root: Path,
    frame_id: str,
    *,
    rng: np.random.Generator,
    n_clear: int,
    n_unclear: int,
    time_of_day: str,
    solar_elevation,
    img_wh=(3848, 2168),
):
    from PIL import Image

    frame_dir = root / frame_id
    cam_dir = frame_dir / "camera_front_dnat"
    ann_dir = frame_dir / "annotations"
    cam_dir.mkdir(parents=True)
    ann_dir.mkdir(parents=True)

    w, h = img_wh
    # Tiny random image upscaled at save time would be slow at 3848x2168; write
    # a small image and record true dims in metadata — the indexer resizes to
    # the configured target regardless of source size.
    arr = rng.integers(0, 255, size=(64, 96, 3), dtype=np.uint8)
    Image.fromarray(arr).save(cam_dir / f"{frame_id}_camera_front_dnat.jpg", quality=90)

    metadata = {
        "frame_id": frame_id,
        "time": "2022-06-01T12:00:00",
        "scraped_weather": "clear",
        "time_of_day": time_of_day,
        "solar_angle_elevation": solar_elevation,
        "country_code": "SE",
        "road_type": "city",
        "road_condition": "dry",
    }
    (frame_dir / "metadata.json").write_text(json.dumps(metadata))

    objects = []
    occlusions = ["None", "Light", "Medium", "Heavy", "VeryHeavy", None]
    for k in range(n_clear + n_unclear):
        x = float(rng.uniform(0, w - 200))
        y = float(rng.uniform(0, h - 400))
        bw = float(rng.uniform(30, 150))
        bh = float(rng.uniform(80, 350))
        coords = [[x, y], [x + bw, y], [x + bw, y + bh], [x, y + bh]]
        objects.append(
            {
                "properties": {
                    "class": "Pedestrian",
                    "unclear": k >= n_clear,
                    "occlusion_ratio": occlusions[k % len(occlusions)],
                    "annotation_uuid": f"{frame_id}-ped-{k}",
                },
                "geometry": {"coordinates": coords},
            }
        )
    # A non-pedestrian object the parser must ignore.
    objects.append(
        {
            "properties": {"class": "Vehicle", "annotation_uuid": f"{frame_id}-veh-0"},
            "geometry": {"coordinates": [[0, 0], [10, 0], [10, 10], [0, 10]]},
        }
    )
    (ann_dir / "object_detection.json").write_text(json.dumps(objects))


@pytest.fixture(scope="session")
def synthetic_zod_root(tmp_path_factory) -> Path:
    """A 12-frame synthetic ZOD tree covering day/night, clear/unclear mixes,
    zero-pedestrian frames, and missing solar elevation."""
    root = tmp_path_factory.mktemp("zod_raw")
    rng = np.random.default_rng(0)
    specs = [
        ("000001", 3, 1, "day", 30.0),
        ("000002", 0, 0, "day", 50.0),
        ("000003", 7, 2, "night", -10.0),
        ("000004", 1, 0, "twilight", -3.0),
        ("000005", 2, 3, "day", 10.0),
        ("000006", 16, 0, "day", 47.0),
        ("000007", 0, 2, "night", -20.0),
        ("000008", 5, 1, "day", None),
        ("000009", 4, 0, "day", 20.0),
        ("000010", 2, 2, "night", -8.0),
        ("000011", 1, 1, "day", 16.0),
        ("000012", 6, 0, "day", 44.0),
    ]
    for frame_id, n_clear, n_unclear, tod, solar in specs:
        _make_frame(
            root,
            frame_id,
            rng=rng,
            n_clear=n_clear,
            n_unclear=n_unclear,
            time_of_day=tod,
            solar_elevation=solar,
        )
    return root


@pytest.fixture(scope="session")
def indexed_parquet(synthetic_zod_root, tmp_path_factory):
    """Canonical parquet built from the synthetic tree, with resized images."""
    from multimodal_moe_tpu.data.indexer import IndexConfig, write_index

    out_dir = tmp_path_factory.mktemp("zod_index")
    resized_dir = tmp_path_factory.mktemp("zod_resized")
    cfg = IndexConfig(
        zod_root=synthetic_zod_root,
        out_parquet=out_dir / "ZODmoe_frames.parquet",
        resized_img_root=resized_dir,
        new_w=1248,
        new_h=704,
        workers=4,
    )
    return write_index(cfg, progress=False)


@pytest.fixture(scope="session")
def boxed_parquet(indexed_parquet, tmp_path_factory):
    """Derived parquet with xyxy_bboxes + solar_context_bin columns."""
    import pandas as pd

    from multimodal_moe_tpu.data.indexer import add_xyxy_bboxes
    from multimodal_moe_tpu.data.solar import add_solar_context_bins

    df = pd.read_parquet(indexed_parquet)
    df = add_xyxy_bboxes(df)
    df = add_solar_context_bins(df)
    out = tmp_path_factory.mktemp("zod_boxed") / "ZODmoe_frames_with_xyxy_bboxes_and_solar_bins.parquet"
    df.to_parquet(out, index=False)
    return out


@pytest.fixture(scope="session")
def split_csvs(indexed_parquet, tmp_path_factory):
    """Train/val/test split CSVs over the synthetic frames (no stratification —
    12 frames is below sklearn's stratify minimum; plain deterministic split)."""
    import pandas as pd

    df = pd.read_parquet(indexed_parquet)
    ids = sorted(df["frame_id"].astype(str).tolist())
    splits = {"train": ids[:8], "val": ids[8:10], "test": ids[10:]}
    out_dir = tmp_path_factory.mktemp("zod_splits")
    paths = {}
    for name, split_ids in splits.items():
        p = out_dir / f"{name}_ids.csv"
        pd.DataFrame({"frame_id": split_ids}).to_csv(p, index=False)
        paths[name] = p
    return paths
