"""Device-resident dataset: upload the whole split to HBM once, then every
epoch runs at pure step rate with zero host↔device image traffic.

Why this exists: the protocol corpus at 1248×704 is ~2.6 MB/frame as uint8
RGB — streaming it through a slow host link every epoch costs minutes per
epoch, dwarfing the jitted step time. As 4:2:0 planes the 5k-frame corpus
is ~6.5 GB, a comfortable fraction of a v5e's 16 GB HBM, so the TPU-native
design is to park the pixels in HBM next to the model and gather batches
in-graph (one dynamic-index gather + VPU YCbCr→RGB per step; XLA fuses the
conversion into the first conv's input).

The loader is interface-compatible with :class:`DetectionLoader` (yields the
same fixed-shape batch dicts), so :class:`DetectionTrainer` and
``evaluate_detector`` work unchanged. Replaces the per-epoch PIL decode +
H2D copy of the reference's DataLoader path
(ref: src/data/zodmoe_frames.py:144-169, scripts/train_vision_baseline.py:145-146).
"""

from __future__ import annotations

import sys
from typing import Dict, Iterator, Optional

import numpy as np

from ..utils import watchdog
from .pipeline import ZODMoEVisionDataset, _resolve_path


def _build_target_arrays(dataset: ZODMoEVisionDataset) -> "Dict[str, np.ndarray]":
    """Ground-truth tensors for every sample, without decoding any image.

    Mirrors ``ZODMoEVisionDataset.load`` (images are asserted to already be
    at the configured size, so no box rescale happens here)."""
    cfg = dataset.cfg
    n = len(dataset)
    gt_boxes = np.zeros((n, cfg.max_boxes, 4), np.float32)
    gt_mask = np.zeros((n, cfg.max_boxes), bool)
    labels = np.zeros(n, np.int32)
    solar = np.zeros(n, np.int32)
    for i in range(n):
        row = dataset.df.iloc[i]
        boxes = dataset._boxes_for_row(row)
        k = min(boxes.shape[0], cfg.max_boxes)
        gt_boxes[i, :k] = boxes[:k]
        gt_mask[i, :k] = True
        if cfg.label_col in dataset.df.columns:
            labels[i] = int(row[cfg.label_col])
        solar[i] = dataset._solar_to_id.get(
            str(row[cfg.solar_col]) if cfg.solar_col in dataset.df.columns else "missing",
            len(dataset._solar_to_id) - 1,
        )
    return {
        "gt_boxes": gt_boxes,
        "gt_labels": np.zeros((n, cfg.max_boxes), np.int32),
        "gt_mask": gt_mask,
        "label": labels,
        "solar_bin": solar,
    }


class ResidentDetectionLoader:
    """Batch loader over a device-resident copy of the dataset.

    Build cost is paid once (host decode of every JPEG + one upload);
    iteration yields device-side batch dicts produced by a jitted
    gather(+YCbCr→RGB) — no host pixels ever move again.

    ``store="yuv420"`` keeps 4:2:0 planes in HBM (half the bytes of RGB;
    requires the native decoder and images already at the target size) and
    converts to RGB in-graph; anything else stores uint8 RGB directly.
    """

    def __init__(
        self,
        dataset: ZODMoEVisionDataset,
        batch_size: int,
        *,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = True,
        num_workers: int = 8,
        process_index: int = 0,
        process_count: int = 1,
        store: str = "yuv420",
        device=None,
        sharding=None,
    ):
        import jax

        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self._epoch = 0
        self._device = device or jax.local_devices()[0]
        # Yielded batches are placed onto this sharding (e.g. the mesh's
        # batch sharding) so they share a device set with replicated /
        # expert-sharded model state on multi-device meshes.
        self._sharding = sharding

        cfg = dataset.cfg
        # Each host keeps only its shard resident (disjoint strided slice,
        # same convention as DetectionLoader for multi-host training).
        self._local = np.arange(len(dataset))[process_index::process_count]
        n = len(self._local)

        import time

        t0 = time.perf_counter()
        targets = _build_target_arrays(dataset)
        targets = {k: v[self._local] for k, v in targets.items()}
        print(
            f"[resident] targets for {n} samples in {time.perf_counter() - t0:.1f}s",
            file=sys.stderr, flush=True,
        )

        paths = [
            str(_resolve_path(dataset.df.iloc[int(i)][cfg.image_path_col], cfg.image_root))
            for i in self._local
        ]
        # Targets above are NOT rescaled, so the pixels must already be at
        # the configured size (the canonical corpus is pre-resized by the
        # indexer; anything else should stream via DetectionLoader).
        from PIL import Image

        with Image.open(paths[0]) as probe_img:
            if probe_img.size != (cfg.img_w, cfg.img_h):
                raise ValueError(
                    f"resident loader requires pre-resized images "
                    f"({cfg.img_w}x{cfg.img_h}); got {probe_img.size} — "
                    "use DetectionLoader for on-the-fly resize"
                )
        t0 = time.perf_counter()
        self.store = self._load_pixels(paths, cfg, store, num_workers, n)
        print(
            f"[resident] decoded {n} jpegs ({self.store}) in "
            f"{time.perf_counter() - t0:.1f}s",
            file=sys.stderr, flush=True,
        )

        # Upload in bounded chunks with a per-chunk completion barrier: one
        # multi-GB device_put is a single giant RPC on tunneled runtimes
        # (stall-prone and invisible); ~256 MB chunks give progress, keep the
        # remote's buffers bounded, and cost one on-device concat.
        chunk_bytes = 256 << 20

        def put(a, name=""):
            import numpy as _np

            t = time.perf_counter()

            def _barrier(d):
                # block_until_ready does not synchronize on tunneled
                # runtimes; a 1-element fetch does.
                _np.asarray(d[(0,) * d.ndim])
                watchdog.beat("resident upload")

            if a.nbytes <= chunk_bytes:
                d = jax.device_put(a, self._device)
                _barrier(d)
            else:
                rows = max(1, int(len(a) * chunk_bytes / a.nbytes))
                pieces = []
                for i in range(0, len(a), rows):
                    p = jax.device_put(a[i : i + rows], self._device)
                    _barrier(p)
                    pieces.append(p)
                    print(
                        f"[resident] {name}: {min(i + rows, len(a))}/{len(a)} "
                        f"rows up ({time.perf_counter() - t:.0f}s)",
                        file=sys.stderr, flush=True,
                    )
                import jax.numpy as jnp

                d = jax.jit(lambda *ps: jnp.concatenate(ps, axis=0))(*pieces)
                _barrier(d)
                del pieces
            if a.nbytes > 64 << 20:
                mb = a.nbytes / 1e6
                dt = time.perf_counter() - t
                print(
                    f"[resident] uploaded {name} {mb:.0f} MB in {dt:.1f}s "
                    f"({mb / dt:.0f} MB/s)",
                    file=sys.stderr, flush=True,
                )
            return d

        self._data = {k: put(v, k) for k, v in targets.items()}
        if self.store == "yuv420":
            self._data["y"] = put(self._y, "y")
            self._data["cb"] = put(self._cb, "cb")
            self._data["cr"] = put(self._cr, "cr")
            del self._y, self._cb, self._cr
        else:
            self._data["image"] = put(self._rgb, "rgb")
            del self._rgb
        self._gather = self._build_gather()

    # -- pixel ingest --------------------------------------------------------
    def _load_pixels(self, paths, cfg, store, num_workers, n) -> str:
        if store == "yuv420":
            try:
                from .native_decode import decode_jpeg_bytes_yuv420, decode_jpeg_files_yuv420, native_available

                if native_available():
                    probe = decode_jpeg_bytes_yuv420(
                        open(paths[0], "rb").read(), cfg.img_h, cfg.img_w
                    )
                    if probe is not None:
                        self._y, self._cb, self._cr = decode_jpeg_files_yuv420(
                            paths, cfg.img_h, cfg.img_w, n_threads=num_workers
                        )
                        return "yuv420"
            except Exception as e:  # fall through to RGB
                print(f"[resident] yuv420 path unavailable ({e}); storing RGB", file=sys.stderr)
        # RGB fallback: reuse the dataset's own decode (PIL or native RGB).
        rgb = np.empty((n, cfg.img_h, cfg.img_w, 3), np.uint8)
        for j, i in enumerate(self._local):
            rgb[j] = self.dataset.load(int(i))["image"]
        self._rgb = rgb
        return "rgb"

    # -- batch production ----------------------------------------------------
    def _build_gather(self):
        import jax

        from ..ops.preprocess import yuv420_to_rgb_u8

        yuv = self.store == "yuv420"

        @jax.jit
        def gather(data, idx):
            out = {
                "gt_boxes": data["gt_boxes"][idx],
                "gt_labels": data["gt_labels"][idx],
                "gt_mask": data["gt_mask"][idx],
                "label": data["label"][idx],
                "solar_bin": data["solar_bin"][idx],
            }
            if yuv:
                out["image"] = yuv420_to_rgb_u8(
                    data["y"][idx], data["cb"][idx], data["cr"][idx]
                )
            else:
                out["image"] = data["image"][idx]
            return out

        return gather

    def __len__(self) -> int:
        n = len(self._local)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict]:
        n = len(self._local)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        self._epoch += 1
        bs = self.batch_size
        n_full = n // bs

        def _emit(idx, valid):
            import jax

            batch = dict(self._gather(self._data, idx))
            if self._sharding is not None:
                batch = {k: jax.device_put(v, self._sharding) for k, v in batch.items()}
            batch["batch_valid"] = valid
            return batch

        for b in range(n_full):
            yield _emit(order[b * bs : (b + 1) * bs], np.ones(bs, bool))
        rem = n - n_full * bs
        if rem and not self.drop_last:
            idx = np.concatenate([order[n_full * bs :], np.zeros(bs - rem, np.int64)])
            yield _emit(
                idx, np.concatenate([np.ones(rem, bool), np.zeros(bs - rem, bool)])
            )
