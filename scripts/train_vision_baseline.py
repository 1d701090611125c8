#!/usr/bin/env python3
"""Classification sanity baseline: ResNet-50 from scratch on ``ped_present``.

CLI counterpart of ref: scripts/train_vision_baseline.py:31-191 — same
recipe (2-class head, AdamW 1e-4, CE loss, random subset 2048, per-epoch
accuracy, matplotlib curve to outputs/plots/) on the SPMD mesh instead of a
single CUDA device.
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

from _common import PROJECT_ROOT  # noqa: F401

from multimodal_moe_tpu import paths


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description="Train ped_present ResNet baseline.")
    p.add_argument(
        "--parquet",
        type=str,
        default=str(paths.ZODMOE_FRAMES_WITH_BOXES_AND_SOLAR_BINS_PARQUET),
    )
    p.add_argument("--split-csv", type=str, default=str(paths.TRAIN_SPLIT_CSV))
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--subset", type=int, default=2048)
    p.add_argument("--img-size", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--plot-path", type=str,
                   default=str(paths.PLOTS_DIR / "train_acc_ped_present.png"))
    return p.parse_args()


def main() -> None:
    args = parse_args()

    # Deadman for the tunneled TPU runtime (wedged RPCs hang forever;
    # exit 3 lets orchestration relaunch with --resume). MMOE_STALL_TIMEOUT_S
    # overrides; 0 disables. Grace covers restore + cold XLA compile.
    from multimodal_moe_tpu.utils import watchdog

    watchdog.enable(900.0, label="train_vision_baseline", initial_grace_s=5400.0)

    # Multi-host entry: no-op single-host (SURVEY.md §5.8 TPU-native design).
    from multimodal_moe_tpu.parallel.distributed import (
        loader_shard,
        maybe_initialize_distributed,
    )

    maybe_initialize_distributed()
    proc_idx, proc_count = loader_shard()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from multimodal_moe_tpu.data.pipeline import (
        DetectionLoader,
        ZODMoEDataConfig,
        ZODMoEVisionDataset,
    )
    from multimodal_moe_tpu.models.resnet import resnet50
    from multimodal_moe_tpu.parallel.mesh import batch_sharding, create_mesh, replicated

    ds = ZODMoEVisionDataset(
        ZODMoEDataConfig(
            frames_parquet=args.parquet,
            split_csv=args.split_csv,
            img_h=args.img_size,
            img_w=args.img_size,
            max_boxes=1,
        )
    )
    # Random subset like the reference (ref :95-99).
    rng = np.random.default_rng(args.seed)
    subset = min(args.subset, len(ds))
    ds.df = ds.df.iloc[rng.permutation(len(ds))[:subset]].reset_index(drop=True)

    loader = DetectionLoader(
        ds, batch_size=args.batch, shuffle=True, seed=args.seed,
        process_index=proc_idx, process_count=proc_count,
        num_workers=args.workers, drop_last=True,
    )

    mesh = create_mesh()
    model = resnet50(num_classes=2)
    params_key = jax.random.PRNGKey(args.seed)
    dummy = jnp.zeros((1, args.img_size, args.img_size, 3))
    variables = jax.jit(lambda r: model.init(r, dummy, train=True))(params_key)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adamw(args.lr)
    opt_state = tx.init(params)

    state = jax.device_put((params, batch_stats, opt_state), replicated(mesh))

    @jax.jit
    def train_step(state, images_u8, labels):
        params, batch_stats, opt_state = state
        images = images_u8.astype(jnp.float32) / 255.0
        mean = jnp.asarray([0.485, 0.456, 0.406])
        std = jnp.asarray([0.229, 0.224, 0.225])
        images = (images - mean) / std

        def loss_fn(p):
            logits, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats},
                images, train=True, mutable=["batch_stats"],
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
            return loss, (logits, mutated["batch_stats"])

        (loss, (logits, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        acc = (jnp.argmax(logits, -1) == labels).mean()
        return (new_params, new_stats, new_opt), loss, acc

    sharding = batch_sharding(mesh)
    accs = []
    t0 = time.perf_counter()
    for epoch in range(args.epochs):
        epoch_acc, epoch_loss, n = 0.0, 0.0, 0
        for batch in loader:
            images = jax.device_put(batch["image"], sharding)
            labels = jax.device_put(batch["label"], sharding)
            state, loss, acc = train_step(state, images, labels)
            epoch_acc += float(acc)
            epoch_loss += float(loss)
            n += 1
        accs.append(epoch_acc / max(n, 1))
        print(f"epoch {epoch + 1}/{args.epochs} loss={epoch_loss / max(n, 1):.4f} "
              f"acc={accs[-1]:.4f}")
    wall = time.perf_counter() - t0
    print(f"train wall time: {wall:.1f}s")

    # Accuracy curve (ref :179-191).
    plot_path = Path(args.plot_path)
    plot_path.parent.mkdir(parents=True, exist_ok=True)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(6, 4))
        plt.plot(range(1, len(accs) + 1), accs, marker="o")
        plt.xlabel("epoch")
        plt.ylabel("train accuracy")
        plt.title("ped_present baseline (ResNet-50, from scratch)")
        plt.grid(True, alpha=0.3)
        plt.savefig(plot_path, dpi=120, bbox_inches="tight")
        print(f"Saved plot -> {plot_path}")
    except ImportError:
        print("matplotlib unavailable; skipped plot")


if __name__ == "__main__":
    main()
