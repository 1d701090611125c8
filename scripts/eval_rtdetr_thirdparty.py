#!/usr/bin/env python3
"""Compatibility shim: val-only COCO eval of an RT-DETR checkpoint.

The reference evaluates RT-DETRv2 checkpoints by re-running the third-party
repo with ``--test-only`` and scraping COCO AP/AR off stdout
(ref: scripts/eval_rtdetr_thirdparty.py:37-122,
rtdetr_thirdparty.py:132-155). Here RT-DETR is first-party, so this forwards
to eval_detector --backend rtdetr and additionally writes the
``metrics_key.json`` convenience copy the reference produces (ref :110-122).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

from _common import PROJECT_ROOT  # noqa: F401

from multimodal_moe_tpu import paths


def main() -> None:
    argv = [a for a in sys.argv[1:]]
    if "--backend" not in argv:
        argv = ["--backend", "rtdetr"] + argv
    run_name = "rtdetr_eval"
    if "--run-name" in argv:
        run_name = argv[argv.index("--run-name") + 1]
    else:
        argv += ["--run-name", run_name]

    sys.argv = [sys.argv[0]] + argv
    import eval_detector

    eval_detector.main()

    out_dir = Path(paths.EVAL_DIR) / "rtdetr" / run_name
    metrics = json.loads((out_dir / "metrics.json").read_text())
    key = {
        "AP50_95": metrics.get("map50_95"),
        "AP50": metrics.get("map50"),
        "AP75": metrics.get("map75"),
        "AP_small": metrics.get("ap_small"),
        "AP_medium": metrics.get("ap_medium"),
        "AP_large": metrics.get("ap_large"),
        "AR_1": metrics.get("ar_1"),
        "AR_10": metrics.get("ar_10"),
        "AR_100": metrics.get("ar_100"),
    }
    (out_dir / "metrics_key.json").write_text(json.dumps(key, indent=2))
    print(f"Saved metrics key -> {out_dir / 'metrics_key.json'}")


if __name__ == "__main__":
    main()
