#!/usr/bin/env python3
"""Compatibility shim for the reference's third-party RT-DETRv2 flow.

The reference drives the official RT-DETRv2 repo out-of-process
(ref: scripts/train_rtdetr_thirdparty.py, subprocess at
src/models/vision/rtdetr_thirdparty.py:122-129) because it has no RT-DETR
implementation of its own. This framework does — so the "third-party" CLI
simply forwards to the first-party trainer with a mapping of the third-party
flags (base-config names select the variant; ``--use-amp`` is implicit:
the trunk runs bf16 on TPU).
"""

from __future__ import annotations

import sys

from _common import PROJECT_ROOT  # noqa: F401


def main() -> None:
    argv = sys.argv[1:]
    mapped: "list[str]" = []
    skip_next = False
    for i, a in enumerate(argv):
        if skip_next:
            skip_next = False
            continue
        if a in ("--base-config", "-c"):
            # rtdetrv2_r50vd_*.yml → decoder depth presets
            cfg_name = argv[i + 1] if i + 1 < len(argv) else ""
            skip_next = True
            if "m_7x" in cfg_name:
                mapped += ["--decoder-layers", "4"]
            continue
        if a in ("--use-amp", "--test-only"):
            continue  # AMP: bf16 trunk is the default on TPU
        if a == "--device":
            skip_next = True
            continue
        mapped.append(a)

    print(
        "[compat] RT-DETR is first-party in this framework; forwarding to "
        "scripts/train_rtdetr.py " + " ".join(mapped)
    )
    sys.argv = [sys.argv[0]] + mapped
    import train_rtdetr

    train_rtdetr.main()


if __name__ == "__main__":
    main()
