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


def map_args(argv: "list[str]") -> "tuple[str, list[str]]":
    """Map third-party-style flags to the first-party CLIs.

    Returns ("train"|"eval", mapped_argv). ``--test-only`` selects the eval
    flow (the reference's eval invocation is ``tools/train.py -r ckpt
    --test-only``, ref: rtdetr_thirdparty.py:286-298) — forwarding it to the
    trainer would silently start a training run.
    """
    test_only = "--test-only" in argv
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
            if not test_only and "m_7x" in cfg_name:
                mapped += ["--decoder-layers", "4"]
            continue
        if a in ("--use-amp", "--no-use-amp", "--test-only"):
            continue  # AMP: bf16 trunk is the default on TPU
        if a == "--device":
            skip_next = True
            continue
        if test_only and a in ("-r", "--resume"):
            # checkpoint-to-evaluate → eval_detector --weights
            if i + 1 < len(argv):
                mapped += ["--weights", argv[i + 1]]
                skip_next = True
            continue
        mapped.append(a)
    return ("eval" if test_only else "train"), mapped


def main() -> None:
    mode, mapped = map_args(sys.argv[1:])
    sys.argv = [sys.argv[0]] + mapped
    if mode == "eval":
        print(
            "[compat] --test-only: forwarding to eval_rtdetr_thirdparty "
            + " ".join(mapped)
        )
        import eval_rtdetr_thirdparty

        eval_rtdetr_thirdparty.main()
        return
    print(
        "[compat] RT-DETR is first-party in this framework; forwarding to "
        "scripts/train_rtdetr.py " + " ".join(mapped)
    )
    import train_rtdetr

    train_rtdetr.main()


if __name__ == "__main__":
    main()
