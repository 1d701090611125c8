#!/usr/bin/env python3
"""Print every registered path with exists/dir/file status — environment
preflight before long runs (CLI counterpart of ref: scripts/print_paths.py:46-77)."""

from _common import PROJECT_ROOT  # noqa: F401

from multimodal_moe_tpu.paths import describe_paths


def main() -> None:
    for name, info in describe_paths().items():
        status = "dir" if info["is_dir"] else "file" if info["is_file"] else "missing"
        print(f"{name:55s} {status:8s} {info['path']}")


if __name__ == "__main__":
    main()
