"""One-shot big_env streaming sweep: stream_depth x tcl grid.

Runs each combination as a fresh subprocess on the real TPU (frame-level
timing only, see CLAUDE.md) and appends results to /tmp/big_env_sweep.log.
Usage: python -m tools.sweep_big_env
"""

from __future__ import annotations

import sys

from tools.tpu_suite import BIG_ENV_DEPTH, log, run


def main():
    log("=== big_env sweep start ===")
    ok, _ = run("probe", "import jax; print('devices', jax.devices())",
                timeout=120)
    if not ok:
        log("tunnel down; aborting")
        return 1
    combos = [
        ("2", "32"), ("4", "32"), ("8", "32"),
        ("2", "64"), ("4", "64"),
        ("2", "128"),
        ("4", "16"),
    ]
    for depth, tcl in combos:
        run(f"big_env depth={depth} tcl={tcl}", BIG_ENV_DEPTH, timeout=900,
            env={"PUPIL_STREAM_DEPTH": depth, "PUPIL_TCL": tcl})
    log("=== big_env sweep done ===")
    return 0


if __name__ == "__main__":
    sys.exit(main())
